"""Run logging: text file + TensorBoard + console.

Capability parity with the reference loggers
(``python/jdet/utils/logger.py``): ``TextLogger`` (:10-20),
``TensorboardLogger`` (:22-37, gated on availability and process 0),
``RunLogger`` composite with console pretty-print (:39-68).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

from .registry import HOOKS


@HOOKS.register_module()
class TextLogger:
    def __init__(self, work_dir: str):
        os.makedirs(work_dir, exist_ok=True)
        self.path = os.path.join(work_dir, "log.txt")
        self.f = open(self.path, "a")

    def log(self, data: Dict):
        self.f.write(",".join(f"{k}:{v}" for k, v in data.items()) + "\n")
        self.f.flush()


@HOOKS.register_module()
class TensorboardLogger:
    def __init__(self, work_dir: str):
        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.writer = SummaryWriter(os.path.join(work_dir,
                                                     "tensorboard"))
        except Exception:
            pass

    def log(self, data: Dict):
        if self.writer is None:
            return
        step = int(data.get("iter", 0))
        for k, v in data.items():
            if isinstance(v, (int, float)) and k != "iter":
                self.writer.add_scalar(k, v, global_step=step)


@HOOKS.register_module()
class RunLogger:
    """Composite logger + console pretty print (reference :39-68)."""

    def __init__(self, work_dir: str, enabled=True):
        self.loggers = []
        self.enabled = enabled
        if enabled:
            self.loggers = [TextLogger(work_dir),
                            TensorboardLogger(work_dir)]

    def log(self, data: Dict):
        if not self.enabled:
            return
        for lg in self.loggers:
            lg.log(data)
        self.print_log(data)

    @staticmethod
    def print_log(data: Dict):
        parts = []
        for k, v in data.items():
            if isinstance(v, float):
                parts.append(f"{k}={v:.4f}")
            else:
                parts.append(f"{k}={v}")
        print(f"[{time.strftime('%H:%M:%S')}] " + " ".join(parts),
              flush=True)
