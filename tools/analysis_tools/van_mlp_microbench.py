"""Microbenchmark: VAN MLP (fc1 -> dw3 -> gelu -> fc2) per stage.

Separates the 1x1 GEMMs from the 3x3 depthwise and measures the full
MLP, per VAN-b3 stage shape at batch 8, to size the win of a fused
Pallas MLP kernel (keeping the 4x-hidden tensor in VMEM would remove
~20 GB/iter of HBM traffic).

    python tools/analysis_tools/van_mlp_microbench.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def bench(fn, x, name, iters=10):
    f = jax.jit(lambda v, i: jnp.sum(fn.apply(v, i).astype(jnp.float32)))
    v = jax.jit(lambda i: fn.init(jax.random.PRNGKey(0), i))(x)
    float(f(v, x))
    t0 = time.perf_counter()
    y = None
    for _ in range(iters):
        y = f(v, x)
    float(y)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"  {name:14s} {dt:7.2f} ms", flush=True)
    return dt


class Mlp(nn.Module):
    hidden: int
    out: int
    mode: str = "full"   # full | nodw | dw_only
    blocks: int = 1      # stack all of a stage's blocks in ONE call so
    # per-dispatch overhead (~ms through the tunnel) amortizes away

    @nn.compact
    def __call__(self, x):
        for i in range(self.blocks):
            if self.mode == "dw_only":
                x = nn.Conv(x.shape[-1], (3, 3), padding=1,
                            feature_group_count=x.shape[-1],
                            dtype=x.dtype, name=f"dw{i}")(x)
                continue
            h = nn.Conv(self.hidden, (1, 1), dtype=x.dtype,
                        name=f"fc1_{i}")(x)
            if self.mode == "full":
                h = nn.Conv(self.hidden, (3, 3), padding=1,
                            feature_group_count=self.hidden,
                            dtype=x.dtype, name=f"dw{i}")(h)
            h = nn.gelu(h)
            x = x + nn.Conv(self.out, (1, 1), dtype=x.dtype,
                            name=f"fc2_{i}")(h)
        return x


def main():
    stages = [  # (H, C, ratio, blocks) VAN-b3 at 1024^2 input
        (256, 64, 8, 3),
        (128, 128, 8, 5),
        (64, 320, 4, 27),
        (32, 512, 4, 3),
    ]
    dt = jnp.bfloat16
    total = {"full": 0.0, "nodw": 0.0, "dw_hidden": 0.0}
    for h, c, ratio, blocks in stages:
        x = jnp.zeros((8, h, h, c), dt)
        xh = jnp.zeros((8, h, h, c * ratio), dt)
        print(f"stage [8,{h},{h},{c}] hidden {c * ratio} x{blocks}"
              " (whole stage per call):", flush=True)
        total["full"] += bench(Mlp(c * ratio, c, "full", blocks), x,
                               "mlp full")
        total["nodw"] += bench(Mlp(c * ratio, c, "nodw", blocks), x,
                               "mlp no-dw")
        total["dw_hidden"] += bench(Mlp(0, 0, "dw_only", blocks), xh,
                                    "dw3 hidden")
    print("--- stage-stacked totals ---")
    for k, v in total.items():
        print(f"  {k:10s} {v:7.1f} ms")


if __name__ == "__main__":
    main()
