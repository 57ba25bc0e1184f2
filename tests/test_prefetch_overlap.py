"""Structural proof that the loader's prefetch pipeline hides decode
latency behind consumer (device-step) time.

The round-4 claim "on any >=8-core host decode overlaps device compute"
(docs/perf_notes.md) was asserted from architecture, not demonstrated.
This test produces the evidence this 1-vCPU environment *can* produce:
a synthetic dataset whose per-item decode is a fixed ``sleep`` (sleeps
release the GIL and cost no CPU, so the 1-core host behaves like a
many-core one for this purpose) is consumed through
``CustomDataset.prefetch``-style pipelining by a consumer that sleeps
a fixed "device step" per batch. If the pipeline overlaps, total wall
time approaches ``n_batches * step`` (+ one pipeline-fill decode); if
it serializes, it is ``n_batches * (step + decode)``. The assertion
separates those regimes by a wide margin, so only genuine overlap
passes.

Reference analogue: the multi-worker torch-style loader the reference
relies on for the same property (``python/jdet/data/__init__.py``
dataloader workers); here the prefetch thread + worker pool is the
TPU-host equivalent (data/custom.py:101-169).
"""

import time

import numpy as np

from rs_detection_tpu.data.custom import CustomDataset


class _SleepDecodeDataset(CustomDataset):
    """CustomDataset with __getitem__ replaced by a fixed-latency
    fake decode; bypasses __init__ disk IO entirely."""

    # decode latency per ITEM (seconds); batch of 2 with 2 workers
    # decodes in ~DECODE wall seconds
    DECODE = 0.05

    def __init__(self, n_items=12, batch_size=2, num_workers=2):
        # deliberately not calling super().__init__ — no disk fixture
        self.total_len = n_items
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.shuffle = False
        self.drop_last = False
        self.max_gt = 1

    def __getitem__(self, idx):
        time.sleep(self.DECODE)
        img = np.zeros((8, 8, 3), np.float32)
        target = dict(
            rboxes=np.zeros((1, 5), np.float32),
            hboxes=np.zeros((1, 4), np.float32),
            polys=np.zeros((1, 8), np.float32),
            labels=np.zeros((1,), np.int32),
            rboxes_ignore=np.zeros((0, 5), np.float32),
            hboxes_ignore=np.zeros((0, 4), np.float32),
            polys_ignore=np.zeros((0, 8), np.float32),
            classes=None, ori_img_size=(8, 8), img_size=(8, 8),
            scale_factor=1.0, filename=f"fake_{idx}.png",
            img_file=f"fake_{idx}.png")
        return img, target


def _consume(ds, step_s: float) -> float:
    """Walk the prefetch iterator with a fixed per-batch consumer
    sleep; return total wall seconds."""
    t0 = time.perf_counter()
    n = 0
    for _images, _targets, _metas in ds.prefetch():
        time.sleep(step_s)   # the "device step"
        n += 1
    ds.close()
    assert n == ds.total_len // ds.batch_size
    return time.perf_counter() - t0


def test_prefetch_hides_decode_behind_consumer():
    """decode latency <= device-step time x workers => wall time is
    governed by the consumer alone (plus one pipeline-fill decode),
    NOT by decode + step serialized."""
    ds = _SleepDecodeDataset(n_items=12, batch_size=2, num_workers=2)
    step = 0.06          # device step > per-batch decode (0.05 wall)
    n_batches = 6
    wall = _consume(ds, step)

    serialized = n_batches * (step + ds.DECODE)      # 0.66 s
    overlapped = n_batches * step + ds.DECODE        # 0.41 s
    # pass bar: well under the serialized regime, with slack for
    # thread scheduling jitter
    assert wall < overlapped + 0.12, (wall, overlapped, serialized)


def test_prefetch_degrades_gracefully_when_decode_dominates():
    """Sanity inversion: when decode is far slower than the consumer,
    wall time is governed by decode (the pipeline can't create time)
    — proves the passing case above is measuring overlap, not a
    too-lenient bound."""
    ds = _SleepDecodeDataset(n_items=8, batch_size=2, num_workers=1)
    # one worker: batch decode = 2 x 0.05 = 0.1 s wall, step 0.01
    wall = _consume(ds, 0.01)
    decode_bound = 4 * 2 * ds.DECODE                 # 0.4 s
    assert wall >= decode_bound * 0.9, wall
