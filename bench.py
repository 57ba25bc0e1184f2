"""Benchmark: Oriented R-CNN (VAN-b3) end-to-end inference throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures 1024x1024 DOTA-tile inference (the BASELINE.json north-star
metric: >= 400 tiles/sec/chip e2e on v5e-8 for Oriented R-CNN VAN-b3).
The reference publishes no throughput numbers (SURVEY §6), so
``vs_baseline`` is reported against the 400 tiles/sec/chip target.

Timing methodology: the compute path ends in an on-device scalar
reduction whose host fetch forces completion — ``block_until_ready``
alone is not a reliable completion barrier through the axon TPU tunnel.

Usage: python bench.py [--tiny] [--batch N] [--iters N] [--fp32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="small model/images (CPU smoke mode)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    on_tpu = any(d.platform not in ("cpu",) for d in jax.devices())
    tiny = args.tiny or not on_tpu
    batch = args.batch or (8 if not tiny else 1)
    img = 256 if tiny else 1024

    sys.path.insert(0, ".")
    from __graft_entry__ import _dummy_targets, _flagship

    model = _flagship(tiny=tiny)
    if not args.fp32 and not tiny:
        model = dataclasses.replace(model, compute_dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, img, img, 3).astype(np.float32))
    targets = _dummy_targets(batch, img)
    variables = jax.jit(lambda i, t: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampler": jax.random.PRNGKey(1)}, i, t))(images, targets)

    # scalar-reducing forward: host fetch of the result is the barrier.
    # Each call carries a data dependency on the previous result (dep *
    # 0.0 — not algebraically foldable under IEEE NaN semantics), so a
    # whole run of iterations is dispatched async and fetched ONCE:
    # back-to-back device throughput, with the ~26 ms tunnel RTT
    # amortized over the run instead of serialized into every batch.
    fwd = jax.jit(lambda v, i, t, d: jnp.sum(
        model.apply(v, i + d * 0.0, t,
                    method=model.predict)["scores"]))
    dep = jnp.float32(0.0)
    for _ in range(args.warmup):
        dep = fwd(variables, images, targets, dep)
    float(dep)

    # best-of-3 runs: the tunnel-attached chip shows ~8% run-to-run
    # drift (contention), so steady-state throughput is the fastest
    # full run, not a single sample
    best_dt = None
    for _ in range(3 if not tiny else 1):
        t0 = time.perf_counter()
        dep = jnp.float32(0.0)
        for _ in range(args.iters):
            dep = fwd(variables, images, targets, dep)
        float(dep)
        dt = (time.perf_counter() - t0) / args.iters
        best_dt = dt if best_dt is None else min(best_dt, dt)

    tiles_per_sec = batch / best_dt
    target = 400.0  # BASELINE.json north star (tiles/sec/chip)
    print(json.dumps({
        "metric": "orcnn_vanb3_1024tile_infer" if not tiny
        else "orcnn_tiny_smoke_infer",
        "value": round(tiles_per_sec, 2),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(tiles_per_sec / target, 4),
    }))


if __name__ == "__main__":
    main()
