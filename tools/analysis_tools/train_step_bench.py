"""Training-step throughput for the flagship (Oriented R-CNN VAN-b3).

The reference publishes no training throughput (trains 9 epochs on 8
GPUs, mpirun); this measures our DP train step on one chip.

    python tools/analysis_tools/train_step_bench.py [--batch 4]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--img", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable per-block backbone remat (A/B: is "
                         "the recompute still needed at this batch?)")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of 3 steps into "
                         "DIR (summarize with xplane_summary.py)")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _dummy_targets, _flagship
    from rs_detection_tpu.optims.optimizer import AdamW
    from rs_detection_tpu.parallel.train_step import (create_train_state,
                                                      make_train_step)

    model = _flagship(tiny=False)
    if not args.fp32:
        model = dataclasses.replace(model, compute_dtype=jnp.bfloat16)
    if args.no_remat:
        model = dataclasses.replace(
            model, backbone=dataclasses.replace(model.backbone,
                                                remat=False))
    b, img = args.batch, args.img
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, img, img, 3).astype(np.float32))
    targets = _dummy_targets(b, img)
    variables = jax.jit(lambda i, t: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampler": jax.random.PRNGKey(1)}, i, t))(images, targets)
    # competition recipe: AdamW 1e-4 (README_competition.md:79)
    tx = AdamW(lr=1e-4, weight_decay=0.05,
               grad_clip=dict(max_norm=35))
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, mesh=None)

    key = jax.random.PRNGKey(2)
    state, metrics = step(state, images, targets, key)
    float(metrics["total_loss"])          # compile + barrier
    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                state, metrics = step(state, images, targets, key)
            float(metrics["total_loss"])
        print(f"trace -> {args.trace}", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, images, targets, key)
    float(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train step: {dt * 1e3:.1f} ms/iter  "
          f"{b / dt:.2f} tiles/s/chip (batch {b}, "
          f"{'f32' if args.fp32 else 'bf16'})", flush=True)


if __name__ == "__main__":
    main()
