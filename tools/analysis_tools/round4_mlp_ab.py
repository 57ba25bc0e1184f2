"""Round-4 A/B: VAN MLP kernel tap dtype (f32 vs bf16 accumulate).

The fused MLP kernel's 9-tap depthwise ran its multiplies in f32
(stricter than the XLA path, whose grouped conv accumulates in bf16).
bf16 VPU MACs retire ~2x the f32 rate, and the dw taps are the
kernel's dominant VPU work — this measures the whole-stage-stacked
MLP for: XLA composition, kernel with f32 taps, kernel with bf16 taps.

    python tools/analysis_tools/round4_mlp_ab.py [--check]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

STAGES = [  # (H, C, ratio, blocks) VAN-b3 at 1024^2, batch 8
    (256, 64, 8, 3),
    (128, 128, 8, 5),
    (64, 320, 4, 27),
    (32, 512, 4, 3),
]


def timed(fn, *args, iters=10):
    y = fn(*args)
    float(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    float(y)
    return (time.perf_counter() - t0) / iters * 1000


def make_weights(c, ch, key):
    ks = jax.random.split(key, 6)
    s = 0.05
    return (jax.random.normal(ks[0], (c, ch), jnp.float32) * s,
            jax.random.normal(ks[1], (ch,), jnp.float32) * s,
            jax.random.normal(ks[2], (9, ch), jnp.float32) * s,
            jax.random.normal(ks[3], (ch,), jnp.float32) * s,
            jax.random.normal(ks[4], (ch, c), jnp.float32) * s,
            jax.random.normal(ks[5], (c,), jnp.float32) * s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="also report bf16-tap vs XLA max abs diff")
    args = ap.parse_args()
    dt = jnp.bfloat16

    tot = {"xla": 0.0, "kern_f32": 0.0, "kern_bf16": 0.0}
    for h, c, ratio, blocks in STAGES:
        ch = c * ratio
        x = jax.random.normal(jax.random.PRNGKey(0), (8, h, h, c),
                              jnp.float32).astype(dt)
        ws = make_weights(c, ch, jax.random.PRNGKey(1))
        wdt = tuple(w.astype(dt) for w in ws)

        def stack(mlp_fn):
            def f(xx, *w):
                for _ in range(blocks):
                    xx = mlp_fn(xx, *w)
                return jnp.sum(xx.astype(jnp.float32))
            return jax.jit(f)

        from rs_detection_tpu.ops import pallas_van_mlp as M

        os.environ["RS_VAN_MLP_BF16_TAPS"] = "0"
        k32 = stack(lambda xx, *w: M.van_mlp(xx, *w))
        t32 = timed(k32, x, *wdt)

        os.environ["RS_VAN_MLP_BF16_TAPS"] = "1"
        k16 = stack(lambda xx, *w: M.van_mlp(xx, *w))
        t16 = timed(k16, x, *wdt)

        xla = stack(lambda xx, *w: M._ref_mlp(xx, *w))
        txla = timed(xla, x, *wdt)

        print(f"stage [8,{h},{h},{c}]x{blocks} hidden {ch}: "
              f"xla {txla:7.2f}  kern_f32 {t32:7.2f}  "
              f"kern_bf16 {t16:7.2f} ms", flush=True)
        tot["xla"] += txla
        tot["kern_f32"] += t32
        tot["kern_bf16"] += t16

        if args.check:
            y16 = M.van_mlp(x, *wdt)
            yx = M._ref_mlp(x, *wdt)
            d = jnp.max(jnp.abs(y16.astype(jnp.float32)
                                - yx.astype(jnp.float32)))
            ref = jnp.max(jnp.abs(yx.astype(jnp.float32)))
            print(f"  bf16-tap vs XLA: max abs diff {float(d):.4g} "
                  f"(ref max {float(ref):.3g})", flush=True)

    print("--- stage-stacked totals ---")
    for k, v in tot.items():
        print(f"  {k:10s} {v:7.1f} ms")


if __name__ == "__main__":
    main()
