"""Microbenchmark: Pallas window RoIAlign vs XLA pyramid gather.

Flagship shapes: batch 8, FPN C=256 bf16 at strides (4,8,16,32) for a
1024x1024 tile, R = 8 * 2000 rois. Run on TPU:

    python tools/analysis_tools/roi_align_microbench.py [--r 16384]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--r", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=1024)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="compare pallas vs xla values on TPU")
    ap.add_argument("--fallback", type=float, default=0.0)
    ap.add_argument("--rb", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rs_detection_tpu.ops.pallas_roi_align import \
        roi_align_rotated_pyramid_pallas
    from rs_detection_tpu.ops.roi_align import roi_align_rotated_pyramid

    strides = (4, 8, 16, 32)
    dt = jnp.float32 if args.fp32 else jnp.bfloat16
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(args.batch, args.img // s,
                                   args.img // s, args.c), dt)
             for s in strides]
    # DOTA-ish roi mix: mostly small near-square, some elongated
    r = args.r
    b = rng.randint(0, args.batch, r).astype(np.float32)
    cx = rng.uniform(0, args.img, r)
    cy = rng.uniform(0, args.img, r)
    w = np.exp(rng.uniform(np.log(8), np.log(500), r))
    aspect = np.exp(rng.uniform(np.log(0.2), np.log(5.0), r))
    h = w / aspect
    t = rng.uniform(-np.pi / 2, np.pi / 2, r)
    rois = jnp.asarray(np.stack([b, cx, cy, w, h, t], 1), jnp.float32)

    def timed(name, fn):
        # host fetch of a scalar reduction is the completion barrier
        # (block_until_ready is unreliable through the axon tunnel)
        red = jax.jit(lambda f, rr: fn(f, rr).astype(jnp.float32).sum())
        out = fn(feats, rois)
        float(red(feats, rois))
        n = args.iters
        t0 = time.perf_counter()
        y = None
        for _ in range(n):
            y = red(feats, rois)
        float(y)   # device stream is serial: this waits for all n
        dt_ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:30s} {dt_ms:8.2f} ms/iter", flush=True)
        return out

    xla = jax.jit(lambda f, rr: roi_align_rotated_pyramid(
        f, rr, 7, strides=strides))
    pallas = jax.jit(lambda f, rr: roi_align_rotated_pyramid_pallas(
        f, rr, 7, strides=strides, fallback_frac=args.fallback,
        rois_per_program=args.rb))

    from rs_detection_tpu.ops.pallas_roi_align import _prepare
    prep = jax.jit(lambda f, rr: _prepare(
        f, rr.astype(jnp.float32), strides, 56.0, 7, 2)[0])

    print(f"R={r} batch={args.batch} C={args.c} dtype={dt.__name__} "
          f"fallback={args.fallback} rb={args.rb}", flush=True)
    timed("prepare (sort+meta+A)", prep)
    o_x = timed("xla pyramid gather", xla)
    o_p = timed("pallas window+mxu", pallas)

    if args.check:
        from rs_detection_tpu.ops.pallas_roi_align import _EXTENT
        # report tier-A fraction and tier-A max error
        scale = np.sqrt(np.maximum(w * h, 1e-6))
        lvl = np.clip(np.floor(np.log2(scale / 56.0 + 1e-6)), 0, 3)
        inv_s = 1.0 / np.asarray(strides)[lvl.astype(int)]
        rw = np.maximum(w * inv_s, 1)
        rh = np.maximum(h * inv_s, 1)
        ex = rw * np.abs(np.cos(t)) + rh * np.abs(np.sin(t))
        ey = rw * np.abs(np.sin(t)) + rh * np.abs(np.cos(t))
        tier_a = (ex <= _EXTENT) & (ey <= _EXTENT)
        print(f"tier A fraction: {tier_a.mean():.3f}")
        d = np.abs(np.asarray(o_x, np.float32)
                   - np.asarray(o_p, np.float32))
        print(f"max |diff| tier A: {d[tier_a].max():.5f}  "
              f"mean: {d[tier_a].mean():.6f}")


if __name__ == "__main__":
    main()
