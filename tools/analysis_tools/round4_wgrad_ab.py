"""Round-4 A/B: depthwise weight-grad formulations, ISOLATED.

The e2e train step measured every custom-vjp dw backward a loser
(XLA native 533.5 ms/iter vs jnp taps 693 / Pallas MXU-reduce 666 /
Pallas VPU-sum 689.6). This isolates the wgrad op itself at VAN train
shapes to attribute the loss: kernel-level (the wgrad formulations are
slow) vs graph-level (the custom_vjp boundary breaks XLA's
remat/fusion scheduling around each dw site).

    python tools/analysis_tools/round4_wgrad_ab.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# (H, C, K, dilation) — the VAN dw sites at batch 8 / 1024^2 tiles
SHAPES = [
    (256, 512, 3, 1),    # stage-1 MLP hidden dw3
    (64, 1280, 3, 1),    # stage-3 MLP hidden dw3
    (256, 64, 5, 1),     # stage-1 attn dw5
    (256, 64, 7, 3),     # stage-1 attn dw7d3
    (64, 320, 5, 1),     # stage-3 attn dw5
    (64, 320, 7, 3),     # stage-3 attn dw7d3
]


def timed(fn, *args, iters=10):
    y = fn(*args)
    jnp.sum(y).block_until_ready() if hasattr(y, "block_until_ready") \
        else None
    float(jnp.sum(y))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    float(jnp.sum(y))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from rs_detection_tpu.ops.dw_conv import _fwd_conv
    from rs_detection_tpu.ops.pallas_dw_wgrad import dw_wgrad_pallas

    tot = dict(xla=0.0, pallas=0.0, taps=0.0)
    for h, c, k, d in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (8, h, h, c), jnp.float32) \
            .astype(jnp.bfloat16)
        g = jax.random.normal(jax.random.PRNGKey(1), (8, h, h, c),
                              jnp.float32).astype(jnp.bfloat16)
        w = jnp.zeros((k, k, 1, c), jnp.bfloat16)

        # XLA's own weight-grad (the default path's bwd wrt w only)
        xla_wg = jax.jit(lambda x_, g_: jax.vjp(
            lambda w_: _fwd_conv(x_, w_, d), w)[1](g_)[0])
        t_xla = timed(xla_wg, x, g)

        pall = jax.jit(lambda x_, g_: dw_wgrad_pallas(x_, g_, k, d))
        t_pal = timed(pall, x, g)

        p = d * (k - 1) // 2

        def taps(x_, g_):
            xp = jnp.pad(x_, ((0, 0), (p, p), (p, p), (0, 0)))
            outs = []
            for ky in range(k):
                for kx in range(k):
                    sl = jax.lax.slice(
                        xp, (0, ky * d, kx * d, 0),
                        (8, ky * d + h, kx * d + h, c))
                    outs.append(jnp.sum(sl * g_, axis=(0, 1, 2),
                                        dtype=jnp.float32))
            return jnp.stack(outs)

        t_tap = timed(jax.jit(taps), x, g)
        print(f"[8,{h},{h},{c}] k{k}d{d}: xla {t_xla:7.2f}  "
              f"pallas {t_pal:7.2f}  jnp_taps {t_tap:7.2f} ms",
              flush=True)
        tot["xla"] += t_xla
        tot["pallas"] += t_pal
        tot["taps"] += t_tap
    print("--- totals (one site each) ---")
    for kk, v in tot.items():
        print(f"  {kk:7s} {v:7.1f} ms")


if __name__ == "__main__":
    main()
