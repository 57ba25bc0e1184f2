"""Stage-level profile of the flagship Oriented R-CNN VAN-b3 path.

Times backbone+neck, RPN(+proposals), RoI align, and the full predict
separately with chained dispatch (one host fetch per measurement run),
so stage deltas are real device time, not tunnel RTT.

Usage: python tools/analysis_tools/profile_orcnn.py [--batch 4]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def timed(fn, args, iters=10):
    import jax.numpy as jnp
    dep = jnp.float32(0.0)
    for _ in range(2):
        dep = fn(*args, dep)
    float(dep)
    t0 = time.perf_counter()
    dep = jnp.float32(0.0)
    for _ in range(iters):
        dep = fn(*args, dep)
    float(dep)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _dummy_targets, _flagship

    model = dataclasses.replace(_flagship(tiny=False),
                                compute_dtype=jnp.bfloat16)
    b, img = args.batch, 1024
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, img, img, 3).astype(np.float32))
    targets = _dummy_targets(b, img)
    variables = jax.jit(lambda i, t: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampler": jax.random.PRNGKey(1)}, i, t))(images, targets)

    feats_fn = jax.jit(lambda v, i, d: sum(
        jnp.sum(f) for f in model.apply(
            v, i + d * 0.0, train=False,
            method=model.extract_feats)).astype(jnp.float32))
    t_feats = timed(feats_fn, (variables, images), args.iters)
    print(f"backbone+neck: {t_feats*1e3:8.1f} ms/batch")

    def rpn_part(v, i, d):
        def inner(m, im):
            feats = m.extract_feats(im, train=False)
            cls_scores, bbox_preds = m._rpn(feats)
            img_hw = jnp.tile(jnp.asarray(
                [[im.shape[1], im.shape[2]]], jnp.float32),
                (im.shape[0], 1))
            props, scores, valid = m._rpn.get_proposals(
                cls_scores, bbox_preds, img_hw)
            return (jnp.sum(props).astype(jnp.float32)
                    + jnp.sum(scores).astype(jnp.float32))
        return model.apply(v, i + d * 0.0, method=inner)

    try:
        rpn_fn = jax.jit(rpn_part)
        t_rpn = timed(rpn_fn, (variables, images), args.iters)
        print(f"+ RPN+proposals: {t_rpn*1e3:6.1f} ms/batch "
              f"(delta {1e3*(t_rpn-t_feats):.1f})")
    except Exception as e:
        t_rpn = None
        print("rpn stage skipped:", type(e).__name__, str(e)[:200])

    full = jax.jit(lambda v, i, t, d: jnp.sum(
        model.apply(v, i + d * 0.0, t,
                    method=model.predict)["scores"]))
    dep = jnp.float32(0.0)
    for _ in range(2):
        dep = full(variables, images, targets, dep)
    float(dep)
    t0 = time.perf_counter()
    dep = jnp.float32(0.0)
    for _ in range(args.iters):
        dep = full(variables, images, targets, dep)
    float(dep)
    t_full = (time.perf_counter() - t0) / args.iters
    print(f"full predict:  {t_full*1e3:8.1f} ms/batch "
          f"({args.batch/t_full:.1f} tiles/s)")
    if t_rpn is not None:
        print(f"RoI head (full - rpn): {1e3*(t_full-t_rpn):6.1f} ms")


if __name__ == "__main__":
    main()
