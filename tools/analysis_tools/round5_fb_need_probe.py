"""Measure the ACTUAL tier>=1 (exact-fallback-needing) roi count the
bench's proposal stream produces, so the pay-per-use fallback bucket
policy is set from data instead of the round-4 'reference-safe
margin' guess (VERDICT-r4 weak #1).

Runs the flagship's own RPN on the bench's synthetic tiles, applies
the extractor's extend_factor inflation, and reports the
_fwd_order tier histogram per batch — the n_need that
ops/pallas_roi_align.py's lax.switch selects its capacity from.
"""

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=1024)
    ap.add_argument("--trained-sigma", type=float, default=None,
                    help="optionally perturb init weights")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _dummy_targets, _flagship
    from rs_detection_tpu.ops.pallas_roi_align import _fwd_order

    model = _flagship()
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(args.batch, args.img, args.img, 3).astype(np.float32))
    targets = _dummy_targets(args.batch, args.img)
    variables = jax.jit(lambda i, t: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampler": jax.random.PRNGKey(1)}, i, t))(images, targets)

    @jax.jit
    def proposals_fn(v, imgs):
        def run(m, imgs):
            feats = m.extract_feats(imgs, train=False)
            cls_scores, bbox_preds = m._rpn(feats)
            b = imgs.shape[0]
            img_hw = jnp.tile(
                jnp.asarray([[imgs.shape[1], imgs.shape[2]]],
                            jnp.float32), (b, 1))
            return m._rpn.get_proposals(cls_scores, bbox_preds,
                                        img_hw)
        return model.apply(v, imgs, method=run)

    props, scores, valid = proposals_fn(variables, images)
    props = np.asarray(props)
    valid = np.asarray(valid)
    print(f"proposals: {props.shape}, valid: {valid.sum()} "
          f"/ {valid.size}", flush=True)

    # mirror the extractor: flatten to rois [R, 6] with batch idx,
    # apply extend_factor (1.4, 1.2) like OrientedSingleRoIExtractor
    b, n = props.shape[:2]
    rois = np.zeros((b * n, 6), np.float32)
    rois[:, 0] = np.repeat(np.arange(b), n)
    rois[:, 1:] = props.reshape(b * n, -1)[:, :5]
    rois[:, 3] *= 1.2
    rois[:, 4] *= 1.4
    # invalid rois are zero-padded -> tier 0 (matches the bench graph)
    rois[~valid.reshape(-1)] = 0.0

    strides = (4, 8, 16, 32)
    _, lvl, tier, ext_x, ext_y, _ = _fwd_order(
        jnp.asarray(rois), strides, 56.0, len(strides))
    tier = np.asarray(tier)
    r = tier.size
    n1 = int((tier >= 1).sum())
    n2 = int((tier >= 2).sum())
    print(f"R={r}  tier>=1 (n_need): {n1} ({n1 / r:.3%})  "
          f"tier2: {n2}", flush=True)
    for cap_frac in (0.015625, 0.03125, 0.0625, 0.125):
        cap = int(round(r * cap_frac))
        print(f"  frac {cap_frac}: capacity {cap} "
              f"{'COVERS' if cap >= n1 else 'clamps'} n_need",
              flush=True)

    # extent distribution of the tier>=1 set: does a mid-size window
    # capture most of them, and how axis-skewed are they?
    ex = np.asarray(ext_x)[tier >= 1]
    ey = np.asarray(ext_y)[tier >= 1]
    emax = np.maximum(ex, ey)
    emin = np.minimum(ex, ey)
    for name, v in (("max-axis extent", emax), ("min-axis extent", emin)):
        q = np.percentile(v, [50, 75, 90, 95, 99, 100])
        print(f"  tier>=1 {name} p50/75/90/95/99/max: "
              + "/".join(f"{x:.1f}" for x in q), flush=True)
    for lim in (38.0, 46.0, 62.0):
        print(f"  tier>=1 with max-axis extent <= {lim}: "
              f"{(emax <= lim).sum()} ({(emax <= lim).mean():.1%})",
              flush=True)


if __name__ == "__main__":
    main()
