"""Checkpoint-parity harness: reference checkpoint -> converter ->
flagship forward -> detections diffed against recorded reference
outputs (VERDICT round-2 #5).

The reference trains with Jittor and saves pickle checkpoints
(``jt.save``: ``{meta, model: {dotted.name: ndarray}}``,
``runner.py:251-270``). This tool closes the parity loop that no
environment here can close implicitly (no egress, no Jittor):

  1. build the model from a config through the registry;
  2. load + convert the checkpoint: reference->flax NAME REMAP
     (``remap_reference_names``), OIHW->HWIO / fc-transpose layout
     conversion, and the NCHW-flatten fc permute for the RoI head's
     first shared fc;
  3. SHAPE AUDIT the converted tree against the model's init tree —
     every missing/extra/mismatched entry is printed; nothing loads
     silently;
  4. run eval-mode inference over a tile directory;
  5. ``--record`` writes the detections as a fixture;
     ``--ref-dets`` diffs current detections against such a fixture
     (per-image greedy poly-IoU matching) and fails on drift.

``--selftest`` proves the whole loop without a real reference
checkpoint: it builds the tiny flagship, exports its weights as a
reference-style pickle (torch/jittor naming + layouts), records
detections, reloads through steps 1-4 and requires an exact match.

Usage:
  python tools/parity_check.py --config <cfg.py> --ckpt ref.pkl \
      --images tiles/ --ref-dets ref_dets.pkl [--score-thr 0.05]
  python tools/parity_check.py --selftest
"""

from __future__ import annotations

import argparse
import os
import pickle
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ------------------------------------------------------------- remap

_RULES = [
    # jdet VAN: ModuleList blocks / LKA / conv-Mlp naming
    (re.compile(r"\bblock(\d+)\.(\d+)\."), r"block\1_\2."),
    (re.compile(r"\bspatial_gating_unit\."), "sgu."),
    (re.compile(r"\bmlp\.dwconv\.dwconv\."), "mlp.dwconv."),
    # jdet OrientedHead fc stack
    (re.compile(r"\bshared_fcs\.(\d+)\."), r"shared_fc\1."),
    # torch-style Sequential downsample in resnet
    (re.compile(r"\bdownsample\.0\."), "downsample_conv."),
    (re.compile(r"\bdownsample\.1\."), "downsample_bn."),
]


def remap_reference_names(state):
    """Reference (jittor/torch) dotted names -> this repo's flax tree
    names. Unknown names pass through untouched — the shape audit
    catches them loudly."""
    out = {}
    bn_prefixes = {k[:-len(".running_mean")] for k in state
                   if k.endswith(".running_mean")}
    for name, value in state.items():
        new = name
        for pat, rep in _RULES:
            new = pat.sub(rep, new)
        # every flax BatchNorm in this repo lives one level deep
        # (<name>/BatchNorm_0/...); insert that level for BN params
        for bp in bn_prefixes:
            bpn = bp
            for pat, rep in _RULES:
                bpn = pat.sub(rep, bpn)
            if new.startswith(bpn + "."):
                leaf = new[len(bpn) + 1:]
                if "." not in leaf:
                    new = f"{bpn}.BatchNorm_0.{leaf}"
                break
        out[new] = value
    return out


def _tree_shapes(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(_tree_shapes(v, path))
        else:
            flat[path] = tuple(np.shape(v))
    return flat


def audit(converted, init_tree, collection):
    """Exact name+shape match or a loud, complete diff."""
    a = _tree_shapes(converted)
    b = _tree_shapes(init_tree)
    problems = []
    for k in sorted(set(a) | set(b)):
        if k not in b:
            problems.append(f"  EXTRA    {collection}/{k} {a[k]}")
        elif k not in a:
            problems.append(f"  MISSING  {collection}/{k} {b[k]}")
        elif a[k] != b[k]:
            problems.append(
                f"  SHAPE    {collection}/{k} ckpt{a[k]} != model{b[k]}")
    return problems


def load_and_audit(model, ckpt_path, example, fc_spatial=None):
    """Checkpoint -> (variables) with remap + layout + audit."""
    import jax

    from rs_detection_tpu.utils.checkpoint_convert import \
        torch_state_to_flax

    with open(ckpt_path, "rb") as f:
        data = pickle.load(f)
    state = data
    if isinstance(data, dict):
        for key in ("model", "state_dict"):
            if key in data and isinstance(data[key], dict):
                state = data[key]
                break
    if any(isinstance(v, dict) for v in state.values()):
        raise SystemExit(
            "checkpoint is a nested tree, expected a flat dotted-name "
            "state dict (jt.save / torch state_dict format)")
    state = remap_reference_names(state)
    params, batch_stats = torch_state_to_flax(state,
                                              fc_spatial=fc_spatial)

    init = jax.jit(lambda i, t: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampler": jax.random.PRNGKey(1)}, i, t))(*example)
    problems = audit(params, init["params"], "params")
    if "batch_stats" in init:
        problems += audit(batch_stats, init["batch_stats"],
                          "batch_stats")
    if problems:
        print("checkpoint audit FAILED "
              f"({len(problems)} mismatches):")
        print("\n".join(problems[:200]))
        raise SystemExit(2)
    variables = dict(init)
    variables["params"] = params
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


# -------------------------------------------------------- detections

def run_inference(model, variables, image_arrays, score_thr=0.05):
    """Eval-mode predict per image -> list of (polys, scores, labels)."""
    import jax
    import jax.numpy as jnp

    mean = jnp.asarray([123.675, 116.28, 103.53], jnp.float32)
    std = jnp.asarray([58.395, 57.12, 57.375], jnp.float32)

    @jax.jit
    def step(v, img):
        x = (img.astype(jnp.float32) - mean) / std
        return model.apply(v, x[None], None, method=model.predict)

    dets = []
    for arr in image_arrays:
        out = step(variables, jnp.asarray(arr))
        polys = np.asarray(out["polys"][0], np.float32)
        scores = np.asarray(out["scores"][0], np.float32)
        valid = np.asarray(out.get("valid",
                                   np.ones(polys.shape[0], bool)))[0] \
            if "valid" in out else np.ones(polys.shape[0], bool)
        labels = scores.argmax(-1)
        conf = scores.max(-1)
        keep = (conf >= score_thr) & np.asarray(valid, bool)
        dets.append((polys[keep], conf[keep], labels[keep]))
    return dets


def _poly_iou(p1, p2):
    from rs_detection_tpu.ops.nms_poly import iou_poly_single

    return iou_poly_single(p1, p2)


def compare_dets(ref, got, iou_thr=0.7, score_tol=0.05,
                 count_tol=0.05):
    """Greedy per-image matching; returns (ok, report)."""
    lines = []
    ok = True
    for i, ((rp, rs, rl), (gp, gs, gl)) in enumerate(zip(ref, got)):
        nr, ng = len(rs), len(gs)
        if nr == 0 and ng == 0:
            continue
        denom = max(nr, 1)
        if abs(nr - ng) > count_tol * denom:   # count_tol=0 -> exact
            ok = False
            lines.append(f"img {i}: det count {ng} vs ref {nr}")
        matched = 0
        score_err = []
        used = np.zeros(ng, bool)
        for j in np.argsort(-rs):
            best, best_iou = -1, iou_thr
            for k in range(ng):
                if used[k] or gl[k] != rl[j]:
                    continue
                iou = _poly_iou(rp[j], gp[k])
                if iou > best_iou:
                    best, best_iou = k, iou
            if best >= 0:
                used[best] = True
                matched += 1
                score_err.append(abs(float(rs[j]) - float(gs[best])))
        recall = matched / denom
        mae = float(np.mean(score_err)) if score_err else 0.0
        lines.append(f"img {i}: matched {matched}/{nr} "
                     f"(recall {recall:.3f}), score MAE {mae:.4f}")
        if recall < 1.0 - count_tol or mae > score_tol:
            ok = False
    return ok, "\n".join(lines)


# ------------------------------------------------------------ selftest

def _export_reference_style(variables):
    """Flax variables -> flat reference-style state dict (torch
    layouts + jdet naming) — the inverse of the load path, used to
    prove the loop."""
    flat = {}

    def walk(tree, prefix, is_stats):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else str(k)
            if isinstance(v, dict):
                walk(v, name, is_stats)
                continue
            v = np.asarray(v)
            name = name.replace(".BatchNorm_0", "")
            if is_stats:
                name = name.replace(".mean", ".running_mean") \
                    .replace(".var", ".running_var")
            else:
                if name.endswith(".kernel"):
                    name = name[:-len(".kernel")] + ".weight"
                    if v.ndim == 4:
                        v = v.transpose(3, 2, 0, 1)   # HWIO -> OIHW
                    elif v.ndim == 2:
                        v = v.T
                elif name.endswith(".scale"):
                    name = name[:-len(".scale")] + ".weight"
            # jdet-style names the remap must invert
            name = re.sub(r"\bblock(\d+)_(\d+)\.", r"block\1.\2.", name)
            name = name.replace(".sgu.", ".spatial_gating_unit.")
            name = re.sub(r"\bshared_fc(\d+)\.", r"shared_fcs.\1.", name)
            name = name.replace("downsample_conv.", "downsample.0.")
            name = name.replace("downsample_bn.", "downsample.1.")
            flat[name] = v

    walk(variables.get("params", {}), "", False)
    walk(variables.get("batch_stats", {}), "", True)
    return flat


def selftest():
    import jax

    import __graft_entry__ as ge

    print("parity_check selftest: tiny flagship round-trip")
    model = ge._flagship(tiny=True)
    img = 64
    rng = np.random.RandomState(0)
    images = [(rng.rand(img, img, 3) * 255).astype(np.uint8)
              for _ in range(2)]
    import jax.numpy as jnp

    targets = ge._dummy_targets(1, img)
    example = (jnp.zeros((1, img, img, 3), jnp.float32), targets)
    variables = jax.jit(lambda i, t: model.init(
        {"params": jax.random.PRNGKey(3),
         "sampler": jax.random.PRNGKey(4)}, i, t))(*example)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ckpt = os.path.join(td, "ref_style.pkl")
        with open(ckpt, "wb") as f:
            pickle.dump({"meta": {"source": "selftest"},
                         "model": _export_reference_style(variables)},
                        f)
        ref_dets = run_inference(model, variables, images)
        loaded = load_and_audit(model, ckpt, example)
        got_dets = run_inference(model, loaded, images)
    ok, report = compare_dets(ref_dets, got_dets, iou_thr=0.99,
                              score_tol=1e-5, count_tol=0.0)
    print(report)
    if not ok:
        raise SystemExit("selftest FAILED")
    print("selftest OK: audit exact, detections identical")


# ---------------------------------------------------------------- main

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--selftest", action="store_true")
    ap.add_argument("--config", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--images", default=None)
    ap.add_argument("--ref-dets", default=None)
    ap.add_argument("--record", default=None,
                    help="write current detections to this pickle")
    ap.add_argument("--score-thr", type=float, default=0.05)
    ap.add_argument("--iou-thr", type=float, default=0.7)
    args = ap.parse_args()

    if args.selftest:
        # run the selftest on CPU: it must work on any box, and a dead
        # TPU tunnel makes backend init hang (see bench.py supervisor)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        return selftest()

    if not (args.config and args.ckpt and args.images):
        raise SystemExit("--config, --ckpt and --images are required "
                         "(or --selftest)")

    import jax.numpy as jnp
    from PIL import Image

    import rs_detection_tpu.data  # noqa: F401
    import rs_detection_tpu.models  # noqa: F401
    from rs_detection_tpu.config.config import Config
    from rs_detection_tpu.utils.registry import MODELS, build_from_cfg

    cfg = Config(args.config)
    model = build_from_cfg(cfg.model, MODELS)

    paths = sorted(
        p for p in os.listdir(args.images)
        if p.lower().endswith((".png", ".jpg", ".jpeg", ".tif")))
    images = [np.asarray(Image.open(os.path.join(args.images, p))
                         .convert("RGB"), np.uint8) for p in paths]
    if not images:
        raise SystemExit(f"no images under {args.images}")
    h, w = images[0].shape[:2]

    import __graft_entry__ as ge

    targets = ge._dummy_targets(1, max(h, w))
    example = (jnp.zeros((1, h, w, 3), jnp.float32), targets)

    # the RoI head's first shared fc follows a spatial flatten
    head = (cfg.model or {}).get("bbox_head") or {}
    c_in = head.get("in_channels", 256)
    p_out = (head.get("bbox_roi_extractor") or {}) \
        .get("roi_layer", {}).get("output_size", 7)
    fc_spatial = {"bbox_head.shared_fc0": (c_in, p_out, p_out)}

    variables = load_and_audit(model, args.ckpt, example,
                               fc_spatial=fc_spatial)
    dets = run_inference(model, variables, images,
                         score_thr=args.score_thr)

    if args.record:
        with open(args.record, "wb") as f:
            pickle.dump({"files": paths, "dets": dets}, f)
        print(f"recorded {sum(len(d[1]) for d in dets)} detections "
              f"over {len(paths)} images -> {args.record}")
        return

    if args.ref_dets:
        with open(args.ref_dets, "rb") as f:
            ref = pickle.load(f)["dets"]
        ok, report = compare_dets(ref, dets, iou_thr=args.iou_thr)
        print(report)
        if not ok:
            raise SystemExit("PARITY FAILED")
        print("PARITY OK")


if __name__ == "__main__":
    main()
