"""Legacy / mmdet-style config adaptation.

The reference ships configs in several generations of schema (SURVEY
§2.6): the modern JDet style (``rpn=``/``bbox_head=`` with this repo's
kwarg names), the mmdet-v1 composed style (``rpn_head`` +
``bbox_roi_extractor`` + ``bbox_head`` + ``rbbox_*`` + ``train_cfg`` /
``test_cfg`` — ``projects/roi_transformer``, ``projects/faster_rcnn``),
and one-off head families (``RRetinaHead`` in ``projects/r3det``,
``rpn_net`` in ``projects/retinanet``, ``roi_heads`` in
``projects/fcos``). These adapters normalize every generation onto the
TPU-native modules so all reference configs build and run verbatim
(BASELINE.json contract).

Conventions handled:
  * mmdet-v1 ``num_classes`` INCLUDES background; the TPU heads count
    foreground classes only.
  * ``anchor_scales``/``anchor_ratios``/``anchor_strides`` flat kwargs
    vs the nested ``anchor_generator`` dict.
  * per-stage ``target_stds`` live on the stage head configs; the
    cascade head takes them as ``stage1_stds``/``stage2_stds``.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Dict, Optional


def _plain(node):
    if isinstance(node, Mapping):
        return {k: _plain(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_plain(v) for v in node]
    return node


def adapt_rpn_cfg(cfg) -> Optional[Dict[str, Any]]:
    """Normalize a legacy ``rpn_head`` section (``FasterrcnnHead`` /
    ``RPNHead`` with flat anchor kwargs) to this repo's RPNHead cfg."""
    if cfg is None or not isinstance(cfg, Mapping):
        return cfg
    cfg = _plain(cfg)
    t = cfg.get("type")
    legacy = ("anchor_scales" in cfg or "loss_cls" in cfg
              or t == "FasterrcnnHead")
    if not legacy:
        return cfg
    out = dict(type="RPNHead",
               in_channels=cfg.get("in_channels", 256),
               feat_channels=cfg.get("feat_channels", 256))
    if "anchor_scales" in cfg:
        out["anchor_generator"] = dict(
            scales=cfg["anchor_scales"],
            ratios=cfg.get("anchor_ratios", [0.5, 1.0, 2.0]),
            strides=cfg.get("anchor_strides", [4, 8, 16, 32, 64]))
    elif "anchor_generator" in cfg:
        ag = dict(cfg["anchor_generator"])
        ag.pop("type", None)
        out["anchor_generator"] = ag
    if "target_means" in cfg:
        out["target_means"] = list(cfg["target_means"])[:4]
    if "target_stds" in cfg:
        out["target_stds"] = list(cfg["target_stds"])[:4]
    lb = cfg.get("loss_bbox") or {}
    if "beta" in lb:
        out["smooth_l1_beta"] = lb["beta"]
    return out


def adapt_cascade_head(bbox_head, rbbox_head=None,
                       bbox_roi_extractor=None,
                       rbbox_roi_extractor=None,
                       train_cfg=None) -> Dict[str, Any]:
    """Fold mmdet-v1 composed cascade sections (stage heads +
    extractors + train_cfg) into one RoITransformerHead cfg.

    With ``rbbox_head`` present this is the 2-stage RoI-Transformer
    cascade; without it this is FasterRCNNOBB's single shared-FC
    rotated stage (reference ``networks/faster_rcnn_obb.py:8``) —
    ``num_stages=1``, no rotated-align refinement."""
    bbox_head = _plain(bbox_head) or {}
    rbbox_head = _plain(rbbox_head)
    stage2 = rbbox_head if rbbox_head is not None else bbox_head
    out = dict(
        type="RoITransformerHead",
        # mmdet-v1 num_classes includes background
        num_classes=int(stage2.get("num_classes", 16)) - 1,
        in_channels=bbox_head.get("in_channels", 256),
        num_stages=2 if rbbox_head is not None else 1,
    )
    if "KFIoU" in str(stage2.get("type", "")) \
            or (stage2.get("loss_bbox") or {}).get("loss_type") == "kfiou":
        out["reg_loss"] = "kfiou"
    if bbox_head.get("target_stds") is not None:
        out["stage1_stds"] = list(bbox_head["target_stds"])
    if stage2.get("target_stds") is not None:
        out["stage2_stds"] = list(stage2["target_stds"])
    ext = _plain(bbox_roi_extractor) or _plain(rbbox_roi_extractor)
    if ext and ext.get("featmap_strides") is not None:
        out["featmap_strides"] = list(ext["featmap_strides"])
    tc = _plain(train_cfg) or {}
    rcnn = tc.get("rcnn")
    if isinstance(rcnn, list) and rcnn:
        rcnn = rcnn[0]
    if isinstance(rcnn, Mapping):
        smp = rcnn.get("sampler") or {}
        if "num" in smp:
            out["sampler_num"] = smp["num"]
        if "pos_fraction" in smp:
            out["pos_fraction"] = smp["pos_fraction"]
    return out


def adapt_retina_like(cfg) -> Dict[str, Any]:
    """Map an mmdet-v2-style rotated retina head section (r3det's
    ``RRetinaHead``) onto this repo's RetinaHead cfg."""
    cfg = _plain(cfg)
    out = dict(type="RetinaHead",
               # mmdet-v2 num_classes excludes background; RetinaHead
               # counts classes incl. background
               num_classes=int(cfg.get("num_classes", 15)) + 1,
               in_channels=cfg.get("in_channels", 256),
               feat_channels=cfg.get("feat_channels", 256),
               stacked_convs=cfg.get("stacked_convs", 4))
    ag = cfg.get("anchor_generator") or {}
    if "octave_base_scale" in ag:
        out["octave_base_scale"] = ag["octave_base_scale"]
    if "scales_per_octave" in ag:
        out["scales_per_octave"] = ag["scales_per_octave"]
    if ag.get("ratios") is not None:
        out["anchor_ratios"] = list(ag["ratios"])
    if ag.get("strides") is not None:
        out["anchor_strides"] = list(ag["strides"])
    if ag.get("angles"):
        out["anchor_angles"] = list(ag["angles"])
    coder = cfg.get("bbox_coder") or {}
    if coder.get("target_means") is not None:
        out["target_means"] = list(coder["target_means"])
    if coder.get("target_stds") is not None:
        out["target_stds"] = list(coder["target_stds"])
    lc = cfg.get("loss_cls") or {}
    if "gamma" in lc:
        out["focal_gamma"] = lc["gamma"]
    if "alpha" in lc:
        out["focal_alpha"] = lc["alpha"]
    lb = cfg.get("loss_bbox") or {}
    if "beta" in lb:
        out["smooth_l1_beta"] = lb["beta"]
    return out


def adapt_refine_head(cfg, num_classes_fallback=16) -> Dict[str, Any]:
    """r3det ``RRetinaRefineHead`` -> R3DetRefineHead cfg."""
    cfg = _plain(cfg)
    out = dict(type="R3DetRefineHead",
               num_classes=int(cfg.get("num_classes",
                                       num_classes_fallback - 1)) + 1,
               in_channels=cfg.get("in_channels", 256),
               feat_channels=cfg.get("feat_channels", 256),
               stacked_convs=cfg.get("stacked_convs", 2))
    coder = cfg.get("bbox_coder") or {}
    if coder.get("target_stds") is not None:
        out["target_stds"] = list(coder["target_stds"])
    return out


def _filter_to_fields(cls, kw: Dict[str, Any]) -> Dict[str, Any]:
    """Keep only kwargs that are dataclass fields of ``cls`` (plus
    'type'), so stray legacy keys can't break construction."""
    import dataclasses

    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in kw.items() if k in names or k == "type"}


def adapt_single_stage_head(cfg):
    """Normalize any generation of single-stage head section onto the
    TPU-native head cfgs (dispatch on ``type``, then a generic
    mmdet-style flattening of nested loss/test_cfg/train_cfg sections
    filtered to the target head's dataclass fields)."""
    if cfg is None or not isinstance(cfg, Mapping):
        return cfg
    cfg = _plain(cfg)
    t = cfg.get("type")
    if t == "RRetinaHead":
        return adapt_retina_like(cfg)
    if t == "RetinaHead" and ("n_class" in cfg or "mode" in cfg):
        return _adapt_legacy_retina(cfg)
    if t == "SSDHead":
        return _adapt_ssd(cfg)
    return _adapt_generic(cfg)


def normalize_cfg(cfg, registry) -> Dict[str, Any]:
    """Generic mmdet-section flattening against the target dataclass:
    ``loss_*_cls`` gamma/alpha -> ``focal_gamma``/``focal_alpha`` (and
    ``loss_weight`` -> ``loss_cls_weight``), ``loss_*_bbox`` beta/
    loss_weight -> ``smooth_l1_beta``/``loss_bbox_weight``,
    ``test_cfg`` keys -> same-named fields (+ nms iou thresholds ->
    ``nms_iou_thr``), ``train_cfg`` assigner thresholds -> pos/neg/min
    iou fields — then drop anything the target class doesn't declare.
    Non-dataclass registry entries (ctor functions taking **kw) pass
    through untouched."""
    import dataclasses

    if cfg is None or not isinstance(cfg, Mapping):
        return cfg
    t = cfg.get("type")
    try:
        cls = registry.get(t) if t else None
    except KeyError:
        return cfg
    if cls is None or not dataclasses.is_dataclass(cls):
        return cfg
    names = {f.name for f in dataclasses.fields(cls)}
    out = dict(_plain(cfg))
    for key in list(out):
        sec = out[key]
        if not isinstance(sec, Mapping) or key in names:
            continue
        if key.startswith("loss") and key.endswith("cls"):
            if "gamma" in sec and "focal_gamma" in names:
                out["focal_gamma"] = sec["gamma"]
            if "alpha" in sec and "focal_alpha" in names:
                out["focal_alpha"] = sec["alpha"]
            if "loss_weight" in sec and "loss_cls_weight" in names:
                out["loss_cls_weight"] = sec["loss_weight"]
        elif key.startswith("loss") and key.endswith("bbox"):
            if "beta" in sec and "smooth_l1_beta" in names:
                out["smooth_l1_beta"] = sec["beta"]
            if "loss_weight" in sec and "loss_bbox_weight" in names:
                out["loss_bbox_weight"] = sec["loss_weight"]
        elif key == "test_cfg":
            for k, v in sec.items():
                if not isinstance(v, Mapping) and k in names:
                    out.setdefault(k, v)
            nms = sec.get("nms") or {}
            thr = nms.get("iou_thr", nms.get("iou_threshold"))
            if thr is not None and "nms_iou_thr" in names:
                out["nms_iou_thr"] = thr
        elif key == "train_cfg":
            asn = sec.get("assigner") or \
                (sec.get("fam_cfg") or {}).get("assigner") or {}
            for k in ("pos_iou_thr", "neg_iou_thr", "min_pos_iou"):
                if k in asn and k in names:
                    out[k] = asn[k]
    return _filter_to_fields(cls, out)


def _adapt_generic(cfg) -> Dict[str, Any]:
    from ...utils.registry import HEADS

    return normalize_cfg(cfg, HEADS)


def _adapt_legacy_retina(cfg) -> Dict[str, Any]:
    """Creator-style RetinaHead (reference ``retina_head.py``: n_class,
    mode, explicit rotated anchor generator) -> RetinaHead cfg."""
    import numpy as np

    out = dict(type="RetinaHead",
               num_classes=int(cfg.get("n_class", 15)) + 1,
               in_channels=cfg.get("in_channels", 256),
               feat_channels=cfg.get("feat_channels",
                                     cfg.get("in_channels", 256)),
               stacked_convs=cfg.get("stacked_convs", 4))
    if "score_threshold" in cfg:
        out["score_thr"] = cfg["score_threshold"]
    if "nms_iou_threshold" in cfg:
        out["nms_iou_thr"] = cfg["nms_iou_threshold"]
    if "max_dets" in cfg:
        out["max_per_img"] = min(int(cfg["max_dets"]), 4096)
    if "roi_beta" in cfg:
        out["smooth_l1_beta"] = cfg["roi_beta"]
    ag = cfg.get("anchor_generator") or {}
    if ag.get("strides") is not None:
        out["anchor_strides"] = list(ag["strides"])
    if ag.get("ratios") is not None:
        out["anchor_ratios"] = list(ag["ratios"])
    scales = ag.get("scales")
    base_sizes = ag.get("base_sizes")
    if scales is not None and base_sizes is not None \
            and ag.get("strides") is not None:
        # explicit octave scales + base sizes: recover
        # octave_base_scale (base/stride) and scales_per_octave
        out["octave_base_scale"] = int(round(
            base_sizes[0] / ag["strides"][0] * scales[0]))
        out["scales_per_octave"] = len(scales)
    angles = ag.get("angles")
    if angles:
        arr = np.asarray(angles, np.float64)
        if np.abs(arr).max() > 3.2:          # degrees -> radians
            arr = arr * np.pi / 180.0
        out["anchor_angles"] = [float(a) for a in arr]
    from ..roi_heads.retina_head import RetinaHead

    return _filter_to_fields(RetinaHead, out)


def _adapt_ssd(cfg) -> Dict[str, Any]:
    out = dict(cfg)
    # mmdet SSDHead num_classes excludes background; ours includes it
    out["num_classes"] = int(cfg.get("num_classes", 80)) + 1
    ag = out.pop("anchor_generator", None) or {}
    if ag.get("strides") is not None:
        out["anchor_strides"] = list(ag["strides"])
    if ag.get("ratios") is not None:
        out["anchor_ratios"] = [list(r) for r in ag["ratios"]]
    if ag.get("basesize_ratio_range") is not None:
        out["basesize_ratio_range"] = tuple(ag["basesize_ratio_range"])
    if ag.get("input_size") is not None:
        out["input_size"] = int(ag["input_size"])
    coder = out.pop("bbox_coder_cfg", None) or out.pop("bbox_coder",
                                                       None) or {}
    if coder.get("target_means") is not None:
        out["target_means"] = list(coder["target_means"])
    if coder.get("target_stds") is not None:
        out["target_stds"] = list(coder["target_stds"])
    tc = out.pop("train_cfg", None) or {}
    if "neg_pos_ratio" in tc:
        out["neg_pos_ratio"] = tc["neg_pos_ratio"]
    ec = out.pop("test_cfg", None) or {}
    for k in ("nms_pre", "score_thr", "max_per_img"):
        if k in ec:
            out[k] = ec[k]
    nms = ec.get("nms") or {}
    if "iou_threshold" in nms:
        out["nms_iou_thr"] = nms["iou_threshold"]
    from ..roi_heads.ssd_head import SSDHead

    return _filter_to_fields(SSDHead, out)
