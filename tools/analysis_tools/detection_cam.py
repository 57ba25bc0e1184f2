"""Eigen-CAM model inspection for detectors.

Capability parity with the reference
(``tools/analysis_tools/detection_eigen_cam.py``): project a chosen
feature level's activations onto their first principal component and
overlay as a heatmap — no gradients needed, works for any backbone.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def eigen_cam(feat: np.ndarray) -> np.ndarray:
    """[H, W, C] feature map -> [H, W] first-principal-component map."""
    h, w, c = feat.shape
    flat = feat.reshape(-1, c)
    flat = flat - flat.mean(0, keepdims=True)
    # power iteration for the top right-singular vector
    v = np.ones((c,)) / np.sqrt(c)
    for _ in range(16):
        v = flat.T @ (flat @ v)
        v /= (np.linalg.norm(v) + 1e-12)
    cam = (flat @ v).reshape(h, w)
    cam = np.maximum(cam, 0)
    cam = cam / (cam.max() + 1e-12)
    return cam


def overlay(image: np.ndarray, cam: np.ndarray, alpha=0.5):
    import cv2

    heat = cv2.applyColorMap((cam * 255).astype(np.uint8),
                             cv2.COLORMAP_JET)
    heat = cv2.resize(heat, (image.shape[1], image.shape[0]))
    return (alpha * heat[..., ::-1]
            + (1 - alpha) * image).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--image", required=True)
    ap.add_argument("--level", type=int, default=0)
    ap.add_argument("--out", default="cam.png")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from rs_detection_tpu.config import init_cfg, get_cfg
    import rs_detection_tpu.models  # noqa: F401
    from rs_detection_tpu.utils.registry import MODELS, build_from_cfg

    init_cfg(args.config_file)
    model = build_from_cfg(get_cfg().model, MODELS)
    img = Image.open(args.image).convert("RGB")
    arr = np.asarray(img, np.float32)
    x = jnp.asarray(arr[None])
    variables = jax.jit(lambda i: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampler": jax.random.PRNGKey(1)}, i))(x)
    if args.checkpoint:
        from rs_detection_tpu.utils.checkpoint_convert import \
            load_reference_checkpoint
        params, bs = load_reference_checkpoint(args.checkpoint)
        variables = {"params": params, "batch_stats": bs}
    feats = model.apply(variables, x,
                        method=lambda m, im: m.extract_feats(im))
    cam = eigen_cam(np.asarray(feats[args.level][0], np.float32))
    out = overlay(np.asarray(img), cam)
    Image.fromarray(out).save(args.out)
    print("saved", args.out)


if __name__ == "__main__":
    main()
