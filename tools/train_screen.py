"""Train a TileScreen (sparse-scene objectness screen) on a tiled
detection dataset.

The screen's label is free: a tile is positive iff it carries any GT
box (``targets["gt_mask"].any()``), so any dataset the detector
trains on trains the screen too. See
``rs_detection_tpu/models/networks/tile_screen.py`` for why the
screen exists (sparse-scene serving) and ``data/scene.py`` for how a
trained checkpoint is consumed (``SceneDataset(screen=dict(
checkpoint=..., thresh=...))``).

Usage:
    python tools/train_screen.py --config-file configs/... \
        --iters 2000 --lr 1e-3 --out work_dirs/screen.pkl

The config's ``dataset.train`` entry is used verbatim.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="work_dirs/screen.pkl")
    ap.add_argument("--log-interval", type=int, default=50)
    args = ap.parse_args()

    import jax
    import optax
    from flax import serialization

    from rs_detection_tpu.config.config import init_cfg, get_cfg
    from rs_detection_tpu.models.networks.tile_screen import (
        TileScreen, screen_loss)
    from rs_detection_tpu.utils.registry import DATASETS, build_from_cfg

    init_cfg(args.config_file)
    cfg = get_cfg()
    dataset = build_from_cfg(cfg.dataset.train, DATASETS)

    model = TileScreen()
    import numpy as np

    first = next(iter(dataset.batches()))
    images = np.asarray(first[0])
    variables = model.init(jax.random.PRNGKey(0), images[:1])
    tx = optax.adamw(args.lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, images, labels):
        def lossfn(p):
            logits = model.apply({"params": p}, images)
            return screen_loss(logits, labels)

        (loss, metrics), grads = jax.value_and_grad(
            lossfn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    params = variables["params"]
    it = 0
    while it < args.iters:
        for images, targets, _ in dataset.batches(seed=it):
            labels = targets["gt_mask"].any(axis=1)
            params, opt_state, metrics = step(
                params, opt_state, images, labels)
            it += 1
            if it % args.log_interval == 0:
                m = jax.tree_util.tree_map(float, metrics)
                print(f"iter {it}: loss {m['screen_loss']:.4f} "
                      f"acc {m['screen_acc']:.3f}", flush=True)
            if it >= args.iters:
                break

    os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(dict(model=serialization.to_state_dict(
            {"params": params})), f)
    print(f"saved screen checkpoint to {args.out}")


if __name__ == "__main__":
    main()
