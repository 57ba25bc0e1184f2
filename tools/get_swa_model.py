"""SWA checkpoint averaging.

Capability parity with the reference ``tools/get_SWA_model.py:26-55``:
average the model weights of ``ckpt_<a>..ckpt_<b>`` into
``swa_<a>-<b>.pkl`` (optimizer/scheduler state dropped).
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def average_checkpoints(paths):
    """Arithmetic mean of the 'model' pytrees of several checkpoints."""
    import jax

    trees = []
    meta = {}
    for p in paths:
        with open(p, "rb") as f:
            data = pickle.load(f)
        trees.append(data["model"] if "model" in data else data)
        meta = data.get("meta", meta)
    avg = jax.tree_util.tree_map(
        lambda *xs: np.mean(np.stack([np.asarray(x) for x in xs]), 0)
        if isinstance(xs[0], (np.ndarray, float)) or hasattr(xs[0], "shape")
        else xs[0], *trees)
    return dict(meta=meta, model=avg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir", required=True)
    ap.add_argument("--start", type=int, required=True)
    ap.add_argument("--end", type=int, required=True)
    args = ap.parse_args()

    paths = [os.path.join(args.work_dir, "checkpoints",
                          f"ckpt_{e}.pkl")
             for e in range(args.start, args.end + 1)]
    paths = [p for p in paths if os.path.exists(p)]
    assert paths, "no checkpoints found in range"
    out = average_checkpoints(paths)
    out_path = os.path.join(args.work_dir, "checkpoints",
                            f"swa_{args.start}-{args.end}.pkl")
    with open(out_path, "wb") as f:
        pickle.dump(out, f)
    print("saved", out_path)


if __name__ == "__main__":
    main()
