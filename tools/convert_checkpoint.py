"""Convert a torch checkpoint (reference-trained weights) to this
framework's pickle checkpoint format.

Reference parity: the reference loads torch-converted weights through
``Runner.load`` accepting ``model``/``state_dict``/raw dicts
(``runner.py:283-288``). Here: torch state_dict (.pth, loaded with
torch CPU) -> OIHW->HWIO layout conversion (``torch_state_to_flax``)
-> ``{meta, model={params, batch_stats}}`` pickle that ``Runner.load``
and ``pretrained_weights`` consume.

Usage:
  python tools/convert_checkpoint.py --src van_b3.pth --out van_b3.pkl
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help=".pth / .pt torch file")
    ap.add_argument("--out", required=True, help="output .pkl")
    ap.add_argument("--key", default=None,
                    help="sub-dict key holding the state_dict "
                         "(e.g. 'state_dict' or 'model')")
    args = ap.parse_args()

    import numpy as np
    import torch

    from rs_detection_tpu.utils.checkpoint_convert import \
        torch_state_to_flax

    state = torch.load(args.src, map_location="cpu",
                       weights_only=False)
    if args.key:
        state = state[args.key]
    elif isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    elif isinstance(state, dict) and "model" in state:
        state = state["model"]
    state = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
             for k, v in state.items()}
    params, batch_stats = torch_state_to_flax(state)
    out = dict(meta=dict(source=os.path.basename(args.src)),
               model=dict(params=params, batch_stats=batch_stats))
    with open(args.out, "wb") as f:
        pickle.dump(out, f)
    n = sum(np.asarray(v).size for v in state.values())
    print(f"wrote {args.out} ({n/1e6:.1f}M params)")


if __name__ == "__main__":
    main()
