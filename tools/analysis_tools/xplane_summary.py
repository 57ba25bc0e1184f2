"""Summarize a jax.profiler xplane trace: per-op device time.

Aggregates XLA-op event durations on the TPU device planes and prints
(a) time grouped by HLO category bucket and (b) the top individual ops,
so ms/step attribution comes from the device timeline rather than
host-side stage splits (which cost a fresh compile per stage through
the tunnel).

Usage:
  python tools/analysis_tools/xplane_summary.py <trace_dir> [--steps 3]
                                                [--top 40] [--like RE]

<trace_dir> is the directory passed to jax.profiler.trace(); the tool
finds the newest plugins/profile/*/ *.xplane.pb under it.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from collections import defaultdict


def _load_xspace(trace_dir: str):
    pats = sorted(
        glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                               "*.xplane.pb")),
        key=os.path.getmtime)
    if not pats:
        sys.exit(f"no xplane.pb under {trace_dir}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(pats[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs, pats[-1]


_TYPE_RE = re.compile(r"=\s*(?:\([^)]*\)|\S+)\s+([a-z][a-z0-9-]*)\(")

_BUCKETS = [
    ("conv", re.compile(r"^(convolution|conv)")),
    ("dot/matmul", re.compile(r"^(dot|gemm)")),
    ("fusion", re.compile(r"^fusion")),
    ("custom-call(pallas/fused)", re.compile(r"^custom-call")),
    ("copy/transpose", re.compile(r"^(copy|transpose|bitcast)")),
    ("gather/scatter", re.compile(r"^(gather|scatter|dynamic)")),
    ("sort/topk/while", re.compile(r"^(sort|top-k|topk|while)")),
    ("reduce", re.compile(r"^(reduce|all-reduce|reduce-window)")),
    ("rng", re.compile(r"^rng")),
]


def _bucket(name: str) -> str:
    # classify by the HLO op TYPE parsed from "%name = shape type(...)"
    # (op names like %mlp.38 are call-site labels, not types)
    m = _TYPE_RE.search(name)
    base = (m.group(1) if m else name.split(".")[0].lstrip("%")).lower()
    for label, pat in _BUCKETS:
        if pat.match(base):
            return label
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=3,
                    help="steps captured in the trace (divides totals)")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--like", default=None,
                    help="only show ops whose name matches this regex")
    args = ap.parse_args()

    xs, path = _load_xspace(args.trace_dir)
    print(f"# {path}")
    like = re.compile(args.like) if args.like else None

    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        per_op = defaultdict(float)
        spans = []
        for line in plane.lines:
            lname = line.name.lower()
            # the serialized per-op line. "Async XLA Ops" spans overlap
            # compute (span != cost) and "XLA Modules"/"Steps" would
            # double-count.
            if "async" in lname:
                continue
            if "xla op" not in lname and "xla_op" not in lname:
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                per_op[name] += ev.duration_ps / 1e9  # -> ms
                spans.append((ev.offset_ps,
                              ev.offset_ps + ev.duration_ps))
        # true device busy = union of event intervals. The per-op SUM
        # double-counts control-flow wrappers (a `conditional`/`while`
        # event covers its body ops, which are separate events on the
        # same line) — round-5 found the sum exceeding the e2e step
        # period by ~9%, which is physically impossible for serialized
        # TensorCore ops.
        busy_union = 0.0
        if spans:
            spans.sort()
            cs, ce = spans[0]
            for s0, e0 in spans[1:]:
                if s0 > ce:
                    busy_union += ce - cs
                    cs, ce = s0, e0
                else:
                    ce = max(ce, e0)
            busy_union += ce - cs
            busy_union /= 1e9  # ps -> ms
        if not per_op:
            # fall back: deepest line by total nesting level
            lines = [ln for ln in plane.lines if ln.events]
            if not lines:
                continue
            line = max(lines, key=lambda ln: len(ln.events))
            for ev in line.events:
                per_op[meta[ev.metadata_id].name] += ev.duration_ps / 1e9
        total = sum(per_op.values())
        print(f"\n== {plane.name}: {busy_union / args.steps:.2f} ms/step"
              f" device busy (interval union; per-op sum "
              f"{total / args.steps:.2f} double-counts control-flow "
              f"wrappers; {len(per_op)} distinct ops) ==")
        by_bucket = defaultdict(float)
        for name, ms in per_op.items():
            by_bucket[_bucket(name)] += ms
        for label, ms in sorted(by_bucket.items(), key=lambda kv: -kv[1]):
            print(f"  {ms / args.steps:8.2f} ms/step  {label}")
        print(f"\n  top {args.top} ops (ms/step):")
        shown = 0
        for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1]):
            if like and not like.search(name):
                continue
            print(f"  {ms / args.steps:8.3f}  {name[:110]}")
            shown += 1
            if shown >= args.top:
                break


if __name__ == "__main__":
    main()
