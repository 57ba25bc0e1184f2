"""Port the reference config zoo in-repo.

The reference ships ~90 config files (``/root/reference/configs/**``
and ``/root/reference/projects/*/configs/*.py``, SURVEY §2.6); the
"configs run verbatim" contract must hold with the reference repo
unmounted, so the zoo is shipped in-repo. Configs are hyperparameter
DATA — parity requires value-identical recipes — so this tool ports
them mechanically instead of hand-transcribing ~16k lines:

  1. load each reference config through this repo's own resolver
     (``rs_detection_tpu.config.config._resolve`` — ``_base_`` chains
     are inlined, f-string paths already evaluated),
  2. rewrite machine-specific absolute dataset paths to repo-relative
     ``datasets/...`` locations,
  3. emit a restyled, deterministic rendering (type-first sorted keys,
     double quotes, canonical section order) to the same relative
     location under this repo.

``tests/test_config_zoo.py`` re-runs steps 1–2 against the emitted
files to prove the in-repo zoo is semantically identical to the
reference surface, and builds every model through the registry.

Usage: python tools/port_reference_configs.py [--ref /root/reference]
       [--check]  (exit 1 if any emitted file is out of date)
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# dataset-root directory names seen across the reference's machines;
# everything from the marker onward is kept under ``datasets/``
_PATH_MARKERS = {
    "processed_DOTA", "processed_DOTA1_5", "DOTA_1024",
    "DOTA_1024_05_10", "DOTA_1024_05_10_15", "DOTA1_5", "FAIR",
    "fair_1024", "processed_SSDD", "processed_SSDD_plus",
    "Official-SSDD-OPEN", "coco", "coco128", "preprocessed",
    "preprocessed_ms", "preprocessed_ms_le90", "dota", "dota_ms",
    "data", "Detection",
}
_KEEP_MARKERS = {"work_dirs"}  # already repo-relative concepts


def rewrite_path(value: str) -> str:
    """Map one machine-specific absolute path to a repo-relative one."""
    if not value.startswith("/"):
        return value
    parts = [p for p in value.split("/") if p]
    for i, part in enumerate(parts):
        if part in _KEEP_MARKERS:
            return "/".join(parts[i:])
        if part in _PATH_MARKERS:
            return "datasets/" + "/".join(parts[i:])
    # unknown machine path: keep the leaf under datasets/
    return "datasets/" + parts[-1]


def rewrite_tree(node):
    if isinstance(node, dict):
        return {k: rewrite_tree(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [rewrite_tree(v) for v in node]
    if isinstance(node, str):
        return rewrite_path(node)
    return node


# ---------------------------------------------------------------- emit

_SECTION_ORDER = [
    "model", "dataset", "optimizer", "scheduler", "optimizer_swa",
    "scheduler_swa", "parameter_groups_generator", "logger",
]


def _quote(s: str) -> str:
    import json

    return json.dumps(s)


def _ident(k) -> bool:
    return isinstance(k, str) and k.isidentifier()


def _keys(d: dict):
    ks = list(d.keys())
    ks.sort(key=lambda k: (k != "type", str(k)))
    return ks


def _fmt(value, indent: int) -> str:
    pad = " " * indent
    inner = " " * (indent + 4)
    if isinstance(value, dict):
        if not value:
            return "dict()"
        if all(_ident(k) for k in value):
            items = [f"{inner}{k}={_fmt(value[k], indent + 4)},"
                     for k in _keys(value)]
            return "dict(\n" + "\n".join(items) + f"\n{pad})"
        items = [f"{inner}{_quote(str(k))}: {_fmt(value[k], indent + 4)},"
                 for k in _keys(value)]
        return "{\n" + "\n".join(items) + f"\n{pad}}}"
    if isinstance(value, (list, tuple)):
        vals = [_fmt(v, indent + 4) for v in value]
        one_line = "[" + ", ".join(vals) + "]"
        if len(one_line) + indent <= 72 and "\n" not in one_line:
            return one_line
        return ("[\n" + "\n".join(f"{inner}{v}," for v in vals)
                + f"\n{pad}]")
    if isinstance(value, str):
        return _quote(value)
    if isinstance(value, float):
        return repr(value)
    return repr(value)  # int / bool / None


def render(cfg: dict, ref_rel: str) -> str:
    head = (
        f"# Ported from the reference config zoo: {ref_rel}\n"
        "# (hyperparameter data — values must match the reference\n"
        "# recipe for parity; machine-specific dataset paths are\n"
        "# rewritten to repo-relative datasets/ locations).\n"
        "# Regenerate with tools/port_reference_configs.py.\n\n"
    )
    keys = [k for k in _SECTION_ORDER if k in cfg]
    keys += sorted(k for k in cfg if k not in _SECTION_ORDER)
    body = "\n".join(f"{k} = {_fmt(cfg[k], 0)}\n" for k in keys)
    return head + body


# ---------------------------------------------------------------- main

def reference_configs(ref: str):
    pats = [os.path.join(ref, "configs", "**", "*.py"),
            os.path.join(ref, "projects", "*", "configs", "*.py")]
    seen = []
    for pat in pats:
        seen += glob.glob(pat, recursive=True)
    return sorted(set(seen))


def ported_pair(ref: str, path: str):
    """(in-repo destination, reference-relative name) for a ref cfg."""
    rel = os.path.relpath(path, ref)
    return os.path.join(REPO, rel), rel


def port_one(ref: str, path: str):
    from rs_detection_tpu.config.config import _resolve

    return rewrite_tree(_resolve(path))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    if not os.path.isdir(args.ref):
        print(f"reference not mounted at {args.ref}; nothing to do")
        return 0

    stale = []
    for path in reference_configs(args.ref):
        dst, rel = ported_pair(args.ref, path)
        text = render(port_one(args.ref, path), rel)
        if args.check:
            try:
                with open(dst) as f:
                    ok = f.read() == text
            except OSError:
                ok = False
            if not ok:
                stale.append(rel)
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "w") as f:
            f.write(text)
        print("ported", rel)
    if stale:
        print("STALE:", *stale, sep="\n  ")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
