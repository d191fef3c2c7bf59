#!/usr/bin/env python
"""Attribute device time in a jax.profiler trace to model stages.

Parses the trace-viewer JSON emitted by `bench.py --profile` (or any
`jax.profiler.trace` capture) and groups TPU-op durations by the
`jax.named_scope` / flax module-path metadata embedded in each XLA op's
name, answering "which UNet stage owns the device time" (e.g. the
s2d_down0 full-res stage vs the int_down1 C=64@128² stage of the exact
s2d layout execution — models/unet_s2d.py).

Usage:
    python scripts/profile_attr.py /tmp/jax_trace_256 [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace_file(root: str) -> str:
    pats = [
        os.path.join(root, "**", "*.trace.json.gz"),
        os.path.join(root, "**", "trace.json.gz"),
        os.path.join(root, "**", "*.trace.json"),
    ]
    hits: list[str] = []
    for p in pats:
        hits.extend(glob.glob(p, recursive=True))
    if not hits:
        raise FileNotFoundError(f"no trace-viewer json under {root}")
    return max(hits, key=os.path.getmtime)


def load_events(path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", data)


# stage scopes: named_scope labels from models/unet_s2d.py plus flax module
# paths from models/unet.py (down{i}_*, up{j}_*, mid_*, cond_model, ...)
_SCOPE_RE = re.compile(
    r"(s2d_init_conv|s2d_down0|s2d_up_last|s2d_final|int_down\d|int_up\d|"
    r"mid_fusion|mid|cond_encoder|cond_model|down\d_\w+|up\d_\w+|"
    r"mid_block\d|mid_attn|conv_fusion|final_res_block|final_conv|init_conv|"
    r"time_mlp)"
)

# op-category from the HLO instruction name prefix
_CAT_RE = re.compile(r"^(?:%?)([a-zA-Z-]+)[.\d]")


def classify(name: str, args: dict):
    """Returns (stage, category) for one device event."""
    meta = " ".join(
        str(v) for k, v in args.items()
        if k in ("long_name", "tf_op", "name", "hlo_op", "full name")
    )
    hay = name + " " + meta
    m = _SCOPE_RE.search(hay)
    stage = m.group(1) if m else "(unattributed)"
    cm = _CAT_RE.match(name.lstrip("%"))
    cat = cm.group(1) if cm else name.split(".")[0][:24]
    return stage, cat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--stage", default=None,
                    help="print the op breakdown of one stage")
    ap.add_argument("--ops", action="store_true",
                    help="also list the top individual HLO ops")
    args = ap.parse_args()

    path = find_trace_file(args.trace_dir)
    print(f"# {path}", file=sys.stderr)
    events = load_events(path)

    # device tracks: pids whose process_name mentions TPU / TensorCore
    names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, n in names.items()
        if any(s in n for s in ("TPU", "TensorCore", "/device:"))
    }

    by_stage = collections.Counter()
    by_cat = collections.Counter()
    by_stage_cat = collections.Counter()
    by_op = collections.Counter()
    op_count = collections.Counter()
    total = 0.0
    n_ops = 0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        dur = float(ev.get("dur", 0.0))
        if dur <= 0:
            continue
        # skip track-level aggregates (steps, XLA Modules rows)
        tname = ev.get("name", "")
        if tname.startswith(("jit_", "XLA Modules", "Steps")):
            continue
        stage, cat = classify(tname, ev.get("args", {}))
        # container ops (scan loops, conditionals) re-count their children:
        # every op inside the sampling scan also appears as its own event,
        # so including the parent would double the total
        if cat in ("while", "conditional", "call"):
            continue
        if args.stage and stage != args.stage:
            continue
        by_stage[stage] += dur
        by_cat[cat] += dur
        by_stage_cat[(stage, cat)] += dur
        by_op[tname] += dur
        op_count[tname] += 1
        total += dur
        n_ops += 1

    if total == 0:
        print("no device events found (is this a TPU trace?)")
        return

    print(f"device op time total: {total / 1e3:.2f} ms over {n_ops} events\n")
    print("== by stage ==")
    for stage, dur in by_stage.most_common(args.top):
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%  {stage}")
    print("\n== by op category ==")
    for cat, dur in by_cat.most_common(args.top):
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%  {cat}")
    print("\n== stage × category (top) ==")
    for (stage, cat), dur in by_stage_cat.most_common(args.top):
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%  {stage:16s} {cat}")
    if args.ops:
        print("\n== individual ops (top) ==")
        for opname, dur in by_op.most_common(args.top):
            print(f"{dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%  "
                  f"×{op_count[opname]:<4d} {opname[:110]}")


if __name__ == "__main__":
    main()
