#!/usr/bin/env python
"""Convert BRATS .mha volumes to the .npy arrays the volume datasets consume.

The reference reads .mha directly through medpy (reference data.py:444-604);
this framework's BRATSVolumeDataset takes [D, H, W] numpy arrays instead
(data/brats.py), so real BRATS data is staged once:

    python scripts/convert_mha.py 'BRATS/*/VSD.Brain*T1*.mha' --out-dir npy/

Uses the built-in MetaImage reader (data/mha.py) — no medpy/SimpleITK
required.  Globs are expanded per argument; each volume saves as
<out-dir>/<stem>.npy.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from localdiffusion_tpu.data.mha import load_mha


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("patterns", nargs="+", help=".mha paths or globs")
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--dtype", default=None,
                    help="optional cast (e.g. float32) to shrink disk use")
    args = ap.parse_args()

    files = []
    for pat in args.patterns:
        matched = sorted(glob.glob(pat))
        if not matched and os.path.exists(pat):
            matched = [pat]
        files.extend(matched)
    if not files:
        print("no .mha files matched", file=sys.stderr)
        sys.exit(1)

    os.makedirs(args.out_dir, exist_ok=True)
    for path in files:
        vol, header = load_mha(path)
        if args.dtype:
            vol = vol.astype(args.dtype)
        stem = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(args.out_dir, stem + ".npy")
        np.save(out, vol)
        print(f"{path} -> {out}  shape={vol.shape} dtype={vol.dtype} "
              f"(ElementType={header.get('ElementType')})")


if __name__ == "__main__":
    main()
