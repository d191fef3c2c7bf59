"""Convert a reference torch checkpoint (Trainer.save .pt) to flax npz.

The reference trainer saves ``model-<milestone>.pt`` dicts of
``{'step', 'model', 'opt', 'ema', 'scaler'}`` (reference ddpm.py:1495-1507).
This CLI maps the UNet (and EMA UNet) weights onto our flax param tree
(utils/reference_ckpt.py) and writes ``<out>-params.npz`` /
``<out>-ema.npz`` slim snapshots loadable via utils/params_io.load_params_npz
— making the SSIM-vs-reference parity gate a one-command check the day
reference-trained weights surface.

Usage:
  python scripts/convert_reference_ckpt.py model-10.pt --out results/ref \
      --dim 32 --dim-mults 1,2,4 --full-attn 0,0,1 --mode mnist
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from localdiffusion_tpu.config import ModelConfig  # noqa: E402
from localdiffusion_tpu.utils.params_io import save_params_npz  # noqa: E402
from localdiffusion_tpu.utils.reference_ckpt import (  # noqa: E402
    load_reference_checkpoint,
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="reference model-<milestone>.pt")
    ap.add_argument("--out", required=True, help="output prefix")
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--dim-mults", default="1,2,4,8")
    ap.add_argument("--full-attn", default=None,
                    help="comma 0/1 per stage; default: last stage only")
    ap.add_argument("--mode", default="mri",
                    help="reference cond-encoder mode (mri|mnist|mvtec|mvtecSR)")
    ap.add_argument("--channels", type=int, default=1)
    ap.add_argument("--f16", action="store_true",
                    help="store float16 (default float32 to preserve parity)")
    args = ap.parse_args()

    mults = tuple(int(v) for v in args.dim_mults.split(","))
    if args.full_attn is None:
        full_attn = tuple(i == len(mults) - 1 for i in range(len(mults)))
    else:
        full_attn = tuple(bool(int(v)) for v in args.full_attn.split(","))
    depth = "shallow" if args.mode in ("mnist", "mvtecSR") else "deep"
    cfg = ModelConfig(
        dim=args.dim, dim_mults=mults, full_attn=full_attn,
        channels=args.channels, cond_encoder_depth=depth,
    )

    out = load_reference_checkpoint(args.checkpoint, cfg)
    dtype = np.float16 if args.f16 else np.float32
    save_params_npz(f"{args.out}-params.npz", out["params"], dtype=dtype)
    print(f"wrote {args.out}-params.npz (step {out['step']})")
    if out["ema_params"] is not None:
        save_params_npz(f"{args.out}-ema.npz", out["ema_params"], dtype=dtype)
        print(f"wrote {args.out}-ema.npz")


if __name__ == "__main__":
    main()
