#!/usr/bin/env python
"""Downstream evaluation of translated digits with the SimpleCNN classifier.

The reference trains SimpleCNN precisely to answer "is an 8→3 translation
still recognized as a 3?" (reference train_mnist_cls.py; SURVEY.md §2 #24).
This script classifies the saved pipeline outputs (pred_all.npy) and reports
the class distribution.

    python scripts/eval_translation.py --pred results/mnist_x250/pred_all.npy \
        --target-digit 3 --cls results/mnist_cls/best
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", default="results/mnist_x250/pred_all.npy")
    ap.add_argument("--cls", default="results/mnist_cls/best")
    ap.add_argument("--target-digit", type=int, default=3)
    ap.add_argument("--source-digit", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # tiny model; avoid the tunnel
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from localdiffusion_tpu.models import SimpleCNN

    preds = np.load(args.pred)  # [N, H, W, C] in [0, 2]
    model = SimpleCNN()
    template = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)))
    )
    params = ocp.StandardCheckpointer().restore(os.path.abspath(args.cls), template)

    # classifier was trained on the same [0, 2] normalization
    logits = model.apply(params, jnp.asarray(preds, jnp.float32))
    cls = np.asarray(jnp.argmax(logits, -1))
    n = len(cls)
    frac_target = float((cls == args.target_digit).mean())
    frac_source = float((cls == args.source_digit).mean())
    print(f"{n} translated images")
    print(f"classified as target digit {args.target_digit}: {frac_target:.1%}")
    print(f"classified as source digit {args.source_digit} (hallucinated "
          f"structure): {frac_source:.1%}")
    hist = {int(d): int((cls == d).sum()) for d in np.unique(cls)}
    print("class histogram:", hist)


if __name__ == "__main__":
    main()
