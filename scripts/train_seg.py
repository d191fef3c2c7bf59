#!/usr/bin/env python
"""Train the segmentation OOD detector (reference train_seg.py equivalent).

BCEWithLogits(pos_weight=10) + Dice, Adam 1e-3, best-dice checkpointing
(reference train_seg.py:64-121).  Runs on synthetic brain pairs when no
BRATS data is configured, so the flow is always exercisable.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from localdiffusion_tpu.utils.logging import (
        enable_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--out", default="results/seg/best_dice")
    ap.add_argument("--raw", action="store_true",
                    help="train on raw-intensity t1 instead of the "
                         "pipeline-normalized conditioning distribution")
    ap.add_argument("--config", default=None,
                    help="config whose normalization stats define the "
                         "training distribution (ADVICE r4: the detector "
                         "must see the SAME normalization ood/frontend.py "
                         "feeds it at inference); defaults to the "
                         "synthetic_brain_translation built-ins")
    args = ap.parse_args()

    from localdiffusion_tpu.data import ArrayLoader, synthetic_brain_pair
    from localdiffusion_tpu.models import SegUNet, bce_dice_loss, dice_loss

    if args.raw:
        t1, flair, seg = synthetic_brain_pair(
            64, size=args.size, tumor=True, seed=0)
        t1v, flairv, segv = synthetic_brain_pair(
            16, size=args.size, tumor=True, seed=1)
    else:
        # the inference pipeline feeds the seg detector (and the
        # seg_encoder PatchCore feature source) the NORMALIZED conditioning
        # image (ood/frontend.py:125-127, features.py preprocess='raw') —
        # train on that distribution
        from localdiffusion_tpu.data.synthetic import (
            synthetic_brain_translation,
        )

        norm = {}
        if args.config:
            from scripts.train import load_config

            d = load_config(args.config).data
            norm = dict(mean_t1=d.mean_t1, std_t1=d.std_t1,
                        mean_flair=d.mean_flair, std_flair=d.std_flair)
        _, t1, seg = synthetic_brain_translation(
            64, args.size, tumor=True, seed=0, **norm)
        _, t1v, segv = synthetic_brain_translation(
            16, args.size, tumor=True, seed=1, **norm)
    seg = (seg > 0).astype(np.float32)
    segv = (segv > 0).astype(np.float32)

    model = SegUNet()
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, args.size, args.size, 1)))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)
            return bce_dice_loss(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def val_dice(params, x, y):
        logits = model.apply(params, x)
        probs = jax.nn.sigmoid(logits)
        pred = (probs > 0.5).astype(jnp.float32)
        num = 2 * jnp.sum(pred * y)
        den = jnp.sum(pred) + jnp.sum(y)
        return num / jnp.maximum(den, 1.0)

    dl = ArrayLoader(t1, seg, batch_size=args.batch, seed=42)
    best = -1.0
    logs = []
    for epoch in range(args.epochs):
        tot = 0.0
        n = 0
        for x, y in dl.epoch_batches(epoch):
            params, opt_state, loss = step(params, opt_state, jnp.asarray(x), jnp.asarray(y))
            tot += float(loss)
            n += 1
        d = float(val_dice(params, jnp.asarray(t1v), jnp.asarray(segv)))
        logs.append((epoch, tot / n, d))
        print(f"epoch {epoch}: loss {tot / n:.4f} val dice {d:.4f}")
        if d > best:
            best = d
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.abspath(args.out), jax.device_get(params), force=True)
            ckptr.wait_until_finished()
    import pandas as pd

    pd.DataFrame(logs, columns=["epoch", "loss", "val_dice"]).to_csv(
        os.path.join(os.path.dirname(args.out), "val.csv"), index=False
    )
    print(f"best dice {best:.4f}")


if __name__ == "__main__":
    main()
