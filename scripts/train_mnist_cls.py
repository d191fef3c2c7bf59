#!/usr/bin/env python
"""Train the MNIST evaluation classifier (reference train_mnist_cls.py).

SimpleCNN, CrossEntropy, Adam 1e-3, best-accuracy checkpoint + loss CSV
(reference train_mnist_cls.py:73-119).
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
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out", default="results/mnist_cls/best")
    args = ap.parse_args()

    from localdiffusion_tpu.data import (
        ArrayLoader,
        MNISTDataset,
        load_mnist_arrays,
        synthetic_digits,
    )
    from localdiffusion_tpu.models import SimpleCNN

    try:
        imgs, labels = load_mnist_arrays(
            "/root/reference/MNIST/raw/t10k-images-idx3-ubyte",
            "/root/reference/MNIST/raw/t10k-labels-idx1-ubyte",
        )
    except (FileNotFoundError, OSError):
        imgs, labels = synthetic_digits(2048, seed=0)
    ds = MNISTDataset(imgs, labels)
    hr, _, y = ds.as_arrays()
    split = int(0.9 * len(hr))
    xtr, ytr, xte, yte = hr[:split], y[:split], hr[split:], y[split:]

    model = SimpleCNN()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def acc(params, x, y):
        logits = model.apply(params, x)
        return jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))

    dl = ArrayLoader(xtr, ytr, batch_size=args.batch, seed=42)
    best = 0.0
    logs = []
    for epoch in range(args.epochs):
        tot, n = 0.0, 0
        for x, yb in dl.epoch_batches(epoch):
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x), jnp.asarray(yb)
            )
            tot += float(loss)
            n += 1
        a = float(acc(params, jnp.asarray(xte), jnp.asarray(yte)))
        logs.append((epoch, tot / n, a))
        print(f"epoch {epoch}: loss {tot / n:.4f} test acc {a:.4f}")
        if a > best:
            best = a
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.abspath(args.out), jax.device_get(params), force=True)
            ckptr.wait_until_finished()
    import pandas as pd

    pd.DataFrame(logs, columns=["epoch", "loss", "test_acc"]).to_csv(
        os.path.join(os.path.dirname(args.out), "cls_loss.csv"), index=False
    )
    print(f"best acc {best:.4f}")


if __name__ == "__main__":
    main()
