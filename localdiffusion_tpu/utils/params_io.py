"""Slim parameter snapshots: a flax param pytree ⇄ one .npz file.

Orbax checkpoints (train/trainer.py) carry step/opt/ema state and weigh
~15× the params; for shipping an inference-ready model (e.g. keeping a
trained 256px flagship in-repo across build rounds) a single npz of the
EMA params is enough.  bf16 storage is quality-identical for inference on
the trained flagship (docs/PERFORMANCE.md).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

_SEP = "/"


def save_params_npz(path: str, params: Any, dtype=np.float16) -> None:
    """Flatten a param pytree by key path into one compressed npz.

    dtype: storage dtype (fp16 default: exact round-trip through the f32
    values' 10-bit mantissa loses less than bf16's 7-bit; both tested).
    """
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _SEP.join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )
        flat[key] = np.asarray(leaf).astype(dtype)
    np.savez_compressed(path, **flat)


def load_params_npz(path: str, template: Any) -> Any:
    """Restore a pytree saved by save_params_npz into `template`'s structure
    (e.g. from model.init), casting back to each template leaf's dtype."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for kp, leaf in leaves:
        key = _SEP.join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )
        if key not in data:
            raise KeyError(f"param {key} missing from {path}")
        arr = data[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {key}: {arr.shape} vs {np.shape(leaf)}"
            )
        # leaf.dtype, not np.asarray(leaf).dtype: template leaves may be
        # ShapeDtypeStructs or arrays sharded across processes, where
        # materializing the values is impossible — only shape/dtype needed
        dtype = getattr(leaf, "dtype", None) or np.asarray(leaf).dtype
        out.append(np.asarray(arr, dtype=dtype))
    return jax.tree_util.tree_unflatten(treedef, out)
