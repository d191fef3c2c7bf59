"""SimpleCNN — MNIST digit classifier for downstream evaluation.

Equivalent of reference models.py:24-40: two conv+pool stages then two dense
layers, 10-way logits.  Used to evaluate whether a translated digit keeps its
class (e.g. is an 8→3 translation recognized as a 3) — reference
train_mnist_cls.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class SimpleCNN(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(32, (3, 3), padding=1, name="conv1")(x)
        x = nn.max_pool(nn.relu(x), (2, 2), strides=(2, 2))
        x = nn.Conv(64, (3, 3), padding=1, name="conv2")(x)
        x = nn.max_pool(nn.relu(x), (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, name="fc1")(x))
        return nn.Dense(self.num_classes, name="fc2")(x)
