"""PatchCore OOD detector — embeddings, coreset, NN search, anomaly maps.

TPU-native equivalent of reference models.py:42-254 (PatchcoreModel) and the
memory-bank builder anomaly_model_train.py:252-385.  All hot paths are MXU
matmuls:

  * pairwise L2 via |x|² − 2x·yᵀ + |y|² (the reference's euclidean_dist,
    models.py:178-198) — one big matmul against the memory bank,
  * k-center-greedy coreset as a jit fori_loop over max-min distances on
    random-projected features (anomalib KCenterGreedy equivalent),
  * anomaly map = bilinear upsample + separable gaussian blur σ=4
    (anomalib AnomalyMapGenerator, consumed at models.py:123).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from localdiffusion_tpu.config import OODConfig
from localdiffusion_tpu.ood.wide_resnet import convert_torch_state_dict
from localdiffusion_tpu.ops.resize import gaussian_blur, resize_bilinear


def avg_pool_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(3, 1, 1) feature smoothing (reference models.py:69)."""
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    window = jax.lax.reduce_window(
        pad, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    )
    return window / 9.0


def generate_embedding(feats: Dict[str, jnp.ndarray], layers) -> jnp.ndarray:
    """Align deeper layers to the shallowest and concat channels
    (reference models.py:129-146)."""
    emb = feats[layers[0]]
    h, w = emb.shape[1:3]
    parts = [emb]
    for layer in layers[1:]:
        parts.append(resize_bilinear(feats[layer], (h, w)))
    return jnp.concatenate(parts, axis=-1)


def reshape_embedding(embedding: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] → [B·H·W, C] (reference models.py:148-163)."""
    return embedding.reshape(-1, embedding.shape[-1])


def euclidean_dist_sq(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared pairwise distances via the matmul identity (models.py:178-198)."""
    x_norm = jnp.sum(x * x, axis=-1, keepdims=True)
    y_norm = jnp.sum(y * y, axis=-1, keepdims=True)
    res = x_norm - 2.0 * jnp.dot(
        x, y.T, preferred_element_type=jnp.float32
    ) + y_norm.T
    return jnp.maximum(res, 0.0)


def euclidean_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(euclidean_dist_sq(x, y))


def nearest_neighbors(
    embedding: jnp.ndarray, memory_bank: jnp.ndarray, n_neighbors: int = 1
):
    """Brute-force NN via one matmul (reference models.py:200-217)."""
    distances = euclidean_dist(embedding, memory_bank)
    if n_neighbors == 1:
        locations = jnp.argmin(distances, axis=1)
        patch_scores = jnp.take_along_axis(
            distances, locations[:, None], axis=1
        )[:, 0]
        return patch_scores, locations
    neg_scores, locations = jax.lax.top_k(-distances, n_neighbors)
    return -neg_scores, locations


def compute_anomaly_score(
    patch_scores: jnp.ndarray,  # [B, P]
    locations: jnp.ndarray,  # [B, P]
    embedding: jnp.ndarray,  # [B·P, C]
    memory_bank: jnp.ndarray,
    num_neighbors: int = 9,
) -> jnp.ndarray:
    """Image score with neighborhood reweighting (reference models.py:219-254)."""
    if num_neighbors == 1:
        return jnp.max(patch_scores, axis=1)
    b, p = patch_scores.shape
    max_patches = jnp.argmax(patch_scores, axis=1)  # [B]
    emb = embedding.reshape(b, p, -1)
    max_feats = jnp.take_along_axis(emb, max_patches[:, None, None], axis=1)[:, 0]
    score = jnp.take_along_axis(patch_scores, max_patches[:, None], axis=1)[:, 0]
    nn_index = jnp.take_along_axis(locations, max_patches[:, None], axis=1)[:, 0]
    nn_sample = memory_bank[nn_index]  # [B, C]
    k = min(num_neighbors, memory_bank.shape[0])
    _, support = nearest_neighbors(nn_sample, memory_bank, n_neighbors=k)  # [B, k]
    support_feats = memory_bank[support]  # [B, k, C]
    d = jnp.sqrt(
        jnp.maximum(
            jnp.sum((max_feats[:, None, :] - support_feats) ** 2, axis=-1), 0.0
        )
    )  # [B, k]
    weights = (1.0 - jax.nn.softmax(d, axis=1))[:, 0]
    return weights * score


def anomaly_map_from_scores(
    patch_scores: jnp.ndarray,  # [B, H, W, 1]
    image_size: Tuple[int, int],
    sigma: float = 4.0,
) -> jnp.ndarray:
    """Upsample + gaussian blur (anomalib AnomalyMapGenerator equivalent)."""
    up = resize_bilinear(patch_scores, image_size)
    return gaussian_blur(up, sigma=sigma, kernel_size=2 * int(4.0 * sigma) + 1)


# ---------------------------------------------------------------------------
# coreset subsampling (anomalib KCenterGreedy equivalent)
# ---------------------------------------------------------------------------

def kcenter_greedy_indices(
    embedding: jnp.ndarray, k: int, key, proj_dim: int = 128
) -> jnp.ndarray:
    """Greedy k-center selection on randomly-projected features.

    Equivalent of anomalib's SparseRandomProjection + KCenterGreedy consumed
    at reference models.py:165-176; the selection loop is a jit fori_loop of
    max-min distance updates (each O(n·d) on the VPU).
    """
    n, d = embedding.shape
    if d > proj_dim:
        proj = jax.random.normal(key, (d, proj_dim), dtype=jnp.float32) / jnp.sqrt(
            jnp.asarray(proj_dim, jnp.float32)
        )
        feats = jnp.dot(embedding, proj, preferred_element_type=jnp.float32)
    else:
        feats = embedding.astype(jnp.float32)

    def dist_to(center):
        diff = feats - center[None, :]
        return jnp.sum(diff * diff, axis=-1)

    start = 0
    min_d = dist_to(feats[start])
    selected0 = jnp.zeros((k,), jnp.int32).at[0].set(start)

    def body(i, state):
        min_d, selected = state
        idx = jnp.argmax(min_d).astype(jnp.int32)
        selected = selected.at[i].set(idx)
        min_d = jnp.minimum(min_d, dist_to(feats[idx]))
        return min_d, selected

    _, selected = jax.lax.fori_loop(1, k, body, (min_d, selected0))
    return selected


def subsample_embedding(
    embedding: jnp.ndarray, sampling_ratio: float, key
) -> jnp.ndarray:
    """Coreset memory bank (reference models.py:165-176)."""
    k = max(1, int(embedding.shape[0] * sampling_ratio))
    idx = kcenter_greedy_indices(embedding, k, key)
    return embedding[idx]


# ---------------------------------------------------------------------------
# model wrapper
# ---------------------------------------------------------------------------

class PatchCore:
    """PatchCore bound to a feature source + memory bank.

    The feature extractor is pluggable (ood/features.py): the reference
    hard-wires ImageNet-pretrained WRN50-2 (models.py:62-72) — unavailable
    here — so in-env-trainable sources (trained seg-UNet encoder, trained
    denoiser activations) can substitute.  Default remains the WRN.

    train mode: `embed(x)` streams embeddings for the memory-bank builder
    (reference anomaly_model_train.py:353-376).
    test mode: `__call__(x)` → {'anomaly_map', 'pred_score'}
    (reference models.py:75-127).
    """

    def __init__(
        self,
        cfg: OODConfig,
        backbone_params=None,
        memory_bank: Optional[np.ndarray] = None,
        rng=None,
        source=None,
    ):
        self.cfg = cfg
        if source is None:
            from localdiffusion_tpu.ood.features import WRNFeatureSource

            if backbone_params is None and cfg.backbone_weights_path:
                backbone_params = load_backbone_weights(
                    cfg.backbone_weights_path
                )
            source = WRNFeatureSource(
                cfg.layers, params=backbone_params, rng=rng,
                input_size=cfg.input_size,
            )
        self.source = source
        self.layers = tuple(source.layers)
        self.input_size = (cfg.input_size, cfg.input_size)
        self.num_neighbors = cfg.num_neighbors
        # WRN compatibility surface (checkpoint converters)
        self.backbone = getattr(source, "backbone", None)
        self.backbone_params = getattr(source, "params", None)
        self.memory_bank = (
            jnp.asarray(memory_bank) if memory_bank is not None else None
        )
        self._embed_jit = jax.jit(self._embed)
        self._score_jit = None

    # -- embedding ----------------------------------------------------
    def _embed(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = self.source.apply(x)
        feats = {k: avg_pool_3x3(v) for k, v in feats.items()}
        return generate_embedding(feats, self.layers)

    def embed(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] → [B·P, C] patch embeddings (training mode)."""
        return reshape_embedding(self._embed_jit(jnp.asarray(x)))

    def build_memory_bank(
        self, batches, sampling_ratio: Optional[float] = None, key=None
    ) -> np.ndarray:
        """Stream batches → embeddings → coreset (anomaly_model_train.py:353-385)."""
        ratio = sampling_ratio if sampling_ratio is not None else self.cfg.coreset_ratio
        key = key if key is not None else jax.random.PRNGKey(0)
        embs = [np.asarray(self.embed(b)) for b in batches]
        embedding = jnp.asarray(np.concatenate(embs, axis=0))
        self.memory_bank = subsample_embedding(embedding, ratio, key)
        return np.asarray(self.memory_bank)

    # -- scoring ------------------------------------------------------
    def _score(self, x: jnp.ndarray, memory_bank: jnp.ndarray):
        emb_map = self._embed(x)
        b, h, w, c = emb_map.shape
        embedding = emb_map.reshape(-1, c)
        patch_scores, locations = nearest_neighbors(embedding, memory_bank, 1)
        patch_scores_b = patch_scores.reshape(b, -1)
        locations_b = locations.reshape(b, -1)
        pred_score = compute_anomaly_score(
            patch_scores_b, locations_b, embedding, memory_bank, self.num_neighbors
        )
        score_map = patch_scores_b.reshape(b, h, w, 1)
        anomaly_map = anomaly_map_from_scores(score_map, self.input_size)
        return anomaly_map, pred_score

    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        assert self.memory_bank is not None, "load or build a memory bank first"
        if self._score_jit is None:
            self._score_jit = jax.jit(self._score)
        anomaly_map, pred_score = self._score_jit(
            jnp.asarray(x), self.memory_bank
        )
        return {"anomaly_map": anomaly_map, "pred_score": pred_score}


def load_backbone_weights(path: str):
    """Load a torch wide_resnet50_2 checkpoint (state dict) → flax params."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_torch_state_dict(sd)
