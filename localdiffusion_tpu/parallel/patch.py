"""Patch-parallel local diffusion: tile → sample-per-patch → overlap-stitch.

The reference's local-diffusion mechanism partitions ONE image into IND/OOD
regions (reference ddpm.py:677-689) and runs the two branches sequentially.
This module generalizes that partitioning into the mesh-scale axis
(BASELINE.json config 5): a large image (or a stack of volumes) is tiled
into overlapping patches, every patch runs the full branched sampler as one
big batch sharded over the ('data','patch') mesh axes, and the results are
stitched with overlap feathering — gather/scatter, not ring attention
(SURVEY.md §5.7).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class PatchGrid:
    """Static tiling geometry."""

    image_hw: Tuple[int, int]
    patch: int
    stride: int  # patch - overlap
    origins: Tuple[Tuple[int, int], ...]  # (y, x) top-left corners

    @property
    def num_patches(self) -> int:
        return len(self.origins)


def plan_patches(h: int, w: int, patch: int, overlap: int = 0) -> PatchGrid:
    """Cover [h, w] with patches of size `patch`, stepping patch-overlap;
    the last row/column is clamped to the border (full coverage, static)."""
    assert patch <= h and patch <= w
    stride = patch - overlap
    assert stride > 0

    def starts(dim):
        s = list(range(0, dim - patch + 1, stride))
        if s[-1] != dim - patch:
            s.append(dim - patch)
        return s

    origins = tuple((y, x) for y in starts(h) for x in starts(w))
    return PatchGrid((h, w), patch, stride, origins)


def extract_patches(img: jnp.ndarray, grid: PatchGrid) -> jnp.ndarray:
    """[B, H, W, C] → [B·P, p, p, C] (patch-major within each image)."""
    p = grid.patch
    parts = [
        jax.lax.dynamic_slice(
            img, (0, y, x, 0), (img.shape[0], p, p, img.shape[-1])
        )
        for (y, x) in grid.origins
    ]
    stacked = jnp.stack(parts, axis=1)  # [B, P, p, p, C]
    return stacked.reshape(-1, p, p, img.shape[-1])


def _feather_weight(patch: int, overlap: int) -> np.ndarray:
    """Separable linear ramp over the overlap margin (1 in the interior)."""
    w1 = np.ones(patch, np.float32)
    if overlap > 0:
        ramp = (np.arange(1, overlap + 1, dtype=np.float32)) / (overlap + 1)
        w1[:overlap] = ramp
        w1[-overlap:] = ramp[::-1]
    return np.outer(w1, w1)


def stitch_patches(
    patches: jnp.ndarray, grid: PatchGrid, batch: int, overlap: int = 0
) -> jnp.ndarray:
    """[B·P, p, p, C] → [B, H, W, C] with overlap feathering (scatter-add)."""
    p = grid.patch
    h, w = grid.image_hw
    c = patches.shape[-1]
    pp = patches.reshape(batch, grid.num_patches, p, p, c)
    weight = jnp.asarray(_feather_weight(p, overlap))[None, :, :, None]

    out = jnp.zeros((batch, h, w, c), patches.dtype)
    norm = jnp.zeros((batch, h, w, 1), jnp.float32)
    for i, (y, x) in enumerate(grid.origins):
        out = jax.lax.dynamic_update_slice(
            out,
            jax.lax.dynamic_slice(out, (0, y, x, 0), (batch, p, p, c))
            + pp[:, i] * weight,
            (0, y, x, 0),
        )
        norm = jax.lax.dynamic_update_slice(
            norm,
            jax.lax.dynamic_slice(norm, (0, y, x, 0), (batch, p, p, 1)) + weight,
            (0, y, x, 0),
        )
    return out / jnp.maximum(norm, 1e-8)


def patch_parallel_sample(
    gd,
    params,
    cond: jnp.ndarray,
    mask: jnp.ndarray,
    key,
    scfg,
    min_max_val,
    patch: int,
    overlap: int = 0,
    mesh=None,
    _cache: dict = None,
):
    """Branched local diffusion over a tiled batch of patches.

    cond/mask: [B, H, W, C] at full resolution; every patch becomes an
    independent chain in one [B·P] batch (sharded over the mesh when given),
    so the reference's per-image sequential loop (test.py:190) becomes one
    compiled SPMD program.

    Patches whose mask tile is uniformly one run the same branched program
    (their OOD branch sees empty conditioning, and fusion reduces to the IND
    estimate) — keeping the batch shape static for XLA.
    """
    from localdiffusion_tpu.diffusion import sampler as S

    b, h, w, c = cond.shape
    grid = plan_patches(h, w, patch, overlap)

    # patch sampling runs at the patch resolution
    import copy

    gd_patch = copy.copy(gd)
    gd_patch.image_size = patch

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        flat_sharding = NamedSharding(mesh, P(("data", "patch")))
    else:
        flat_sharding = None

    def run(params, cond, mask, key):
        # extract → sample-all-patches → stitch, all in ONE compiled program
        # (per-op dispatch around the sampler would dominate wall time on
        # latency-bound links)
        cond_p = extract_patches(cond, grid)
        mask_p = extract_patches(mask, grid)
        if flat_sharding is not None:
            # the [B·P] patch batch is the parallel axis — spread it over
            # the whole mesh regardless of the input batch size
            cond_p = jax.lax.with_sharding_constraint(cond_p, flat_sharding)
            mask_p = jax.lax.with_sharding_constraint(mask_p, flat_sharding)
        if gd_patch.is_ddim_sampling:
            out_p = S.ddim_sample_branched(
                gd_patch, params, cond_p, mask_p, key, scfg, min_max_val
            )
        else:
            out_p = S.ddpm_sample_branched(
                gd_patch, params, cond_p, mask_p, key, scfg, min_max_val
            )
        return stitch_patches(out_p, grid, b, overlap)

    # cache the jitted program (pass `_cache` to avoid RE-TRACING the whole
    # T-step scan on every call — tracing costs seconds at 256px)
    cache = _cache if _cache is not None else {}
    ck = ("patch_parallel", b, h, w, c, patch, overlap, mesh is None)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        with mesh:
            if ck not in cache:
                cache[ck] = jax.jit(run, in_shardings=(rep, rep, rep, None))
            return cache[ck](params, jnp.asarray(cond), jnp.asarray(mask), key)
    if ck not in cache:
        cache[ck] = jax.jit(run)
    return cache[ck](params, jnp.asarray(cond), jnp.asarray(mask), key)


def _extract_patches_np(img: np.ndarray, grid: PatchGrid) -> np.ndarray:
    """Host-side patch extraction, same [B·P] ordering as extract_patches."""
    p = grid.patch
    parts = [img[:, y : y + p, x : x + p, :] for (y, x) in grid.origins]
    return np.stack(parts, axis=1).reshape(-1, p, p, img.shape[-1])


def patch_parallel_sample_bucketed(
    gd,
    params,
    cond: np.ndarray,
    mask: np.ndarray,
    key,
    scfg,
    min_max_val,
    patch: int,
    overlap: int = 0,
    _cache: dict = None,
):
    """Sparse-mask bucketing: OOD-free patches skip the branched program.

    Generalizes the reference's whole-image uniform-mask bypass
    (ddpm.py:1110-1117) to per-patch granularity: a patch whose mask tile
    contains no OOD pixel (binary mask ≥ 1.0 nowhere) runs the PLAIN chain —
    one UNet call per step instead of the branched pair's two — so a 256px
    image with a small OOD region costs roughly half the branched compute.

    Bucketing is data-dependent, so it happens HOST-side before launch
    (mask must be a host array) and costs one extra compile per distinct
    (n_plain, n_branched) bucket-size pair; pass `_cache` (a dict) to reuse
    compiled buckets across calls.

    Semantics: an OOD-free patch's branched chain degenerates to its IND
    branch — cond_in = cond·clip(1−0, floor, 1) = cond, and fusion selects
    the IND state everywhere — i.e. exactly the plain chain (modulo the
    noise-draw layout).  Verified against the unbucketed program by oracle
    test (tests/test_patch_parallel.py).

    Both buckets + the stitch run inside ONE jitted program (static gather
    by the host-chosen indices, scatter back, feather-stitch) — separate
    per-bucket dispatches measured ~0.7 s of overhead per call over a
    high-latency link.
    """
    from localdiffusion_tpu.diffusion import sampler as S

    b, h, w, c = cond.shape
    grid = plan_patches(h, w, patch, overlap)
    mask_np = np.asarray(mask, np.float32)
    mask_flat = _extract_patches_np(mask_np, grid)

    n = mask_flat.shape[0]
    has_ood = (mask_flat >= 1.0).reshape(n, -1).any(axis=1)
    ood_idx = tuple(int(i) for i in np.nonzero(has_ood)[0])
    plain_idx = tuple(int(i) for i in np.nonzero(~has_ood)[0])

    import copy

    gd_patch = copy.copy(gd)
    gd_patch.image_size = patch
    cache = _cache if _cache is not None else {}
    ck = ("bucketed", b, h, w, c, patch, overlap, plain_idx, ood_idx)

    if ck not in cache:

        def run(params, cond, mask, k):
            cond_p = extract_patches(cond, grid)
            mask_p = extract_patches(mask, grid)
            kp, ko = jax.random.split(k)
            outs = jnp.zeros_like(cond_p)
            if plain_idx:
                pi = jnp.asarray(plain_idx)
                cp = jnp.take(cond_p, pi, axis=0)
                if gd_patch.is_ddim_sampling:
                    op = S.ddim_sample_plain(gd_patch, params, cp, kp, min_max_val)
                else:
                    op = S.ddpm_sample_plain(gd_patch, params, cp, kp, min_max_val)
                outs = outs.at[pi].set(op)
            if ood_idx:
                oi = jnp.asarray(ood_idx)
                co = jnp.take(cond_p, oi, axis=0)
                mo = jnp.take(mask_p, oi, axis=0)
                if gd_patch.is_ddim_sampling:
                    oo = S.ddim_sample_branched(
                        gd_patch, params, co, mo, ko, scfg, min_max_val
                    )
                else:
                    oo = S.ddpm_sample_branched(
                        gd_patch, params, co, mo, ko, scfg, min_max_val
                    )
                outs = outs.at[oi].set(oo)
            return stitch_patches(outs, grid, b, overlap)

        cache[ck] = jax.jit(run)

    return np.asarray(
        cache[ck](params, jnp.asarray(cond, jnp.float32),
                  jnp.asarray(mask, jnp.float32), key)
    )
