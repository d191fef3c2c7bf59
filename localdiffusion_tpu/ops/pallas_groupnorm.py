"""Pallas TPU fused GroupNorm + FiLM + SiLU kernel.

The denoiser's Block is conv3×3 → GroupNorm(8) → x·(scale+1)+shift → SiLU
(reference ddpm.py:170-186).  The conv runs on the MXU via XLA; this kernel
fuses the remaining bandwidth-bound chain — two reduction passes + the
normalize/modulate/activate elementwise pass — into a single VMEM-resident
kernel per batch row, reading x from HBM once.

Gradients: custom_vjp recomputes through the XLA reference (cheap,
elementwise + small reductions).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def groupnorm_film_silu_reference(x, gamma, beta, scale, shift, groups, eps=1e-5):
    """XLA reference: GroupNorm (flax convention) + FiLM + SiLU.

    x: [B, H, W, C]; gamma/beta: [C]; scale/shift: [B, C] or None.
    """
    b, h, w, c = x.shape
    cg = c // groups
    xg = x.reshape(b, h * w, groups, cg).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(1, 3), keepdims=True)
    normed = (xg - mean) * jax.lax.rsqrt(var + eps)
    normed = normed.reshape(b, h, w, c)
    y = normed * gamma + beta
    if scale is not None:
        y = y * (scale[:, None, None, :] + 1.0) + shift[:, None, None, :]
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def groupnorm_film_silu_xla_fast(x, gamma, beta, scale, shift, groups, eps=1e-5):
    """Reshape-free large-block GN: per-channel sum/sumsq ([B, C], ONE pass
    over x), group moments from a tiny [B, G, C/G] fold, one normalize pass.

    The naive formulation (groupnorm_film_silu_reference) reshapes x to 5-D
    and reduces (x − mean)² in a second full pass; at 256px the reshape
    forces layout copies and the two stats passes showed up as 23% of the
    branched chain's device time (convert_reduce_fusion) plus a large share
    of its 23% copy time.  Channel-wise sums need no reshape of x at all —
    the group fold happens on [B, C].  Variance via E[x²] − E[x]² in f32
    (activations are O(1) post-norm/conv, so catastrophic cancellation is
    not a concern at these scales; clamped at 0 for safety).
    """
    b, h, w, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=(1, 2))  # [B, C]
    ss = jnp.sum(xf * xf, axis=(1, 2))  # [B, C]
    n = jnp.float32(h * w * cg)
    gs = jnp.sum(s.reshape(b, groups, cg), axis=-1)  # [B, G]
    gss = jnp.sum(ss.reshape(b, groups, cg), axis=-1)
    mean = gs / n
    var = jnp.maximum(gss / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, axis=1)[:, None, None, :]
    inv_c = jnp.repeat(inv, cg, axis=1)[:, None, None, :]
    y = (xf - mean_c) * inv_c * gamma + beta
    if scale is not None:
        y = y * (scale[:, None, None, :] + 1.0) + shift[:, None, None, :]
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def _gn_kernel(x_ref, gamma_ref, beta_ref, scale_ref, shift_ref, o_ref,
               *, groups: int, eps: float, film: bool):
    """Group statistics via a one-hot [C, G] matmul — no lane-crossing
    reshapes (Mosaic-friendly), reductions ride the MXU."""
    x = x_ref[0].astype(jnp.float32)  # [HW, C]
    hw, c = x.shape
    cg = c // groups

    # onehot[c, g] = 1 iff channel c belongs to group g (trace-time constant)
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    onehot = (ch_ids // cg == g_ids).astype(jnp.float32)  # [C, G]

    # per-channel column sums, then group-reduce through the onehot matmul
    col_sum = jnp.sum(x, axis=0, keepdims=True)  # [1, C]
    col_sumsq = jnp.sum(x * x, axis=0, keepdims=True)  # [1, C]
    denom = jnp.float32(hw * cg)
    g_mean = jax.lax.dot_general(
        col_sum, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / denom  # [1, G]
    g_meansq = jax.lax.dot_general(
        col_sumsq, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / denom
    g_var = g_meansq - g_mean * g_mean

    # broadcast group stats back to channels: [1, G] @ [G, C]
    mean_c = jax.lax.dot_general(
        g_mean, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, C]
    var_c = jax.lax.dot_general(
        g_var, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    normed = (x - mean_c) * jax.lax.rsqrt(var_c + eps)
    y = normed * gamma_ref[:] + beta_ref[:]
    if film:
        i = pl.program_id(0)
        y = y * (scale_ref[pl.ds(i, 1), :] + 1.0) + shift_ref[pl.ds(i, 1), :]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _gn_fwd_impl(x, gamma, beta, scale, shift, groups, eps, interpret=False):
    b, h, w, c = x.shape
    hw = h * w
    film = scale is not None
    xf = x.reshape(b, hw, c)
    if not film:
        scale = jnp.zeros((b, c), jnp.float32)
        shift = jnp.zeros((b, c), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, film=film),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            # full [B, C] resident; the kernel picks its row by program_id
            # (a (1, C) row block violates Mosaic's (8, 128) tiling rule)
            pl.BlockSpec((b, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * hw * c,
            bytes_accessed=2 * b * hw * c * 4,
            transcendentals=b * hw * c,
        ),
        interpret=interpret,
    )(xf, gamma.astype(jnp.float32), beta.astype(jnp.float32),
      scale.astype(jnp.float32), shift.astype(jnp.float32))
    return out.reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _gn_film_silu(x, gamma, beta, scale, shift, groups, eps, interpret=False):
    return _gn_fwd_impl(x, gamma, beta, scale, shift, groups, eps, interpret)


def _gn_vjp_fwd(x, gamma, beta, scale, shift, groups, eps, interpret=False):
    return (
        _gn_fwd_impl(x, gamma, beta, scale, shift, groups, eps, interpret),
        (x, gamma, beta, scale, shift),
    )


def _gn_vjp_bwd(groups, eps, interpret, res, g):
    x, gamma, beta, scale, shift = res
    film = scale is not None

    if film:
        _, vjp = jax.vjp(
            lambda x, gamma, beta, scale, shift: groupnorm_film_silu_reference(
                x, gamma, beta, scale, shift, groups, eps
            ),
            x, gamma, beta, scale, shift,
        )
        return vjp(g)
    _, vjp = jax.vjp(
        lambda x, gamma, beta: groupnorm_film_silu_reference(
            x, gamma, beta, None, None, groups, eps
        ),
        x, gamma, beta,
    )
    dx, dgamma, dbeta = vjp(g)
    return dx, dgamma, dbeta, None, None


_gn_film_silu.defvjp(_gn_vjp_fwd, _gn_vjp_bwd)


# per-batch-row block must fit VMEM (~16 MB/core) including Mosaic's kernel
# intermediates (~16× the block: normed/modulated/activated temporaries) —
# measured: a 2 MB block hit a 32 MB scoped-vmem stack.  Larger blocks route
# to the XLA-fused reference, which tiles internally.
_MAX_VMEM_BLOCK_BYTES = 512 * 1024


def groupnorm_film_silu(
    x, gamma, beta, scale=None, shift=None, groups=8, eps=1e-5, interpret=None
):
    """Fused GroupNorm+FiLM+SiLU: Pallas on TPU, XLA reference elsewhere.

    `interpret=True` forces the Pallas interpreter (CPU parity tests).
    Large spatial blocks (256px high-res stages) exceed the single-row VMEM
    budget and route to the XLA reference.
    """
    b, h, w, c = x.shape
    block_bytes = h * w * c * 4
    # LOCALDIFF_FUSED_GN=0 forces the XLA path even on the TPU backend —
    # bench.py's analytic-FLOP lowering retargets the DEFAULT-tpu process
    # at a CPU client, where any pallas_call fails to lower (read at trace
    # time; every jit re-traces, so no caching here).
    gn_enabled = os.environ.get("LOCALDIFF_FUSED_GN", "1") != "0"
    on_tpu = gn_enabled and jax.default_backend() == "tpu"
    if interpret or (on_tpu and block_bytes <= _MAX_VMEM_BLOCK_BYTES):
        return _gn_film_silu(
            x, gamma, beta, scale, shift, groups, eps, bool(interpret)
        )
    # Large spatial blocks route to the reshape-free XLA formulation (the
    # tiled two-pass Pallas variant below is correct but measured SLOWER
    # on-chip, 573 vs 436 us at [8,128,128,32] — kept with tests as kernel
    # infrastructure; the naive 5-D-reshape reference is kept as the test
    # oracle).
    return groupnorm_film_silu_xla_fast(x, gamma, beta, scale, shift, groups, eps)


# ---------------------------------------------------------------------------
# tiled two-pass variant for large spatial blocks (256px stages)
# ---------------------------------------------------------------------------

def _stats_kernel(x_ref, o_ref):
    """Accumulate per-channel [sum; sumsq] across HW tiles of one batch row.

    Output block [1, 2, C] is revisited across the tile grid dimension —
    Mosaic executes grid steps sequentially per core, so accumulation into
    the same output block is the standard reduction pattern.
    """
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # [TILE, C]
    part = jnp.stack([jnp.sum(x, axis=0), jnp.sum(x * x, axis=0)])  # [2, C]

    @pl.when(j == 0)
    def _():
        o_ref[0] = part

    @pl.when(j > 0)
    def _():
        o_ref[0] = o_ref[0] + part


def _apply_kernel(x_ref, mean_ref, inv_ref, gamma_ref, beta_ref,
                  scale_ref, shift_ref, o_ref, *, film: bool):
    i = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)
    y = (x - mean_ref[pl.ds(i, 1), :]) * inv_ref[pl.ds(i, 1), :]
    y = y * gamma_ref[:] + beta_ref[:]
    if film:
        y = y * (scale_ref[pl.ds(i, 1), :] + 1.0) + shift_ref[pl.ds(i, 1), :]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _pick_tile(hw: int, c: int, budget: int = _MAX_VMEM_BLOCK_BYTES) -> int:
    max_rows = max(8, budget // (c * 4))
    t = 1
    for d in range(1, hw + 1):
        if hw % d == 0 and d <= max_rows:
            t = d
    return t


def _gn_tiled_impl(x, gamma, beta, scale, shift, groups, eps, interpret=False):
    b, h, w, c = x.shape
    hw = h * w
    film = scale is not None
    xf = x.reshape(b, hw, c)
    tile = _pick_tile(hw, c)
    nt = hw // tile

    stats = pl.pallas_call(
        _stats_kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        interpret=interpret,
    )(xf)

    # group reduction of the per-channel stats (tiny, XLA)
    cg = c // groups
    s = stats[:, 0].reshape(b, groups, cg).sum(-1)  # [B, G]
    ss = stats[:, 1].reshape(b, groups, cg).sum(-1)
    denom = float(hw * cg)
    g_mean = s / denom
    g_var = ss / denom - g_mean**2
    mean_c = jnp.repeat(g_mean, cg, axis=-1)  # [B, C]
    inv_c = jax.lax.rsqrt(jnp.repeat(g_var, cg, axis=-1) + eps)

    if not film:
        scale = jnp.zeros((b, c), jnp.float32)
        shift = jnp.zeros((b, c), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_apply_kernel, film=film),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=interpret,
    )(xf, mean_c, inv_c, gamma.astype(jnp.float32), beta.astype(jnp.float32),
      scale.astype(jnp.float32), shift.astype(jnp.float32))
    return out.reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _gn_tiled(x, gamma, beta, scale, shift, groups, eps, interpret=False):
    return _gn_tiled_impl(x, gamma, beta, scale, shift, groups, eps, interpret)


def _gn_tiled_fwd(x, gamma, beta, scale, shift, groups, eps, interpret=False):
    return (
        _gn_tiled_impl(x, gamma, beta, scale, shift, groups, eps, interpret),
        (x, gamma, beta, scale, shift),
    )


_gn_tiled.defvjp(_gn_tiled_fwd, _gn_vjp_bwd)
