"""Local-diffusion sampling as jit-compiled lax.scan programs.

The reference sampler is a Python loop over T with a mutable config-flag
state machine and constant CPU↔GPU mask ping-pong (reference ddpm.py:
929-1125).  Here the structure is static and fully device-resident:

  phase A (branched): t ∈ [T-1 .. s+1]   — OOD and IND branches advanced
          together as ONE batched UNet call over a leading branch axis
          (vs. two sequential calls, ddpm.py:694-695), shared per-step noise
          (ddpm.py:852-854).
  fusion at t = s = start_timestep        — x_start and noisy states fused
          via the binary mask (ddpm.py:779-810).
  phase B (fused): t ∈ [s-1 .. 0]         — single chain; with the
          classifier gate enabled, each step may reject the fused estimate
          and re-branch from the saved pair (ddpm.py:874-927), expressed as
          a jnp.where over both candidate steps inside the scan.

Condition features are encoded ONCE per chain and reused for all T steps
(the conditioning image is constant across the reverse process; the
reference re-encodes it every UNet forward, ddpm.py:434).

DDIM (ddpm.py:979-1075) follows the same phase structure over the strided
time pairs.
"""

from __future__ import annotations

import dataclasses

import numpy as np
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from localdiffusion_tpu.config import SamplerConfig
from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
from localdiffusion_tpu.ops import diffusion_math as dm


def reconcile(scfg: SamplerConfig) -> SamplerConfig:
    """Per-call flag reconciliation (reference ddpm.py:1106-1108).

    A detector-driven (`ood_AD`) or confidence-driven (`ood_confidence`) run
    forces `mask_cond` and `mask_x` on in the reference, so the fusion
    algebra `x_start = xs_in·(1-m) + xs_out` always sees a mask_x-masked OOD
    branch.  Without this a config with `mask_x: false` plus branching would
    add the *unmasked* OOD-branch estimate over the whole image.  Applied at
    the top of every branched sampling program.
    """
    if (scfg.ood_ad or scfg.ood_confidence) and not (scfg.mask_x and scfg.mask_cond):
        scfg = dataclasses.replace(scfg, mask_x=True, mask_cond=True)
    return scfg


# ---------------------------------------------------------------------------
# mask algebra (reference ddpm.py:672-689)
# ---------------------------------------------------------------------------

def binarize_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """OOD-region binary mask: mask >= 1.0 (reference ddpm.py:672)."""
    return (mask >= 1.0).astype(jnp.float32)


def partition_cond(
    cond: jnp.ndarray, binary_mask: jnp.ndarray, cond_in_floor: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split the conditioning image into OOD / IND views.

    cond_out = cond·mask; cond_in = cond·clip(1-mask, floor, 1) — the IND
    branch keeps "some information" about the OOD region (ddpm.py:677-689).
    """
    cond_out = cond * binary_mask
    mask2 = jnp.clip(1.0 - binary_mask, cond_in_floor, 1.0)
    cond_in = cond * mask2
    return cond_out, cond_in


def apply_mask_x(
    model_output_out: jnp.ndarray,
    binary_mask: jnp.ndarray,
    cond_out: jnp.ndarray,
    min_val: float,
    policy: str,
) -> jnp.ndarray:
    """OOD-branch output policy under mask_x (reference ddpm.py:697-708).

    'minval' (mri): model output inside the mask, min_val outside.
    'cond'   (mnist/mvtec/oct/imagenet): replaced by the masked cond image.
    """
    if policy == "cond":
        return cond_out
    out = model_output_out * binary_mask
    return jnp.where(binary_mask == 0.0, jnp.float32(min_val), out)


def fuse_noisy_states(
    x_out_masked: jnp.ndarray,
    x_in_masked: jnp.ndarray,
    binary_mask: jnp.ndarray,
    route: str,
) -> jnp.ndarray:
    """Merge masked branch states into one chain state.

    'zero_sentinel' reproduces the reference exactly:
    where(x_out == 0, x_in, x_out) (ddpm.py:797, 1035) — brittle when a
    genuinely-zero pixel sits inside the mask.  'mask' routes by the mask.
    """
    if route == "zero_sentinel":
        return jnp.where(x_out_masked == 0.0, x_in_masked, x_out_masked)
    return jnp.where(binary_mask > 0.0, x_out_masked, x_in_masked)


# ---------------------------------------------------------------------------
# sampling programs
# ---------------------------------------------------------------------------

# (x_start, t) -> score per batch; accept where score > 0 (ddpm.py:888).
# t is the current scan timestep (traced scalar) — production gates ignore
# it; test oracles use it to script per-step verdicts.
ClassifierFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _maybe_unnorm(gd: GaussianDiffusion, x):
    """Unnormalize sampler output back to [0,1] when auto_normalize is on.

    The reference ends every sample path with `self.unnormalize(ret)`
    (ddpm.py:619-620, 972, 1074) — the inverse of the [0,1]→[-1,1]
    normalization its loss applies.  Applied at every sampler exit so
    auto_normalize never skews train/sample ranges (all shipped configs use
    auto_normalize=False, matching the reference's own setting)."""
    if x is None or not gd.diff_cfg.auto_normalize:
        return x
    from localdiffusion_tpu.ops.diffusion_math import unnormalize_to_zero_to_one

    return unnormalize_to_zero_to_one(x)


def _noise_like(key, x, t):
    """Per-step noise, zeroed at t == 0 (reference ddpm.py:852, 857)."""
    n = jax.random.normal(key, x.shape, dtype=x.dtype)
    return jnp.where(t > 0, n, jnp.zeros_like(n))


def _noise_like_shape(key, shape, t):
    """_noise_like drawing by explicit shape (same stream for equal shape)."""
    n = jax.random.normal(key, shape, dtype=jnp.float32)
    return jnp.where(t > 0, n, jnp.zeros_like(n))


def ddpm_sample_plain(
    gd: GaussianDiffusion,
    params,
    cond: jnp.ndarray,
    key: jax.Array,
    min_max_val: Tuple[float, float],
    gt: Optional[jnp.ndarray] = None,
    use_gt_timestep: Optional[int] = None,
    return_all: bool = False,
):
    """Plain (non-branched) ancestral DDPM chain (reference ddpm.py:929-977
    with branch_out=False), as one lax.scan.
    """
    sched = gd.schedule
    lo, hi = min_max_val
    b = cond.shape[0]
    shape = (b, gd.image_size, gd.image_size, gd.model_cfg.channels)

    key, init_key = jax.random.split(key)
    img = jax.random.normal(init_key, shape, dtype=jnp.float32)

    t_start = gd.num_timesteps
    if gt is not None and use_gt_timestep is not None:
        # start the reverse chain from a noised ground truth
        # (use_gt, reference ddpm.py:937-944)
        t_start = int(use_gt_timestep)
        tb = jnp.full((b,), t_start, dtype=jnp.int32)
        img = dm.q_sample(sched, gt, tb, img)

    cond_feat = gd.encode_cond(params, cond)

    def step(carry, inp):
        x, k = carry
        t = inp
        k, nk = jax.random.split(k)
        tb = jnp.full((b,), t, dtype=jnp.int32)
        out = gd.apply_model(params, x, None, tb, cond_feat=cond_feat)
        x_start = dm.model_output_to_x_start(sched, out, x, tb)
        x_start = jnp.clip(x_start, lo, hi)  # clip_denoised (ddpm.py:820-821)
        mean, _, logvar = dm.q_posterior(sched, x_start, x, tb)
        noise = _noise_like(nk, x, t)
        x_new = mean + jnp.exp(0.5 * logvar) * noise
        return (x_new, k), (x_new if return_all else None)

    ts = jnp.arange(t_start - 1, -1, -1)
    img0 = img
    (img, _), ys = jax.lax.scan(step, (img, key), ts)
    if return_all:
        # include the initial noise like the reference (imgs = [img],
        # ddpm.py:946) → T+1 frames
        frames = jnp.concatenate([img0[None], ys], axis=0)
        return _maybe_unnorm(gd, img), _maybe_unnorm(gd, frames)
    return _maybe_unnorm(gd, img)


def ddpm_sample_branched(
    gd: GaussianDiffusion,
    params,
    cond: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    scfg: SamplerConfig,
    min_max_val: Tuple[float, float],
    gt: Optional[jnp.ndarray] = None,
    classifier_fn: Optional[ClassifierFn] = None,
    return_all: bool = False,
    branch_sharding=None,
    return_debug: bool = False,
    return_fusion_time: bool = False,
):
    """Branched local-diffusion DDPM with mid-chain fusion.

    Implements reference ddpm.py:668-977 as the three-phase scan program
    described in the module docstring.  Returns the final image [B,H,W,C]
    (or the branch pair [2,B,H,W,C] when start_intermediate is False —
    reference ddpm.py:965-970).  With `return_fusion_time`, also returns
    the per-sample first-acceptance timestep of the classifier gate
    ([B] int32, the reference's `fusion_time.npy` diagnostic,
    ddpm.py:902-903; default = num_timesteps when the gate never ran).

    `return_all` → (final, frames) with frames [T+1, 2, B, H, W, C]: the
    initial noise, one frame per step — the (OOD, IND) branch pair while
    branched, the fused image DUPLICATED on the pair axis once fused.  The
    reference collects per-step frames too (ddpm.py:946, 964-969) but its
    `torch.stack(imgs, dim=1)` mixes [B] tensors with [out,in] pair lists
    and cannot actually stack once branching ran; the homogeneous pair-axis
    layout here is the working equivalent (scan requires static shapes).
    """
    scfg = reconcile(scfg)
    sched = gd.schedule
    lo, hi = min_max_val
    b = cond.shape[0]
    shape = (b, gd.image_size, gd.image_size, gd.model_cfg.channels)

    m = binarize_mask(mask)
    cond_out, cond_in = partition_cond(cond, m, scfg.cond_in_floor)

    # condition features: once per chain, not once per step
    feat_out = gd.encode_cond(params, cond_out.astype(jnp.float32))
    feat_in = gd.encode_cond(params, cond_in.astype(jnp.float32))
    feat_pair = jnp.concatenate([feat_out, feat_in], axis=0)
    feat_full = gd.encode_cond(params, cond)

    key, init_key = jax.random.split(key)
    img0 = jax.random.normal(init_key, shape, dtype=jnp.float32)

    t_top = gd.num_timesteps
    if scfg.use_gt and gt is not None:
        t_top = int(scfg.use_gt_timestep)
        tb = jnp.full((b,), t_top, dtype=jnp.int32)
        img0 = dm.q_sample(sched, gt, tb, img0)

    # both branches carried as ONE flat [2B] batch (OOD half first, then
    # IND) for the whole branched phase — per-step stack/concat/slice of the
    # pair showed up as layout copies in 256px profiles; flat, the model
    # call, x₀ conversion, posterior and noise update are each one fused
    # [2B] op with no repacking
    X2 = jnp.concatenate([img0, img0], axis=0)

    # trace-time constants routing the mask_x policy to the OOD half only
    out_half = jnp.concatenate(
        [jnp.ones((b, 1, 1, 1), bool), jnp.zeros((b, 1, 1, 1), bool)]
    )
    if scfg.mask_x_policy == "cond":
        mask_x_repl2 = jnp.concatenate([cond_out, jnp.zeros_like(cond_out)])
    else:
        mask_x_mult2 = jnp.concatenate([m, jnp.ones_like(m)])
        mask_x_zero2 = jnp.concatenate(
            [m == 0.0, jnp.zeros_like(m, dtype=bool)]
        )

    def branch_starts2(X2, tb2, force_mask_x=False):
        """Model predictions for both branches incl. mask_x policy + clip,
        on the flat [2B] batch.

        `force_mask_x` models the reference's classifier-rejection re-entry,
        which sets mask_x=True before redoing the step (ddpm.py:910).
        """
        if branch_sharding is not None:
            X2 = jax.lax.with_sharding_constraint(X2, branch_sharding)
        out2 = gd.apply_model(params, X2, None, tb2, cond_feat=feat_pair)
        xs2 = dm.model_output_to_x_start(sched, out2, X2, tb2)
        if scfg.mask_x or force_mask_x:
            # apply_mask_x semantics (ddpm.py:697-708) on the OOD half only
            if scfg.mask_x_policy == "cond":
                xs2 = jnp.where(out_half, mask_x_repl2, xs2)
            else:
                xs2 = jnp.where(mask_x_zero2, jnp.float32(lo), xs2 * mask_x_mult2)
        return jnp.clip(xs2, lo, hi)

    def branched_step(carry, t):
        X2, k = carry
        k, nk = jax.random.split(k)
        tb2 = jnp.full((2 * b,), t, dtype=jnp.int32)
        xs2 = branch_starts2(X2, tb2)
        mean2, _, logvar2 = dm.q_posterior(sched, xs2, X2, tb2)
        noise = _noise_like_shape(nk, shape, t)  # shared across branches
        n2 = jnp.concatenate([noise, noise])
        X2_new = mean2 + jnp.exp(0.5 * logvar2) * n2
        ys = X2_new.reshape(2, b, *X2_new.shape[1:]) if return_all else None
        return (X2_new, k), ys

    s = int(scfg.start_timestep)

    def _dup(x):
        """Duplicate a fused [B,...] frame onto the pair axis → [2,B,...]."""
        return jnp.stack([x, x])

    if not scfg.start_intermediate:
        # branched all the way down; returns the pair (ddpm.py:965-970)
        ts = jnp.arange(t_top - 1, -1, -1)
        (X2, _), ys = jax.lax.scan(branched_step, (X2, key), ts)
        pair = X2.reshape(2, b, *X2.shape[1:])
        if return_all:
            frames = jnp.concatenate([_dup(img0)[None], ys], axis=0)
            return _maybe_unnorm(gd, pair), _maybe_unnorm(gd, frames)
        return _maybe_unnorm(gd, pair)

    # ---- phase A: branched steps t ∈ [T-1 .. s+1] ----
    ys_a = None
    if t_top - 1 > s:
        ts = jnp.arange(t_top - 1, s, -1)
        (X2, key), ys_a = jax.lax.scan(branched_step, (X2, key), ts)

    # ---- fusion at t = s (ddpm.py:779-810) ----
    debug_state = {}

    def fuse_step(X2, t, k, capture_debug=False, force_mask_x=False):
        tb2 = jnp.full((2 * b,), t, dtype=jnp.int32)
        xs2 = branch_starts2(X2, tb2, force_mask_x=force_mask_x)
        xs_out, xs_in = xs2[:b], xs2[b:]
        x_start = xs_in * (1.0 - m) + xs_out  # xs_out is mask_x-masked
        x_out_masked = X2[:b] * m
        x_in_masked = X2[b:] * (1.0 - m)
        x = fuse_noisy_states(x_out_masked, x_in_masked, m, scfg.fusion_route)
        x_start = jnp.clip(x_start, lo, hi)
        if capture_debug:
            # the reference's fusion-time .npy dumps (ddpm.py:793-794,
            # 806-808): per-branch x_start estimates + fused state
            debug_state.update(
                pred_out=xs_out, pred_in=xs_in, pred_concat=x_start,
                x_out=x_out_masked, x_in=x_in_masked,
            )
        tb = jnp.full((b,), t, dtype=jnp.int32)
        mean, _, logvar = dm.q_posterior(sched, x_start, x, tb)
        noise = _noise_like(k, x, t)
        img = mean + jnp.exp(0.5 * logvar) * noise
        return img, jnp.concatenate([x_out_masked, x_in_masked])

    key, fk = jax.random.split(key)
    t_fuse = min(s, t_top - 1)
    img, x_branchout2 = fuse_step(X2, t_fuse, fk, capture_debug=return_debug)
    fusion_frame = img

    use_classifier = scfg.classifier and classifier_fn is not None
    accept_t = jnp.full((b,), gd.num_timesteps, jnp.int32)

    def _ret(img, accept_t, frames_b=None):
        out = [_maybe_unnorm(gd, img)]
        if return_all:
            parts = [_dup(img0)[None]]
            if ys_a is not None:
                parts.append(ys_a)
            parts.append(_dup(fusion_frame)[None])
            if frames_b is not None:
                parts.append(frames_b)
            out.append(_maybe_unnorm(gd, jnp.concatenate(parts, axis=0)))
        if return_debug:
            # raw (not unnormalized) like the reference's .npy dumps
            debug_state["fusion_time"] = accept_t
            out.append(debug_state)
        elif return_fusion_time:
            out.append(accept_t)
        return tuple(out) if len(out) > 1 else out[0]

    if t_fuse == 0:
        return _ret(img, accept_t)

    # ---- phase B: fused steps t ∈ [s-1 .. 0] ----
    def plain_step(x, t, k):
        tb = jnp.full((b,), t, dtype=jnp.int32)
        out = gd.apply_model(params, x, None, tb, cond_feat=feat_full)
        x_start = dm.model_output_to_x_start(sched, out, x, tb)
        x_start = jnp.clip(x_start, lo, hi)
        mean, _, logvar = dm.q_posterior(sched, x_start, x, tb)
        noise = _noise_like(k, x, t)
        return mean + jnp.exp(0.5 * logvar) * noise, x_start

    retry_budget = int(scfg.max_classifier_retries)

    def fused_phase_step(carry, t):
        x, k, accepted, acc_t, rejects = carry
        k, pk, rk = jax.random.split(k, 3)
        img_plain, xs_plain = plain_step(x, t, pk)

        if not use_classifier:
            return (img_plain, k, accepted, acc_t, rejects), (
                _dup(img_plain) if return_all else None
            )

        # classifier gate (reference ddpm.py:883-916): per sample, accept
        # the fused estimate if classified as anomalous (score > 0) or at
        # t == 0 (or when the retry budget is exhausted — our bounded
        # extension; max_classifier_retries == 0 reproduces the reference's
        # unbounded retry).  A rejected sample discards the plain step and
        # instead re-fuses the saved masked branch pair with fresh model
        # predictions at the current t (the reference's
        # p_sample(self.x_branchout, ..., self.t) re-entry, ddpm.py:911;
        # x_branchout itself is never advanced — its update at ddpm.py:795
        # is idempotent since the pair is already masked).  Once accepted,
        # a sample stays on the plain chain (classifier_flag latch,
        # ddpm.py:898-900) — and once EVERY sample has latched, the gate
        # can never fire again, so lax.cond skips both the classifier score
        # and the retry fuse-step (a second 2B-branch UNet pass): like the
        # reference, the gated chain pays only while rejection is possible.
        def gated(img_plain, xs_plain, rk, accepted, acc_t, rejects):
            score = jnp.reshape(classifier_fn(xs_plain, t), (b,))
            budget_hit = (
                rejects >= retry_budget
                if retry_budget > 0
                else jnp.zeros((b,), bool)
            )
            accept_now = (score > 0.0) | (t == 0) | budget_hit
            img_retry, _ = fuse_step(x_branchout2, t, rk, force_mask_x=True)
            use_plain = accepted | accept_now
            sel = use_plain[:, None, None, None]
            img_next = jnp.where(sel, img_plain, img_retry)
            acc_t_next = jnp.where(
                accepted, acc_t, jnp.where(accept_now, t, acc_t)
            )
            rejects_next = rejects + (~use_plain).astype(jnp.int32)
            return img_next, use_plain, acc_t_next, rejects_next

        def latched(img_plain, xs_plain, rk, accepted, acc_t, rejects):
            return img_plain, accepted, acc_t, rejects

        img_next, accepted, acc_t, rejects = jax.lax.cond(
            jnp.all(accepted), latched, gated,
            img_plain, xs_plain, rk, accepted, acc_t, rejects,
        )
        return (img_next, k, accepted, acc_t, rejects), (
            _dup(img_next) if return_all else None
        )

    ts = jnp.arange(t_fuse - 1, -1, -1)
    accepted0 = jnp.full((b,), not use_classifier)
    (img, _, _, accept_t, _), frames_b = jax.lax.scan(
        fused_phase_step,
        (img, key, accepted0, accept_t, jnp.zeros((b,), jnp.int32)),
        ts,
    )
    return _ret(img, accept_t, frames_b)


def ddim_times(total_timesteps: int, sampling_timesteps: int) -> np.ndarray:
    """Strided DDIM time grid, descending incl. the trailing -1
    (reference ddpm.py:984-986)."""
    times = np.linspace(-1, total_timesteps - 1, sampling_timesteps + 1)
    return np.asarray(list(reversed(times.astype(int).tolist())))


def ddim_sample_plain(
    gd: GaussianDiffusion,
    params,
    cond: jnp.ndarray,
    key: jax.Array,
    min_max_val: Tuple[float, float],
    return_all: bool = False,
):
    """Plain DDIM (η=0 default) as one scan over strided time pairs
    (reference ddpm.py:1045-1068)."""
    sched = gd.schedule
    lo, hi = min_max_val
    b = cond.shape[0]
    shape = (b, gd.image_size, gd.image_size, gd.model_cfg.channels)
    eta = gd.diff_cfg.ddim_sampling_eta

    times = ddim_times(gd.num_timesteps, gd.sampling_timesteps)
    pairs = jnp.asarray(np.stack([times[:-1], times[1:]], axis=1))

    key, init_key = jax.random.split(key)
    img = jax.random.normal(init_key, shape, dtype=jnp.float32)
    cond_feat = gd.encode_cond(params, cond)

    def step(carry, pair):
        x, k = carry
        t, t_next = pair[0], pair[1]
        k, nk = jax.random.split(k)
        tb = jnp.full((b,), t, dtype=jnp.int32)
        pred = gd.model_predictions(
            params, x, tb, cond_feat, min_max_val, clip_x_start=True,
            rederive_pred_noise=True,
        )
        x_start, pred_noise = pred.pred_x_start, pred.pred_noise

        alpha = sched.alphas_cumprod[t]
        alpha_next = jnp.where(t_next >= 0, sched.alphas_cumprod[t_next], 1.0)
        sigma = eta * jnp.sqrt(
            (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
        )
        c = jnp.sqrt(jnp.clip(1.0 - alpha_next - sigma**2, 0.0))
        noise = jax.random.normal(nk, x.shape, dtype=x.dtype)
        x_step = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
        # final pair (t_next < 0) returns x_start directly (ddpm.py:1053-1056)
        x_new = jnp.where(t_next < 0, x_start, x_step)
        return (x_new, k), (x_new if return_all else None)

    img0 = img
    (img, _), ys = jax.lax.scan(step, (img, key), pairs)
    if return_all:
        frames = jnp.concatenate([img0[None], ys], axis=0)
        return _maybe_unnorm(gd, img), _maybe_unnorm(gd, frames)
    return _maybe_unnorm(gd, img)


def ddim_sample_branched(
    gd: GaussianDiffusion,
    params,
    cond: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    scfg: SamplerConfig,
    min_max_val: Tuple[float, float],
    branch_sharding=None,
    return_all: bool = False,
):
    """Branched DDIM with mid-chain fusion (reference ddpm.py:1002-1043).

    Fusion fires at t <= times[-start_timestep-2] (ddpm.py:987): x_start is
    fused with the zero-sentinel route and pred_noise via the masked route
    (ddpm.py:1025-1035); later steps run the plain DDIM update.

    `return_all` → (final, frames) with frames [S+1, 2, B, H, W, C] over
    the S strided steps: initial noise, the branch pair while branched, the
    fused image duplicated on the pair axis after fusion — same layout as
    ddpm_sample_branched (the reference stacks DDIM frames at ddpm.py:1073
    but, as in DDPM, its imgs list mixes pairs and tensors once branched).
    """
    scfg = reconcile(scfg)
    sched = gd.schedule
    lo, hi = min_max_val
    b = cond.shape[0]
    shape = (b, gd.image_size, gd.image_size, gd.model_cfg.channels)
    eta = gd.diff_cfg.ddim_sampling_eta

    times = ddim_times(gd.num_timesteps, gd.sampling_timesteps)
    fuse_time = int(times[-scfg.start_timestep - 2])
    # index of the first pair whose t <= fuse_time
    pair_ts = times[:-1]
    fusible = pair_ts <= fuse_time
    fuse_idx = int(np.argmax(fusible)) if fusible.any() else None

    m = binarize_mask(mask)
    cond_out, cond_in = partition_cond(cond, m, scfg.cond_in_floor)
    feat_out = gd.encode_cond(params, cond_out.astype(jnp.float32))
    feat_in = gd.encode_cond(params, cond_in.astype(jnp.float32))
    feat_pair = jnp.concatenate([feat_out, feat_in], axis=0)
    feat_full = gd.encode_cond(params, cond)

    key, init_key = jax.random.split(key)
    img0 = jax.random.normal(init_key, shape, dtype=jnp.float32)
    # flat [2B] branch carry — see ddpm_sample_branched
    X2 = jnp.concatenate([img0, img0], axis=0)

    out_half = jnp.concatenate(
        [jnp.ones((b, 1, 1, 1), bool), jnp.zeros((b, 1, 1, 1), bool)]
    )
    if scfg.mask_x_policy == "cond":
        mask_x_repl2 = jnp.concatenate([cond_out, jnp.zeros_like(cond_out)])
    else:
        mask_x_mult2 = jnp.concatenate([m, jnp.ones_like(m)])
        mask_x_zero2 = jnp.concatenate(
            [m == 0.0, jnp.zeros_like(m, dtype=bool)]
        )

    def branch_preds2(X2, tb2):
        """Branched model predictions with clip + rederived noise
        (clip_x_start=True path of ddpm.py:725-749), flat [2B]."""
        if branch_sharding is not None:
            X2 = jax.lax.with_sharding_constraint(X2, branch_sharding)
        out2 = gd.apply_model(params, X2, None, tb2, cond_feat=feat_pair)
        xs2 = dm.model_output_to_x_start(sched, out2, X2, tb2)
        if scfg.mask_x:
            if scfg.mask_x_policy == "cond":
                xs2 = jnp.where(out_half, mask_x_repl2, xs2)
            else:
                xs2 = jnp.where(mask_x_zero2, jnp.float32(lo), xs2 * mask_x_mult2)
        xs2 = jnp.clip(xs2, lo, hi)
        pn2 = dm.predict_noise_from_start(sched, X2, tb2, xs2)
        return xs2, pn2

    def ddim_coeffs(t, t_next):
        alpha = sched.alphas_cumprod[t]
        alpha_next = jnp.where(t_next >= 0, sched.alphas_cumprod[t_next], 1.0)
        sigma = eta * jnp.sqrt(
            (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
        )
        c = jnp.sqrt(jnp.clip(1.0 - alpha_next - sigma**2, 0.0))
        return alpha_next, sigma, c

    pairs = np.stack([times[:-1], times[1:]], axis=1)

    def branched_step(carry, pair):
        X2, k = carry
        t, t_next = pair[0], pair[1]
        k, nk = jax.random.split(k)
        tb2 = jnp.full((2 * b,), t, dtype=jnp.int32)
        xs2, pn2 = branch_preds2(X2, tb2)
        alpha_next, sigma, c = ddim_coeffs(t, t_next)
        noise = jax.random.normal(nk, shape, dtype=jnp.float32)
        n2 = jnp.concatenate([noise, noise])  # shared across branches
        X2_step = xs2 * jnp.sqrt(alpha_next) + c * pn2 + sigma * n2
        X2_new = jnp.where(t_next < 0, xs2, X2_step)
        ys = X2_new.reshape(2, b, *X2_new.shape[1:]) if return_all else None
        return (X2_new, k), ys

    def as_pair(X2):
        return X2.reshape(2, b, *X2.shape[1:])

    def _dup(x):
        return jnp.stack([x, x])

    def _frames(*parts):
        return _maybe_unnorm(
            gd, jnp.concatenate([p for p in parts if p is not None], axis=0)
        )

    if not scfg.start_intermediate or fuse_idx is None:
        # either branched-all-the-way by config, or the fusion time sits
        # below every pair (start_timestep ≤ -1): the reference predicate
        # `t <= start_timestep_ddim` never fires and the terminal pair
        # returns the unfused branch x_starts (ddpm.py:1005-1011)
        (X2, _), ys = jax.lax.scan(branched_step, (X2, key), jnp.asarray(pairs))
        if return_all:
            return _maybe_unnorm(gd, as_pair(X2)), _frames(_dup(img0)[None], ys)
        return _maybe_unnorm(gd, as_pair(X2))

    # phase A: branched pairs before the fusion index
    ys_a = None
    if fuse_idx > 0:
        (X2, key), ys_a = jax.lax.scan(
            branched_step, (X2, key), jnp.asarray(pairs[:fuse_idx])
        )

    # fusion step (ddpm.py:1022-1041)
    t, t_next = int(pairs[fuse_idx][0]), int(pairs[fuse_idx][1])
    key, nk = jax.random.split(key)
    tb2 = jnp.full((2 * b,), t, dtype=jnp.int32)
    xs2, pn2 = branch_preds2(X2, tb2)
    xs_out, xs_in = xs2[:b], xs2[b:]
    pn_out, pn_in = pn2[:b], pn2[b:]
    if t_next < 0:
        # the reference checks time_next < 0 BEFORE the fusion predicate and
        # returns the unfused branch pair (ddpm.py:1007-1011) — reached when
        # start_timestep maps the fusion onto the terminal DDIM pair
        if return_all:
            return _maybe_unnorm(gd, as_pair(xs2)), _frames(
                _dup(img0)[None], ys_a, as_pair(xs2)[None]
            )
        return _maybe_unnorm(gd, as_pair(xs2))
    x_start = fuse_noisy_states(xs_out, xs_in, m, scfg.fusion_route)
    x_start = jnp.clip(x_start, lo, hi)
    pn_out_masked = pn_out * m
    pn_in_masked = pn_in * (1.0 - m)
    pred_noise = fuse_noisy_states(pn_out_masked, pn_in_masked, m, scfg.fusion_route)
    alpha_next, sigma, c = ddim_coeffs(t, t_next)
    noise = jax.random.normal(nk, x_start.shape, dtype=x_start.dtype)
    img = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise

    fusion_frame = img

    # phase B: plain DDIM on the fused chain
    def plain_step(carry, pair):
        x, k = carry
        t, t_next = pair[0], pair[1]
        k, nk = jax.random.split(k)
        tb = jnp.full((b,), t, dtype=jnp.int32)
        pred = gd.model_predictions(
            params, x, tb, feat_full, min_max_val, clip_x_start=True,
            rederive_pred_noise=True,
        )
        x_start = jnp.clip(pred.pred_x_start, lo, hi)
        alpha_next, sigma, c = ddim_coeffs(t, t_next)
        noise = jax.random.normal(nk, x.shape, dtype=x.dtype)
        x_step = x_start * jnp.sqrt(alpha_next) + c * pred.pred_noise + sigma * noise
        x_new = jnp.where(t_next < 0, x_start, x_step)
        return (x_new, k), (_dup(x_new) if return_all else None)

    rest = pairs[fuse_idx + 1 :]
    ys_b = None
    if len(rest) > 0:
        (img, _), ys_b = jax.lax.scan(plain_step, (img, key), jnp.asarray(rest))
    if return_all:
        return _maybe_unnorm(gd, img), _frames(
            _dup(img0)[None], ys_a, _dup(fusion_frame)[None], ys_b
        )
    return _maybe_unnorm(gd, img)


def interpolate(
    gd: GaussianDiffusion,
    params,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    cond: jnp.ndarray,
    key: jax.Array,
    min_max_val: Tuple[float, float],
    t: Optional[int] = None,
    lam: float = 0.5,
):
    """Latent interpolation: noise both endpoints to x_t, lerp, denoise
    (reference GaussianDiffusion.interpolate, ddpm.py:1127-1145)."""
    sched = gd.schedule
    lo, hi = min_max_val
    b = x1.shape[0]
    t = gd.num_timesteps - 1 if t is None else int(t)
    tb = jnp.full((b,), t, dtype=jnp.int32)

    key, k1, k2 = jax.random.split(key, 3)
    xt1 = dm.q_sample(sched, x1, tb, jax.random.normal(k1, x1.shape))
    xt2 = dm.q_sample(sched, x2, tb, jax.random.normal(k2, x2.shape))
    img = (1.0 - lam) * xt1 + lam * xt2

    cond_feat = gd.encode_cond(params, cond)

    def step(carry, tt):
        x, k = carry
        k, nk = jax.random.split(k)
        tb = jnp.full((b,), tt, dtype=jnp.int32)
        out = gd.apply_model(params, x, None, tb, cond_feat=cond_feat)
        x_start = jnp.clip(dm.model_output_to_x_start(sched, out, x, tb), lo, hi)
        mean, _, logvar = dm.q_posterior(sched, x_start, x, tb)
        noise = _noise_like(nk, x, tt)
        return (mean + jnp.exp(0.5 * logvar) * noise, k), None

    (img, _), _ = jax.lax.scan(step, (img, key), jnp.arange(t - 1, -1, -1))
    return img


# ---------------------------------------------------------------------------
# top-level dispatch (reference GaussianDiffusion.sample, ddpm.py:1077-1125)
# ---------------------------------------------------------------------------

def sample(
    gd: GaussianDiffusion,
    params,
    cond: jnp.ndarray,
    key: jax.Array,
    scfg: SamplerConfig,
    min_max_val: Tuple[float, float],
    mask: Optional[jnp.ndarray] = None,
    gt: Optional[jnp.ndarray] = None,
    classifier_fn: Optional[ClassifierFn] = None,
    return_all: bool = False,
):
    """Flag reconciliation + dispatch.

    Host-side decisions (mirroring ddpm.py:1093-1125): detector/confidence
    runs force mask_cond/mask_x on (ddpm.py:1106-1108, via reconcile); a
    uniformly-one mask (detector found no anomaly) bypasses branching
    entirely; DDPM vs DDIM is chosen by sampling_timesteps < timesteps.
    """
    scfg = reconcile(scfg)
    branch = scfg.branch_out and mask is not None
    if branch:
        # uniform-ones bypass is a HOST decision (reference ddpm.py:1106-1125
        # picks the chain in python).  When the mask is already a host array
        # (the pipeline always passes numpy) this costs nothing; only a
        # device-resident mask pays a device→host pull here.
        m_host = mask if isinstance(mask, np.ndarray) else np.asarray(mask)
        if m_host.min() >= 1.0 and m_host.max() <= 1.0:
            branch = False  # "Original reverse process as AD is low"

    if gd.is_ddim_sampling:
        if branch:
            return ddim_sample_branched(
                gd, params, cond, mask, key, scfg, min_max_val,
                return_all=return_all,
            )
        return ddim_sample_plain(gd, params, cond, key, min_max_val, return_all)

    if branch:
        return ddpm_sample_branched(
            gd, params, cond, mask, key, scfg, min_max_val, gt=gt,
            classifier_fn=classifier_fn, return_all=return_all,
        )
    gt_arg = gt if (scfg.use_gt and scfg.start_intermediate) else None
    return ddpm_sample_plain(
        gd, params, cond, key, min_max_val,
        gt=gt_arg,
        use_gt_timestep=scfg.use_gt_timestep if gt_arg is not None else None,
        return_all=return_all,
    )
