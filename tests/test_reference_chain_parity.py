"""Whole-chain bit-parity vs torch transcriptions of the reference samplers.

Extends tests/test_reference_step_parity.py from single steps to the FULL
composed T-step programs: phase boundaries, the fusion index, the DDIM pair
grid, use_gt chain shortening, and the classifier-gated rejection path — all
compared against faithful torch transcriptions of reference ddpm.py:929-977
(p_sample_loop + branching_out/fusion bookkeeping) and ddpm.py:979-1075
(ddim_sample).

Both sides run the SAME injected inputs:
  * the "model" is a fixed analytic function f(x, cond, t) evaluated
    identically in jax (via an overridden GaussianDiffusion.apply_model) and
    in torch, so model outputs are injected by construction;
  * the noise sequence the jax scan will draw is replayed on the host by
    replicating the samplers' exact PRNG key-split order, and the replayed
    arrays are fed to the torch transcription.

Tolerance: allclose(1e-5) over the whole chain (per VERDICT r1 item 3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from localdiffusion_tpu.config import DiffusionConfig, ModelConfig, SamplerConfig
from localdiffusion_tpu.diffusion import sampler as S
from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion

B, H, W, C = 1, 6, 6, 1
LO, HI = 0.0, 2.0
MMV = (LO, HI)
T_DDPM = 12
T_DDIM, S_DDIM = 20, 5


# ---------------------------------------------------------------------------
# the injected analytic "model" — identical on both sides
# ---------------------------------------------------------------------------

def f_jax(x, c, t, t_norm):
    t = jnp.asarray(t, jnp.float32)
    while t.ndim < x.ndim:
        t = t[..., None]
    return 0.55 * c + 0.3 * x + 0.1 * jnp.sin(3.0 * x) + 0.02 * (t / t_norm)


def f_torch(x, c, t, t_norm):
    return 0.55 * c + 0.3 * x + 0.1 * torch.sin(3.0 * x) + 0.02 * (
        float(t) / t_norm
    )


def oracle_gd(timesteps, sampling_timesteps=None):
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=C)
    dcfg = DiffusionConfig(
        image_size=H, timesteps=timesteps,
        sampling_timesteps=sampling_timesteps, objective="pred_x0",
    )
    gd = GaussianDiffusion(mcfg, dcfg)
    gd.encode_cond = lambda params, cond: cond  # features = the image itself

    def apply_model(params, x, cond, t, cond_feat=None):
        return f_jax(x, cond_feat, t, float(timesteps))

    gd.apply_model = apply_model
    return gd


def torch_buffers(sched):
    names = (
        "posterior_mean_coef1", "posterior_mean_coef2",
        "posterior_log_variance_clipped", "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "alphas_cumprod",
    )
    return {n: torch.from_numpy(np.asarray(getattr(sched, n))) for n in names}


def _inputs(seed):
    rng = np.random.default_rng(seed)
    shape = (B, H, W, C)
    cond = rng.uniform(0.1, HI, shape).astype(np.float32)
    mask = np.zeros(shape, np.float32)
    mask[:, :, :2, :] = 1.0
    gt = rng.uniform(LO, HI, shape).astype(np.float32)
    return cond, mask, gt


# ---------------------------------------------------------------------------
# PRNG replay: replicate the samplers' exact key-split order on the host
# ---------------------------------------------------------------------------

def replay_ddpm_noises(key, t_top, s, shape):
    """Mirror of ddpm_sample_branched's split structure (sampler.py)."""
    n = lambda k: np.asarray(jax.random.normal(k, shape, dtype=jnp.float32))
    noises = {}
    key, init_key = jax.random.split(key)
    noises["init"] = n(init_key)
    branch = {}
    if t_top - 1 > s:
        k = key
        for t in range(t_top - 1, s, -1):
            k, nk = jax.random.split(k)
            branch[t] = n(nk)
        key = k
    noises["branch"] = branch
    key, fk = jax.random.split(key)
    noises["fuse"] = n(fk)
    t_f = min(s, t_top - 1)
    plain, retry = {}, {}
    k = key
    for t in range(t_f - 1, -1, -1):
        k, pk, rk = jax.random.split(k, 3)
        plain[t] = n(pk)
        retry[t] = n(rk)
    noises["plain"], noises["retry"] = plain, retry
    return noises


def replay_ddim_init(key, shape):
    """DDIM with η=0 multiplies every step noise by σ=0 — only the initial
    noise matters."""
    _, init_key = jax.random.split(key)
    return np.asarray(jax.random.normal(init_key, shape, dtype=jnp.float32))


# ---------------------------------------------------------------------------
# torch transcriptions of the composed reference chains
# ---------------------------------------------------------------------------

def torch_ddpm_branched_chain(
    sched, cond, mask, noises, t_top, s, policy, floor, t_norm,
    gt=None, reject_ts=None, retry_budget=0,
):
    """Reference ddpm.py:929-977 (p_sample_loop with branch/fusion
    bookkeeping) incl. the classifier rejection path (ddpm.py:883-916)."""
    buf = torch_buffers(sched)
    cond = torch.from_numpy(cond)
    mask = torch.from_numpy(mask)
    binary = (mask >= 1.0).float()
    cond_out = cond * binary
    cond_in = cond * torch.clamp(1.0 - binary, floor, 1.0)

    def f(x, c, t):
        return f_torch(x, c, t, t_norm)

    def mask_x(mo_out):
        # ddpm.py:697-708
        if policy == "cond":
            return cond_out
        out = mo_out * binary
        return torch.where(binary == 0.0, torch.tensor(LO), out)

    def posterior(x0, xt, t):
        mean = buf["posterior_mean_coef1"][t] * x0 + buf["posterior_mean_coef2"][t] * xt
        return mean, buf["posterior_log_variance_clipped"][t]

    img = torch.from_numpy(noises["init"])
    if gt is not None:
        # use_gt: start the reverse chain from a noised GT (ddpm.py:937-944)
        img = (
            buf["sqrt_alphas_cumprod"][t_top] * torch.from_numpy(gt)
            + buf["sqrt_one_minus_alphas_cumprod"][t_top] * img
        )
    x_out, x_in = img.clone(), img.clone()

    # phase A: branched steps (ddpm.py:951-960 with branch_out=True)
    for t in range(t_top - 1, s, -1):
        xs_out = mask_x(f(x_out, cond_out, t)).clamp(LO, HI)
        xs_in = f(x_in, cond_in, t).clamp(LO, HI)
        mean_out, logvar = posterior(xs_out, x_out, t)
        mean_in, _ = posterior(xs_in, x_in, t)
        nt = torch.from_numpy(noises["branch"][t]) if t > 0 else torch.zeros_like(img)
        x_out = mean_out + (0.5 * logvar).exp() * nt
        x_in = mean_in + (0.5 * logvar).exp() * nt

    # fusion (ddpm.py:779-810)
    def fuse_at(xp_out, xp_in, t, noise):
        xs_out = mask_x(f(xp_out, cond_out, t)).clamp(LO, HI)
        xs_in = f(xp_in, cond_in, t).clamp(LO, HI)
        x_start = (xs_in * (1.0 - binary) + xs_out).clamp(LO, HI)
        xo = xp_out * binary
        xi = xp_in * (1.0 - binary)
        x = torch.where(xo == 0.0, xi, xo)
        mean, logvar = posterior(x_start, x, t)
        nt = noise if t > 0 else torch.zeros_like(x)
        return mean + (0.5 * logvar).exp() * nt, (xo, xi)

    t_f = min(s, t_top - 1)
    img, branchout = fuse_at(x_out, x_in, t_f, torch.from_numpy(noises["fuse"]))
    if t_f == 0:
        return img.numpy()

    # phase B: fused chain with optional classifier gate (ddpm.py:874-927)
    accepted = reject_ts is None
    rejects = 0
    for t in range(t_f - 1, -1, -1):
        xs = f(img, cond, t).clamp(LO, HI)
        mean, logvar = posterior(xs, img, t)
        nt = torch.from_numpy(noises["plain"][t]) if t > 0 else torch.zeros_like(img)
        img_plain = mean + (0.5 * logvar).exp() * nt
        if accepted:
            img = img_plain
            continue
        budget_hit = retry_budget > 0 and rejects >= retry_budget
        reject = (t in reject_ts) and t != 0 and not budget_hit
        if not reject:
            accepted = True
            img = img_plain
        else:
            # rejection re-runs the step on the SAVED masked pair at the
            # current t and re-fuses (ddpm.py:911; x_branchout never
            # advances — its update at ddpm.py:795 is idempotent)
            rejects += 1
            img, _ = fuse_at(
                branchout[0], branchout[1], t, torch.from_numpy(noises["retry"][t])
            )
    return img.numpy()


def torch_ddim_branched_chain(sched, cond, mask, init, total_t, steps, s,
                              policy, floor, t_norm):
    """Reference ddpm.py:979-1075 (ddim_sample, branched, η=0)."""
    buf = torch_buffers(sched)
    cond = torch.from_numpy(cond)
    mask = torch.from_numpy(mask)
    binary = (mask >= 1.0).float()
    cond_out = cond * binary
    cond_in = cond * torch.clamp(1.0 - binary, floor, 1.0)

    times = torch.linspace(-1, total_t - 1, steps=steps + 1)
    times = list(reversed(times.int().tolist()))
    pairs = list(zip(times[:-1], times[1:]))
    fuse_time = times[-s - 2]

    def f(x, c, t):
        return f_torch(x, c, t, t_norm)

    def mask_x(mo_out):
        if policy == "cond":
            return cond_out
        out = mo_out * binary
        return torch.where(binary == 0.0, torch.tensor(LO), out)

    def pnfs(x, t, x0):
        return (
            buf["sqrt_recip_alphas_cumprod"][t] * x - x0
        ) / buf["sqrt_recipm1_alphas_cumprod"][t]

    img = torch.from_numpy(init)
    x_out, x_in = img.clone(), img.clone()
    fused = False
    for t, t_next in pairs:
        if not fused:
            xs_out = mask_x(f(x_out, cond_out, t)).clamp(LO, HI)
            xs_in = f(x_in, cond_in, t).clamp(LO, HI)
            pn_out = pnfs(x_out, t, xs_out)
            pn_in = pnfs(x_in, t, xs_in)
            if t_next < 0:
                # terminal pair BEFORE the fusion predicate → unfused pair
                # (ddpm.py:1007-1011)
                return torch.stack([xs_out, xs_in]).numpy()
            alpha_next = buf["alphas_cumprod"][t_next]
            c = (1.0 - alpha_next).sqrt()
            if t <= fuse_time:
                # fusion (ddpm.py:1022-1041)
                x_start = torch.where(xs_out == 0.0, xs_in, xs_out).clamp(LO, HI)
                xo = pn_out * binary
                xi = pn_in * (1.0 - binary)
                pred_noise = torch.where(xo == 0.0, xi, xo)
                img = x_start * alpha_next.sqrt() + c * pred_noise
                fused = True
            else:
                x_out = xs_out * alpha_next.sqrt() + c * pn_out
                x_in = xs_in * alpha_next.sqrt() + c * pn_in
        else:
            xs = f(img, cond, t).clamp(LO, HI)
            pn = pnfs(img, t, xs)
            if t_next < 0:
                img = xs
                continue
            alpha_next = buf["alphas_cumprod"][t_next]
            c = (1.0 - alpha_next).sqrt()
            img = xs * alpha_next.sqrt() + c * pn
    return img.numpy()


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("policy,floor", [("cond", 0.5), ("minval", 0.95)])
@pytest.mark.parametrize("s", [0, 2, T_DDPM - 1])
def test_ddpm_branched_chain_parity(policy, floor, s):
    gd = oracle_gd(T_DDPM)
    cond, mask, _ = _inputs(s + 1)
    key = jax.random.PRNGKey(s + 17)
    scfg = SamplerConfig(start_timestep=s, mask_x=True, mask_x_policy=policy,
                         cond_in_floor=floor)
    got = np.asarray(
        S.ddpm_sample_branched(
            gd, {}, jnp.asarray(cond), jnp.asarray(mask), key, scfg, MMV
        )
    )
    noises = replay_ddpm_noises(key, T_DDPM, s, (B, H, W, C))
    want = torch_ddpm_branched_chain(
        gd.schedule, cond, mask, noises, T_DDPM, s, policy, floor,
        float(T_DDPM),
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ddpm_branched_chain_parity_use_gt():
    """use_gt shortens the chain to use_gt_timestep and starts from a noised
    GT (ddpm.py:937-944)."""
    gd = oracle_gd(T_DDPM)
    cond, mask, gt = _inputs(31)
    key = jax.random.PRNGKey(23)
    s, t_gt = 2, 8
    scfg = SamplerConfig(start_timestep=s, mask_x=True, mask_x_policy="cond",
                         cond_in_floor=0.5, use_gt=True, use_gt_timestep=t_gt)
    got = np.asarray(
        S.ddpm_sample_branched(
            gd, {}, jnp.asarray(cond), jnp.asarray(mask), key, scfg, MMV,
            gt=jnp.asarray(gt),
        )
    )
    noises = replay_ddpm_noises(key, t_gt, s, (B, H, W, C))
    want = torch_ddpm_branched_chain(
        gd.schedule, cond, mask, noises, t_gt, s, "cond", 0.5, float(T_DDPM),
        gt=gt,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reject_ts,budget", [
    ({4, 3}, 0),      # reject twice then accept (unbounded budget)
    ({4, 3, 2, 1}, 0),  # reject until the forced t == 0 acceptance
    ({4, 3, 2, 1}, 2),  # budget 2: force-accept after two rejections
])
def test_ddpm_classifier_rejection_chain_parity(reject_ts, budget):
    """Scripted reject-N-then-accept parity of the classifier-gated
    re-branching (VERDICT r1 item 2's done-criterion).  The rejection path
    re-fuses the saved masked pair with fresh predictions at the current t
    (reference ddpm.py:905-916)."""
    gd = oracle_gd(T_DDPM)
    cond, mask, _ = _inputs(41)
    key = jax.random.PRNGKey(5)
    s = 5
    scfg = SamplerConfig(start_timestep=s, mask_x=True, mask_x_policy="cond",
                         cond_in_floor=0.5, classifier=True,
                         max_classifier_retries=budget)
    reject_arr = np.zeros((T_DDPM,), bool)
    for t in reject_ts:
        reject_arr[t] = True
    reject_j = jnp.asarray(reject_arr)

    def gate(xs, t):
        return jnp.where(reject_j[t], -1.0, 1.0) * jnp.ones((xs.shape[0],))

    got, ft = S.ddpm_sample_branched(
        gd, {}, jnp.asarray(cond), jnp.asarray(mask), key, scfg, MMV,
        classifier_fn=gate, return_fusion_time=True,
    )
    noises = replay_ddpm_noises(key, T_DDPM, s, (B, H, W, C))
    want = torch_ddpm_branched_chain(
        gd.schedule, cond, mask, noises, T_DDPM, s, "cond", 0.5,
        float(T_DDPM), reject_ts=reject_ts, retry_budget=budget,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    # acceptance timestep: first fused-phase t not rejected (or budget/t==0)
    expect_ft = None
    rejects = 0
    for t in range(s - 1, -1, -1):
        budget_hit = budget > 0 and rejects >= budget
        if (t not in reject_ts) or t == 0 or budget_hit:
            expect_ft = t
            break
        rejects += 1
    assert int(np.asarray(ft)[0]) == expect_ft


@pytest.mark.parametrize("policy,floor", [("cond", 0.5), ("minval", 0.95)])
@pytest.mark.parametrize("s", [0, 2])
def test_ddim_branched_chain_parity(policy, floor, s):
    gd = oracle_gd(T_DDIM, sampling_timesteps=S_DDIM)
    assert gd.is_ddim_sampling
    cond, mask, _ = _inputs(s + 7)
    key = jax.random.PRNGKey(s + 29)
    scfg = SamplerConfig(start_timestep=s, mask_x=True, mask_x_policy=policy,
                         cond_in_floor=floor)
    got = np.asarray(
        S.ddim_sample_branched(
            gd, {}, jnp.asarray(cond), jnp.asarray(mask), key, scfg, MMV
        )
    )
    init = replay_ddim_init(key, (B, H, W, C))
    want = torch_ddim_branched_chain(
        gd.schedule, cond, mask, init, T_DDIM, S_DDIM, s, policy, floor,
        float(T_DDIM),
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ddpm_plain_chain_parity():
    """Plain (non-branched) ancestral chain vs transcription of
    ddpm.py:929-977 with branch_out=False."""
    gd = oracle_gd(T_DDPM)
    cond, _, _ = _inputs(3)
    key = jax.random.PRNGKey(11)
    got = np.asarray(
        S.ddpm_sample_plain(gd, {}, jnp.asarray(cond), key, MMV)
    )
    # replay: key, init = split; scan carry splits (k, nk) per step
    shape = (B, H, W, C)
    k, init_key = jax.random.split(key)
    img = torch.from_numpy(
        np.asarray(jax.random.normal(init_key, shape, dtype=jnp.float32))
    )
    buf = torch_buffers(gd.schedule)
    condt = torch.from_numpy(cond)
    for t in range(T_DDPM - 1, -1, -1):
        k, nk = jax.random.split(k)
        xs = f_torch(img, condt, t, float(T_DDPM)).clamp(LO, HI)
        mean = buf["posterior_mean_coef1"][t] * xs + buf["posterior_mean_coef2"][t] * img
        logvar = buf["posterior_log_variance_clipped"][t]
        nt = (
            torch.from_numpy(np.asarray(jax.random.normal(nk, shape, dtype=jnp.float32)))
            if t > 0 else torch.zeros_like(img)
        )
        img = mean + (0.5 * logvar).exp() * nt
    np.testing.assert_allclose(got, img.numpy(), rtol=1e-5, atol=1e-5)
