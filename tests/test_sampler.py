"""Sampler semantics tests with oracle denoisers.

These verify the branched/fused scan programs against analytically-known
outcomes: a pred_x0 oracle that returns its target exactly makes the
ancestral chain land on the target at t=0 (posterior_mean_coef1[0] == 1),
and an oracle returning the conditioning image makes branched local
diffusion reconstruct the mask-recombined conditioning exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localdiffusion_tpu.config import DiffusionConfig, ModelConfig, SamplerConfig
from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
from localdiffusion_tpu.diffusion import sampler as S

KEY = jax.random.PRNGKey(0)
MMV = (0.0, 2.0)


def tiny_gd(timesteps=10, sampling_timesteps=None, image_size=8):
    mcfg = ModelConfig(
        dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=1,
    )
    dcfg = DiffusionConfig(
        image_size=image_size, timesteps=timesteps,
        sampling_timesteps=sampling_timesteps, objective="pred_x0",
    )
    return GaussianDiffusion(mcfg, dcfg)


def oracle_gd(target=None, **kw):
    """GaussianDiffusion whose 'model' deterministically returns a fixed
    target (or the passthrough cond features) as its pred_x0 output."""
    gd = tiny_gd(**kw)
    gd.encode_cond = lambda params, cond: cond  # passthrough features

    def apply_model(params, x, cond, t, cond_feat=None):
        if target is not None:
            return jnp.broadcast_to(target, x.shape)
        return cond_feat  # echo the (partitioned) conditioning image

    gd.apply_model = apply_model
    return gd


def test_ddpm_plain_oracle_lands_on_target():
    target = jnp.full((1, 8, 8, 1), 1.25)
    gd = oracle_gd(target=target)
    cond = jnp.zeros((1, 8, 8, 1))
    out = S.ddpm_sample_plain(gd, {}, cond, KEY, MMV)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), rtol=1e-5)


def test_ddpm_plain_real_unet_shapes_and_jit():
    gd = tiny_gd()
    params = gd.init_params(KEY)
    cond = jnp.zeros((2, 8, 8, 1))
    fn = jax.jit(lambda p, c, k: S.ddpm_sample_plain(gd, p, c, k, MMV))
    out = fn(params, cond, KEY)
    assert out.shape == (2, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
    # clip_denoised keeps the chain in a sane range at t=0
    assert float(out.min()) >= MMV[0] - 1e-5 and float(out.max()) <= MMV[1] + 1e-5


def _left_mask(b=1, s=8, cols=3):
    m = np.zeros((b, s, s, 1), np.float32)
    m[:, :, :cols, :] = 1.0
    return jnp.asarray(m)


def test_ddpm_branched_oracle_reconstructs_cond():
    """With an echo oracle, fused local diffusion returns exactly
    cond·m + cond·(1−m) = cond."""
    gd = oracle_gd()
    cond = jnp.asarray(
        np.random.default_rng(0).uniform(0.2, 1.8, (1, 8, 8, 1)).astype(np.float32)
    )
    mask = _left_mask()
    scfg = SamplerConfig(start_timestep=2, mask_x=True, mask_x_policy="cond",
                         cond_in_floor=0.5)
    out = S.ddpm_sample_branched(gd, {}, cond, mask, KEY, scfg, MMV)
    np.testing.assert_allclose(np.asarray(out), np.asarray(cond), rtol=1e-4, atol=1e-5)


def test_ddpm_branched_no_intermediate_returns_pair():
    gd = oracle_gd()
    cond = jnp.ones((1, 8, 8, 1))
    mask = _left_mask()
    scfg = SamplerConfig(start_intermediate=False)
    out = S.ddpm_sample_branched(gd, {}, cond, mask, KEY, scfg, MMV)
    assert out.shape == (2, 1, 8, 8, 1)


def test_ddpm_branched_real_unet_jits():
    gd = tiny_gd()
    params = gd.init_params(KEY)
    cond = jnp.ones((1, 8, 8, 1))
    mask = _left_mask()
    scfg = SamplerConfig(start_timestep=2)
    fn = jax.jit(
        lambda p, c, m, k: S.ddpm_sample_branched(gd, p, c, m, k, scfg, MMV)
    )
    out = fn(params, cond, mask, KEY)
    assert out.shape == (1, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_uniform_mask_bypasses_branching():
    """Detector found nothing → plain chain (reference ddpm.py:1110-1117)."""
    target = jnp.full((1, 8, 8, 1), 0.75)
    gd = oracle_gd(target=target)
    cond = jnp.zeros((1, 8, 8, 1))
    ones_mask = jnp.ones((1, 8, 8, 1))
    scfg = SamplerConfig()
    out = S.sample(gd, {}, cond, KEY, scfg, MMV, mask=ones_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), rtol=1e-5)


def test_use_gt_shortens_chain():
    gd = tiny_gd(timesteps=20)
    params = gd.init_params(KEY)
    cond = jnp.zeros((1, 8, 8, 1))
    gt = jnp.full((1, 8, 8, 1), 1.0)
    out = S.ddpm_sample_plain(gd, params, cond, KEY, MMV, gt=gt, use_gt_timestep=5)
    assert out.shape == (1, 8, 8, 1)


def test_ddim_times_grid():
    ts = S.ddim_times(250, 50)
    assert ts[0] == 249 and ts[-1] == -1
    assert len(ts) == 51
    assert all(ts[i] > ts[i + 1] for i in range(len(ts) - 1))


def test_ddim_plain_oracle_lands_on_target():
    target = jnp.full((1, 8, 8, 1), 1.5)
    gd = oracle_gd(target=target, timesteps=20, sampling_timesteps=5)
    assert gd.is_ddim_sampling
    cond = jnp.zeros((1, 8, 8, 1))
    out = S.ddim_sample_plain(gd, {}, cond, KEY, MMV)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), rtol=1e-5)


def test_ddim_branched_oracle():
    gd = oracle_gd(timesteps=20, sampling_timesteps=5)
    cond = jnp.asarray(
        np.random.default_rng(1).uniform(0.2, 1.8, (1, 8, 8, 1)).astype(np.float32)
    )
    mask = _left_mask()
    scfg = SamplerConfig(start_timestep=1)
    out = S.ddim_sample_branched(gd, {}, cond, mask, KEY, scfg, MMV)
    assert out.shape == (1, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
    # inside the OOD mask the echo oracle pins the output to cond
    m = np.asarray(_left_mask())[0, :, :, 0].astype(bool)
    np.testing.assert_allclose(
        np.asarray(out)[0, :, :, 0][m], np.asarray(cond)[0, :, :, 0][m], rtol=1e-4
    )


def test_fuse_noisy_states_routes():
    m = jnp.asarray([[1.0, 0.0]])
    x_out = jnp.asarray([[0.5, 0.0]])  # masked: zero outside
    x_in = jnp.asarray([[0.0, 0.7]])  # masked: zero inside
    zs = S.fuse_noisy_states(x_out, x_in, m, "zero_sentinel")
    np.testing.assert_allclose(np.asarray(zs), [[0.5, 0.7]])
    mk = S.fuse_noisy_states(x_out, x_in, m, "mask")
    np.testing.assert_allclose(np.asarray(mk), [[0.5, 0.7]])
    # a genuinely-zero pixel inside the mask is misrouted by the sentinel
    x_out2 = jnp.asarray([[0.0, 0.0]])
    x_in2 = jnp.asarray([[0.9, 0.7]])  # unmasked value leaks through
    zs2 = S.fuse_noisy_states(x_out2, x_in2, m, "zero_sentinel")
    np.testing.assert_allclose(np.asarray(zs2), [[0.9, 0.7]])
    mk2 = S.fuse_noisy_states(x_out2, x_in2, m, "mask")
    np.testing.assert_allclose(np.asarray(mk2), [[0.0, 0.7]])


def test_partition_cond_floors():
    cond = jnp.ones((1, 2, 2, 1))
    m = jnp.zeros((1, 2, 2, 1)).at[0, 0, 0, 0].set(1.0)
    cond_out, cond_in = S.partition_cond(cond, m, 0.5)
    assert float(cond_out[0, 0, 0, 0]) == 1.0
    assert float(cond_out[0, 1, 1, 0]) == 0.0
    assert float(cond_in[0, 0, 0, 0]) == 0.5  # floor keeps OOD info
    assert float(cond_in[0, 1, 1, 0]) == 1.0


def test_classifier_gate_accept_vs_reject():
    gd = oracle_gd()
    cond = jnp.asarray(
        np.random.default_rng(2).uniform(0.2, 1.8, (1, 8, 8, 1)).astype(np.float32)
    )
    mask = _left_mask()
    scfg = SamplerConfig(start_timestep=4, classifier=True)

    always_accept = lambda xs, t: jnp.ones((xs.shape[0],))
    always_reject = lambda xs, t: -jnp.ones((xs.shape[0],))

    out_a = S.ddpm_sample_branched(
        gd, {}, cond, mask, KEY, scfg, MMV, classifier_fn=always_accept
    )
    out_r = S.ddpm_sample_branched(
        gd, {}, cond, mask, KEY, scfg, MMV, classifier_fn=always_reject
    )
    assert out_a.shape == out_r.shape == (1, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out_a))) and bool(jnp.all(jnp.isfinite(out_r)))
    # with the echo oracle both converge to cond regardless of gating
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(cond), rtol=1e-4, atol=1e-5)


def test_classifier_gate_per_sample_and_fusion_time():
    """B=2 where the gate accepts sample 0 immediately and sample 1 never:
    acceptance is per-sample (reference decision is per-image, batch-1 loop)
    and fusion_time records the first-acceptance t."""
    gd = oracle_gd()
    cond = jnp.asarray(
        np.random.default_rng(7).uniform(0.2, 1.8, (2, 8, 8, 1)).astype(np.float32)
    )
    mask = _left_mask(b=2)
    s = 4
    scfg = SamplerConfig(start_timestep=s, classifier=True)

    def split_gate(xs, t):
        return jnp.asarray([1.0, -1.0])  # sample 0 accepts, sample 1 rejects

    out, ft = S.ddpm_sample_branched(
        gd, {}, cond, mask, KEY, scfg, MMV, classifier_fn=split_gate,
        return_fusion_time=True,
    )
    assert out.shape == (2, 8, 8, 1)
    ft = np.asarray(ft)
    # sample 0 accepted at the first gated step (t = s-1); sample 1 only at
    # the forced t == 0 acceptance
    assert ft[0] == s - 1
    assert ft[1] == 0
    # both still converge to cond under the echo oracle
    np.testing.assert_allclose(np.asarray(out), np.asarray(cond), rtol=1e-4, atol=1e-5)


def test_classifier_gate_retry_budget():
    """max_classifier_retries bounds per-sample rejections: with budget 2,
    an always-rejecting gate is force-accepted after 2 rejected steps."""
    gd = oracle_gd()
    cond = jnp.asarray(
        np.random.default_rng(8).uniform(0.2, 1.8, (1, 8, 8, 1)).astype(np.float32)
    )
    mask = _left_mask()
    s = 6
    always_reject = lambda xs, t: -jnp.ones((xs.shape[0],))
    scfg = SamplerConfig(start_timestep=s, classifier=True,
                         max_classifier_retries=2)
    _, ft = S.ddpm_sample_branched(
        gd, {}, cond, mask, KEY, scfg, MMV, classifier_fn=always_reject,
        return_fusion_time=True,
    )
    # steps t = s-1, s-2 rejected; budget hit at t = s-3
    assert int(np.asarray(ft)[0]) == s - 3
    # budget 0 = unbounded (reference): only the t == 0 forced accept fires
    scfg0 = SamplerConfig(start_timestep=s, classifier=True,
                          max_classifier_retries=0)
    _, ft0 = S.ddpm_sample_branched(
        gd, {}, cond, mask, KEY, scfg0, MMV, classifier_fn=always_reject,
        return_fusion_time=True,
    )
    assert int(np.asarray(ft0)[0]) == 0


def test_reconcile_forces_mask_x_for_detector_runs():
    """ood_AD/ood_confidence force mask_cond/mask_x on (reference
    ddpm.py:1106-1108); a manual run keeps its flags."""
    scfg = SamplerConfig(ood_ad=True, mask_x=False, mask_cond=False)
    r = S.reconcile(scfg)
    assert r.mask_x and r.mask_cond
    scfg2 = SamplerConfig(ood_ad=False, ood_confidence=True, mask_x=False)
    r2 = S.reconcile(scfg2)
    assert r2.mask_x and r2.mask_cond
    scfg3 = SamplerConfig(ood_ad=False, ood_confidence=False, mask_x=False)
    assert S.reconcile(scfg3) is scfg3


def test_reconcile_fixes_unmasked_fusion_corruption():
    """With ood_ad=True but mask_x=False in the YAML, fusion must still see a
    mask_x-masked OOD branch — x_start = xs_in·(1−m) + xs_out would otherwise
    add the full-image OOD estimate (the reference silently overrides the
    flag, ddpm.py:1106-1108)."""
    gd = oracle_gd()
    cond = jnp.asarray(
        np.random.default_rng(9).uniform(0.2, 1.8, (1, 8, 8, 1)).astype(np.float32)
    )
    mask = _left_mask()
    scfg = SamplerConfig(start_timestep=2, mask_x=False, ood_ad=True)
    out = S.ddpm_sample_branched(gd, {}, cond, mask, KEY, scfg, MMV)
    # the echo oracle reconstructs cond exactly only when the OOD branch was
    # masked before fusion
    np.testing.assert_allclose(np.asarray(out), np.asarray(cond), rtol=1e-4, atol=1e-5)


def test_ddim_branched_terminal_pair_returns_branch_pair():
    """When fusion lands on the terminal DDIM pair (t_next < 0), the
    reference returns the UNFUSED branch pair (ddpm.py:1007-1011 checks
    time_next before the fusion predicate)."""
    gd = oracle_gd(timesteps=20, sampling_timesteps=5)
    cond = jnp.ones((1, 8, 8, 1))
    mask = _left_mask()
    # start_timestep=0 → fuse_time = times[-2] = t of the terminal pair
    # (t_next = -1): return the unfused pair
    scfg = SamplerConfig(start_timestep=0)
    out = S.ddim_sample_branched(gd, {}, cond, mask, KEY, scfg, MMV)
    assert out.shape == (2, 1, 8, 8, 1)
    # start_timestep=-1 → fuse_time = -1 sits below every pair: the fusion
    # predicate never fires and the chain stays branched (also returns the
    # pair via the branched terminal step)
    scfg_m1 = SamplerConfig(start_timestep=-1)
    out2 = S.ddim_sample_branched(gd, {}, cond, mask, KEY, scfg_m1, MMV)
    assert out2.shape == (2, 1, 8, 8, 1)


def test_interpolate():
    target = jnp.full((1, 8, 8, 1), 1.0)
    gd = oracle_gd(target=target)
    x1 = jnp.zeros((1, 8, 8, 1))
    x2 = jnp.full((1, 8, 8, 1), 2.0)
    cond = jnp.zeros((1, 8, 8, 1))
    out = S.interpolate(gd, {}, x1, x2, cond, KEY, MMV, t=5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), rtol=1e-5)


def test_branched_return_all_no_intermediate():
    gd = oracle_gd(timesteps=6)
    cond = jnp.ones((1, 8, 8, 1))
    mask = _left_mask()
    scfg = SamplerConfig(start_intermediate=False)
    final, ys = S.ddpm_sample_branched(
        gd, {}, cond, mask, KEY, scfg, MMV, return_all=True
    )
    assert final.shape == (2, 1, 8, 8, 1)
    # T+1 frames incl. the initial noise (imgs = [img], ddpm.py:946)
    assert ys.shape == (7, 2, 1, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(ys[0][0]), np.asarray(ys[0][1]))
    np.testing.assert_allclose(np.asarray(ys[-1]), np.asarray(final))


def test_branched_return_all_with_fusion():
    """Full 3-phase branched DDPM under return_all: T+1 frames — initial
    noise, (OOD, IND) pair frames while branched, duplicated fused frames
    after fusion — and the chain itself is unchanged (the reference collects
    per-step frames at ddpm.py:946, 964-969)."""
    T, s = 8, 3
    gd = oracle_gd(timesteps=T)
    cond = jnp.asarray(
        np.random.default_rng(11).uniform(0.2, 1.8, (1, 8, 8, 1)).astype(np.float32)
    )
    mask = _left_mask()
    scfg = SamplerConfig(start_timestep=s)
    final, frames = S.ddpm_sample_branched(
        gd, {}, cond, mask, KEY, scfg, MMV, return_all=True
    )
    assert frames.shape == (T + 1, 2, 1, 8, 8, 1)
    f = np.asarray(frames)
    np.testing.assert_allclose(f[0][0], f[0][1])  # init noise duplicated
    assert not np.allclose(f[1][0], f[1][1])  # phase A: branches diverge
    np.testing.assert_allclose(f[-1][0], f[-1][1])  # fused: duplicated
    np.testing.assert_allclose(f[-1][0], np.asarray(final))
    # frame collection must not perturb the chain
    final2 = S.ddpm_sample_branched(gd, {}, cond, mask, KEY, scfg, MMV)
    np.testing.assert_allclose(np.asarray(final), np.asarray(final2))


def test_ddim_branched_return_all():
    """Branched DDIM under return_all: S+1 frames over the strided grid,
    final frame == returned image, chain unchanged (ddpm.py:1073)."""
    gd = oracle_gd(timesteps=10, sampling_timesteps=5)
    cond = jnp.asarray(
        np.random.default_rng(12).uniform(0.2, 1.8, (1, 8, 8, 1)).astype(np.float32)
    )
    mask = _left_mask()
    scfg = SamplerConfig(start_timestep=1)
    final, frames = S.ddim_sample_branched(
        gd, {}, cond, mask, KEY, scfg, MMV, return_all=True
    )
    assert frames.shape == (6, 2, 1, 8, 8, 1)
    f = np.asarray(frames)
    np.testing.assert_allclose(f[0][0], f[0][1])
    np.testing.assert_allclose(f[-1][0], np.asarray(final))
    final2 = S.ddim_sample_branched(gd, {}, cond, mask, KEY, scfg, MMV)
    np.testing.assert_allclose(np.asarray(final), np.asarray(final2))


def _oracle_pair(target, timesteps, auto_normalize):
    from localdiffusion_tpu.config import DiffusionConfig, ModelConfig

    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=1)
    dcfg = DiffusionConfig(
        image_size=8, timesteps=timesteps, objective="pred_x0",
        auto_normalize=auto_normalize,
    )
    gd = GaussianDiffusion(mcfg, dcfg)
    gd.encode_cond = lambda params, cond: cond
    gd.apply_model = (
        lambda params, x, cond, t, cond_feat=None: jnp.broadcast_to(target, x.shape)
    )
    return gd


def test_auto_normalize_unnormalizes_at_sampler_exit():
    """auto_normalize=True must unnormalize at every sampler exit (reference
    ddpm.py:619-620, 972, 1074).  The reverse chain itself never touches
    auto_normalize, so out_auto == (out_raw + 1) / 2 bit-for-bit per path —
    the round-trip inverse of the loss-side [0,1]→[-1,1] normalization."""
    target = jnp.full((1, 8, 8, 1), 0.8)
    raw, auto = _oracle_pair(target, 6, False), _oracle_pair(target, 6, True)
    cond = jnp.asarray(
        np.random.default_rng(13).uniform(0.2, 1.8, (1, 8, 8, 1)).astype(np.float32)
    )
    mask = _left_mask()
    scfg = SamplerConfig(start_timestep=2)

    def unn(x):
        return (np.asarray(x) + 1.0) / 2.0

    out_r = S.ddpm_sample_plain(raw, {}, cond, KEY, MMV)
    out_a = S.ddpm_sample_plain(auto, {}, cond, KEY, MMV)
    np.testing.assert_allclose(np.asarray(out_a), unn(out_r), rtol=1e-6)

    out_r = S.ddpm_sample_branched(raw, {}, cond, mask, KEY, scfg, MMV)
    out_a = S.ddpm_sample_branched(auto, {}, cond, mask, KEY, scfg, MMV)
    np.testing.assert_allclose(np.asarray(out_a), unn(out_r), rtol=1e-6)

    raw_d, auto_d = _oracle_pair(target, 10, False), _oracle_pair(target, 10, True)
    raw_d.sampling_timesteps = auto_d.sampling_timesteps = 5
    out_r = S.ddim_sample_plain(raw_d, {}, cond, KEY, MMV)
    out_a = S.ddim_sample_plain(auto_d, {}, cond, KEY, MMV)
    np.testing.assert_allclose(np.asarray(out_a), unn(out_r), rtol=1e-6)

    out_r = S.ddim_sample_branched(raw_d, {}, cond, mask, KEY, scfg, MMV)
    out_a = S.ddim_sample_branched(auto_d, {}, cond, mask, KEY, scfg, MMV)
    np.testing.assert_allclose(np.asarray(out_a), unn(out_r), rtol=1e-6)

    # return_all frames are unnormalized too
    _, fr_r = S.ddpm_sample_plain(raw, {}, cond, KEY, MMV, return_all=True)
    _, fr_a = S.ddpm_sample_plain(auto, {}, cond, KEY, MMV, return_all=True)
    np.testing.assert_allclose(np.asarray(fr_a), unn(fr_r), rtol=1e-6)


def test_gated_always_accept_matches_ungated():
    """With a gate that always accepts, the classifier-gated chain must be
    BIT-IDENTICAL to the ungated chain: the first gated step selects the
    plain step, every later step takes the latched lax.cond fast path (the
    reference pays the classifier only until classifier_flag latches,
    ddpm.py:883-916)."""
    gd = oracle_gd()
    cond = jnp.asarray(
        np.random.default_rng(14).uniform(0.2, 1.8, (2, 8, 8, 1)).astype(np.float32)
    )
    mask = _left_mask(b=2)
    always_accept = lambda xs, t: jnp.ones((xs.shape[0],))
    out_g = S.ddpm_sample_branched(
        gd, {}, cond, mask, KEY, SamplerConfig(start_timestep=4, classifier=True),
        MMV, classifier_fn=always_accept,
    )
    out_u = S.ddpm_sample_branched(
        gd, {}, cond, mask, KEY, SamplerConfig(start_timestep=4), MMV
    )
    np.testing.assert_array_equal(np.asarray(out_g), np.asarray(out_u))


def test_branched_debug_capture():
    gd = oracle_gd()
    cond = jnp.asarray(
        np.random.default_rng(3).uniform(0.2, 1.8, (1, 8, 8, 1)).astype(np.float32)
    )
    mask = _left_mask()
    scfg = SamplerConfig(start_timestep=2)
    out, dbg = S.ddpm_sample_branched(
        gd, {}, cond, mask, KEY, scfg, MMV, return_debug=True
    )
    assert set(dbg) == {
        "pred_out", "pred_in", "pred_concat", "x_out", "x_in", "fusion_time"
    }
    # x_out is zero outside the mask; x_in zero inside (reference assert,
    # ddpm.py:790)
    mnp = np.asarray(mask).astype(bool)
    assert np.all(np.asarray(dbg["x_out"])[~mnp] == 0.0)
    assert np.all(np.asarray(dbg["x_in"])[mnp] == 0.0)


def test_branched_three_channel_mvtec_shape():
    """3-channel (MVTec) branched sampling — exercises multi-channel masks."""
    mcfg = ModelConfig(
        dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=3,
    )
    dcfg = DiffusionConfig(image_size=8, timesteps=6)
    gd = GaussianDiffusion(mcfg, dcfg)
    params = gd.init_params(KEY)
    cond = jnp.asarray(
        np.random.default_rng(5).uniform(0, 2, (2, 8, 8, 3)).astype(np.float32)
    )
    mask = _left_mask(b=2)  # [B, H, W, 1] broadcasts over channels
    scfg = SamplerConfig(start_timestep=1, cond_in_floor=0.95)
    out = S.ddpm_sample_branched(gd, params, cond, mask, KEY, scfg, MMV)
    assert out.shape == (2, 8, 8, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_sampling_determinism_fixed_key():
    """Same params+inputs+key → identical outputs (the reference pins seeds
    for reproducibility, test.py:39-45, ddpm.py:934)."""
    gd = tiny_gd()
    params = gd.init_params(KEY)
    cond = jnp.ones((1, 8, 8, 1)) * 0.7
    mask = _left_mask()
    scfg = SamplerConfig(start_timestep=2)
    a = S.ddpm_sample_branched(gd, params, cond, mask, KEY, scfg, MMV)
    b = S.ddpm_sample_branched(gd, params, cond, mask, KEY, scfg, MMV)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = S.ddpm_sample_branched(
        gd, params, cond, mask, jax.random.PRNGKey(99), scfg, MMV
    )
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_offset_noise_active_when_configured():
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=1)
    base = DiffusionConfig(image_size=8, timesteps=10)
    with_off = DiffusionConfig(image_size=8, timesteps=10, offset_noise_strength=0.5)
    gd0 = GaussianDiffusion(mcfg, base)
    gd1 = GaussianDiffusion(mcfg, with_off)
    params = gd0.init_params(KEY)
    x = jnp.ones((2, 8, 8, 1))
    cond = jnp.ones((2, 8, 8, 1))
    l0 = gd0.loss(params, KEY, x, cond)
    l1 = gd1.loss(params, KEY, x, cond)
    assert float(l0) != float(l1)  # offset noise changes the target path
