"""Unit tests for pure diffusion math vs the reference formulas (torch oracle)."""

import numpy as np
import pytest
import torch

from localdiffusion_tpu.ops import diffusion_math as dm
from localdiffusion_tpu.ops import make_schedule

T = 250
B, H, W, C = 4, 8, 8, 1


@pytest.fixture(scope="module")
def sched():
    return make_schedule(T, beta_schedule="sigmoid", objective="pred_x0")


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


def _extract_torch(a, t, x_shape):
    a = torch.from_numpy(np.asarray(a))
    t = torch.from_numpy(t)
    out = a.gather(-1, t)
    return out.reshape(t.shape[0], *((1,) * (len(x_shape) - 1))).numpy()


def test_extract(sched):
    t = np.array([0, 10, 100, 249], dtype=np.int64)
    got = dm.extract(sched.sqrt_alphas_cumprod, t, 4)
    want = _extract_torch(sched.sqrt_alphas_cumprod, t, (B, H, W, C))
    np.testing.assert_allclose(got, want, rtol=1e-7)
    assert got.shape == (4, 1, 1, 1)


def test_q_sample_roundtrip(sched):
    """predict_start_from_noise(q_sample(x0, t, eps), t, eps) == x0."""
    x0 = _rand((B, H, W, C), 0)
    eps = _rand((B, H, W, C), 1)
    t = np.array([3, 50, 150, 240], dtype=np.int32)
    xt = dm.q_sample(sched, x0, t, eps)
    x0_rec = dm.predict_start_from_noise(sched, xt, t, eps)
    np.testing.assert_allclose(np.asarray(x0_rec), x0, rtol=2e-4, atol=2e-4)


def test_noise_from_start_roundtrip(sched):
    x0 = _rand((B, H, W, C), 2)
    eps = _rand((B, H, W, C), 3)
    t = np.array([5, 60, 170, 200], dtype=np.int32)
    xt = dm.q_sample(sched, x0, t, eps)
    eps_rec = dm.predict_noise_from_start(sched, xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_rec), eps, rtol=2e-3, atol=2e-3)


def test_v_parameterization_roundtrip(sched):
    x0 = _rand((B, H, W, C), 4)
    eps = _rand((B, H, W, C), 5)
    t = np.array([10, 80, 120, 230], dtype=np.int32)
    xt = dm.q_sample(sched, x0, t, eps)
    v = dm.predict_v(sched, x0, t, eps)
    x0_rec = dm.predict_start_from_v(sched, xt, t, v)
    np.testing.assert_allclose(np.asarray(x0_rec), x0, rtol=2e-4, atol=2e-4)


def test_q_posterior_against_formula(sched):
    x0 = _rand((B, H, W, C), 6)
    xt = _rand((B, H, W, C), 7)
    t = np.array([1, 20, 100, 249], dtype=np.int32)
    mean, var, logvar = dm.q_posterior(sched, x0, xt, t)
    c1 = np.asarray(sched.posterior_mean_coef1)[t].reshape(-1, 1, 1, 1)
    c2 = np.asarray(sched.posterior_mean_coef2)[t].reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(mean), c1 * x0 + c2 * xt, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(var),
        np.asarray(sched.posterior_variance)[t].reshape(-1, 1, 1, 1),
    )
    np.testing.assert_allclose(
        np.asarray(logvar),
        np.asarray(sched.posterior_log_variance_clipped)[t].reshape(-1, 1, 1, 1),
    )


def test_model_output_conversion_objectives():
    x0 = _rand((B, H, W, C), 8)
    eps = _rand((B, H, W, C), 9)
    t = np.array([10, 80, 120, 230], dtype=np.int32)
    for obj in ("pred_x0", "pred_noise", "pred_v"):
        s = make_schedule(T, objective=obj)
        xt = dm.q_sample(s, x0, t, eps)
        if obj == "pred_x0":
            out = x0
        elif obj == "pred_noise":
            out = eps
        else:
            out = np.asarray(dm.predict_v(s, x0, t, eps))
        x0_rec = dm.model_output_to_x_start(s, out, xt, t)
        np.testing.assert_allclose(np.asarray(x0_rec), x0, rtol=2e-4, atol=2e-4)


def test_normalize_helpers():
    x = np.linspace(0, 1, 11, dtype=np.float32)
    y = dm.normalize_to_neg_one_to_one(x)
    np.testing.assert_allclose(np.asarray(dm.unnormalize_to_zero_to_one(y)), x, rtol=1e-6)
