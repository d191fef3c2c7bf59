"""Observability utils tests."""

import os

import numpy as np

from localdiffusion_tpu.utils.logging import CsvLogger, Timer


def test_csv_logger_appends(tmp_path):
    p = str(tmp_path / "m.csv")
    log = CsvLogger(p, ["step", "loss"])
    log.log(step=0, loss=1.5)
    log.log(step=1, loss=1.2)
    log.close()
    # append across instances (vs the reference rewriting the whole frame)
    log2 = CsvLogger(p, ["step", "loss"])
    log2.log(step=2, loss=1.0)
    log2.close()
    lines = open(p).read().strip().splitlines()
    assert lines[0] == "step,loss"
    assert len(lines) == 4


def test_timer_records():
    t = Timer()
    with t.time("phase"):
        sum(range(1000))
    with t.time("phase"):
        sum(range(1000))
    assert len(t.records["phase"]) == 2
    assert np.isfinite(t.mean("phase"))
    assert "phase" in t.summary()


def test_params_npz_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from localdiffusion_tpu.config import DiffusionConfig, ModelConfig
    from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from localdiffusion_tpu.utils.params_io import load_params_npz, save_params_npz

    gd = GaussianDiffusion(
        ModelConfig(dim=8, dim_mults=(1, 2), channels=1, full_attn=(False, True)),
        DiffusionConfig(image_size=8, timesteps=10),
    )
    params = gd.init_params(jax.random.PRNGKey(0))
    p = str(tmp_path / "snap.npz")
    save_params_npz(p, params)
    got = load_params_npz(p, jax.tree.map(jnp.zeros_like, params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4)
    # structure mismatch raises
    import pytest

    bad = {"params": {"nope": np.zeros((2,))}}
    with pytest.raises(KeyError):
        load_params_npz(p, bad)
