"""OOD front-end tests: PatchCore math vs torch oracles, coreset, ladders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localdiffusion_tpu.config import Config, DataConfig, OODConfig
from localdiffusion_tpu.ood import (
    PatchCore,
    compute_anomaly_score,
    euclidean_dist,
    kcenter_greedy_indices,
    ladder_for,
    manual_mask,
    nearest_neighbors,
    soft_mask_from_map,
    subsample_embedding,
)
from localdiffusion_tpu.ood.patchcore import avg_pool_3x3
from localdiffusion_tpu.ood.thresholds import LADDERS

KEY = jax.random.PRNGKey(0)


def test_euclidean_dist_matches_torch_oracle():
    """Oracle: the reference's matmul identity (models.py:178-198)."""
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 5)).astype(np.float32)
    y = rng.standard_normal((11, 5)).astype(np.float32)
    got = np.asarray(euclidean_dist(jnp.asarray(x), jnp.asarray(y)))
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    x_norm = xt.pow(2).sum(dim=-1, keepdim=True)
    y_norm = yt.pow(2).sum(dim=-1, keepdim=True)
    want = (x_norm - 2 * torch.matmul(xt, yt.T) + y_norm.T).clamp_min(0).sqrt()
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)


def test_nearest_neighbors_min_and_topk():
    bank = jnp.asarray(np.eye(4, dtype=np.float32))
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0], [0.0, 0.9, 0.0, 0.0]])
    scores, locs = nearest_neighbors(q, bank, 1)
    assert locs.tolist() == [0, 1]
    assert float(scores[0]) == pytest.approx(0.0, abs=1e-6)
    scores3, locs3 = nearest_neighbors(q, bank, 3)
    assert scores3.shape == (2, 3) and locs3.shape == (2, 3)
    assert locs3[0, 0] == 0
    # ascending distances
    assert bool(jnp.all(scores3[:, 1:] >= scores3[:, :-1]))


def test_avg_pool_3x3_matches_torch():
    import torch

    x = np.random.default_rng(1).standard_normal((1, 6, 6, 2)).astype(np.float32)
    got = np.asarray(avg_pool_3x3(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch.nn.AvgPool2d(3, 1, 1)(xt).permute(0, 2, 3, 1)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)


def test_kcenter_greedy_spreads():
    """Coreset must cover clusters, not sample one densely."""
    rng = np.random.default_rng(2)
    c1 = rng.normal(0, 0.05, (50, 8))
    c2 = rng.normal(5, 0.05, (50, 8))
    c3 = rng.normal(-5, 0.05, (20, 8))
    emb = jnp.asarray(np.concatenate([c1, c2, c3]).astype(np.float32))
    idx = np.asarray(kcenter_greedy_indices(emb, 6, KEY))
    groups = set()
    for i in idx:
        groups.add(0 if i < 50 else (1 if i < 100 else 2))
    assert groups == {0, 1, 2}
    assert len(set(idx.tolist())) == 6  # distinct picks


def test_subsample_embedding_ratio():
    emb = jnp.asarray(np.random.default_rng(3).standard_normal((40, 4)), jnp.float32)
    bank = subsample_embedding(emb, 0.25, KEY)
    assert bank.shape == (10, 4)


def test_compute_anomaly_score_reweighting():
    rng = np.random.default_rng(4)
    bank = jnp.asarray(rng.standard_normal((30, 6)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((2 * 9, 6)).astype(np.float32))
    ps, locs = nearest_neighbors(emb, bank, 1)
    ps_b = ps.reshape(2, 9)
    locs_b = locs.reshape(2, 9)
    score9 = compute_anomaly_score(ps_b, locs_b, emb, bank, num_neighbors=9)
    score1 = compute_anomaly_score(ps_b, locs_b, emb, bank, num_neighbors=1)
    assert score9.shape == (2,)
    # reweighting shrinks (weights ≤ 1) relative to the raw max patch score
    assert bool(jnp.all(score9 <= score1 + 1e-6))


@pytest.mark.slow
def test_patchcore_end_to_end_tiny():
    """Full pipeline with random backbone weights at small resolution:
    normal-vs-anomalous separation must still emerge from feature NN."""
    cfg = OODConfig(input_size=64, num_neighbors=3, coreset_ratio=0.5)
    pc = PatchCore(cfg, rng=KEY)
    rng = np.random.default_rng(5)
    normal = rng.uniform(0.4, 0.6, (4, 64, 64, 3)).astype(np.float32)
    pc.build_memory_bank([normal])
    assert pc.memory_bank is not None and pc.memory_bank.shape[0] > 0

    test_normal = rng.uniform(0.4, 0.6, (1, 64, 64, 3)).astype(np.float32)
    anom = test_normal.copy()
    anom[:, 10:30, 10:30, :] = 3.0  # strong local perturbation
    out_n = pc(jnp.asarray(test_normal))
    out_a = pc(jnp.asarray(anom))
    assert out_n["anomaly_map"].shape == (1, 64, 64, 1)
    assert float(out_a["pred_score"][0]) > float(out_n["pred_score"][0])
    assert float(out_a["anomaly_map"].max()) > float(out_n["anomaly_map"].max())


def test_threshold_ladders_cover_reference_cases():
    assert set(LADDERS) == {
        ("mnist", "8to3"),
        ("mnist", "8to5"),
        ("mri", "t12flair"),
        ("mri", "flair2t1"),
        ("mvtec", "transistor"),
        ("mvtec", "toothbrush"),
        ("mvtec", "grid"),
    }
    # reference test.py:253-259 rungs
    lad = ladder_for("mnist", "8to3")
    assert lad.resolve_threshold(45.0, 2.0) == 41.7
    assert lad.resolve_threshold(41.0, 2.0) == 38.2
    assert lad.resolve_threshold(38.0, 2.0) == 35.0
    assert lad.resolve_threshold(30.0, 2.0) is None  # below gate
    # mri dynamic rung: max-12 (test.py:293-294)
    mri = ladder_for("mri", "t12flair")
    assert mri.resolve_threshold(70.0, 3.0) == 70.0 - 12
    # mvtec std-relative rung (test.py:336)
    tr = ladder_for("mvtec", "transistor")
    assert tr.resolve_threshold(37.0, 2.0) == pytest.approx(37.0 - 4.0)


def test_soft_mask_construction():
    amap = np.zeros((1, 8, 8, 1), np.float32)
    amap[0, :, :2, 0] = 50.0  # clear anomaly on the left
    amap[0, :, 2:, 0] = 20.0
    mask, binary = soft_mask_from_map(amap, ladder_for("mnist", "8to3"))
    assert binary[0, 0, 0, 0] == 1.0 and binary[0, 0, 5, 0] == 0.0
    assert mask.max() == 1.0 and mask.min() >= 0.0
    # squared ramp: soft values strictly below 1 outside the core
    assert mask[0, 0, 5, 0] < 1.0


def test_soft_mask_uniform_when_below_gate():
    amap = np.full((1, 8, 8, 1), 10.0, np.float32)
    mask, binary = soft_mask_from_map(amap, ladder_for("mnist", "8to3"))
    assert (mask == 1.0).all() and (binary == 1.0).all()


def test_manual_mask_matches_reference_override():
    m = manual_mask((1, 28, 28, 1), 7)
    assert m[:, :, :7, :].min() == 1.0
    assert m[:, :, 7:, :].max() == 0.0
