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


def test_soft_mask_batch_per_image():
    """B=2 mixing anomalous + normal: per-image statistics — one image gets a
    real mask, the other uniform ones; a batch-global max would leak the
    anomalous image's scale into the normal one (reference computes these
    per image in its batch-1 loop, test.py:190)."""
    amap = np.zeros((2, 8, 8, 1), np.float32)
    amap[0, :, :2, 0] = 50.0  # anomalous image
    amap[0, :, 2:, 0] = 20.0
    amap[1] = 10.0  # normal image, below the 8to3 gate of 37
    mask, binary = soft_mask_from_map(amap, ladder_for("mnist", "8to3"))
    assert binary[0, 0, 0, 0] == 1.0 and binary[0, 0, 5, 0] == 0.0
    assert (mask[1] == 1.0).all() and (binary[1] == 1.0).all()
    # and the anomalous image's soft ramp is unaffected by the normal one
    solo_mask, solo_binary = soft_mask_from_map(
        amap[:1], ladder_for("mnist", "8to3")
    )
    np.testing.assert_array_equal(mask[:1], solo_mask)
    np.testing.assert_array_equal(binary[:1], solo_binary)


def test_ladder_default_fallback():
    from localdiffusion_tpu.ood.thresholds import DEFAULT_LADDER

    assert ladder_for("mvtec", "pill") is DEFAULT_LADDER
    with pytest.raises(KeyError):
        ladder_for("mvtec", "pill", default_ok=False)


def test_fit_ladder_statistics_and_roundtrip(tmp_path):
    from localdiffusion_tpu.ood.thresholds import fit_ladder, load_ladder, save_ladder

    rng = np.random.default_rng(6)
    normal_maps = [rng.normal(5.0, 1.0, (1, 8, 8, 1)).astype(np.float32)
                   for _ in range(16)]
    lad = fit_ladder(normal_maps, pixel_q=0.99, gate_q=1.0)
    maxima = [m.max() for m in normal_maps]
    assert lad.gate == pytest.approx(float(np.max(maxima)))
    allpix = np.concatenate([m.ravel() for m in normal_maps])
    assert lad.rungs[1].threshold == pytest.approx(
        float(np.quantile(allpix, 0.99))
    )
    # a normal-looking map stays below the gate → uniform mask
    assert lad.resolve_threshold(float(np.median(maxima)) - 1e-3, 1.0) is None
    # a marginal map (just above gate) fires the absolute rung
    marginal = lad.gate * 1.05
    assert lad.resolve_threshold(marginal, 1.0) == lad.rungs[1].threshold
    # a far-out map fires the relative max−1std rung
    assert lad.resolve_threshold(lad.gate * 2.0, 1.0) == pytest.approx(
        lad.gate * 2.0 - 1.0
    )
    # JSON round-trip
    p = tmp_path / "ladder.json"
    save_ladder(lad, str(p))
    lad2 = load_ladder(str(p))
    assert lad2 == lad


def test_fit_ladder_gate_quantile_robust_to_outlier():
    """gate_q < 1 makes the gate a quantile of the normal maxima instead of
    their max, so a single outlier normal image no longer sets it."""
    from localdiffusion_tpu.ood.thresholds import fit_ladder

    rng = np.random.default_rng(7)
    normal_maps = [rng.normal(5.0, 1.0, (1, 8, 8, 1)).astype(np.float32)
                   for _ in range(20)]
    outlier = normal_maps[0] + 100.0
    maps = [outlier] + normal_maps[1:]

    lad_max = fit_ladder(maps, gate_q=1.0)
    lad_rob = fit_ladder(maps, gate_q=0.9)
    maxima = [float(m.max()) for m in maps]
    assert lad_max.gate == pytest.approx(max(maxima))       # outlier-driven
    assert lad_rob.gate == pytest.approx(float(np.quantile(maxima, 0.9)))
    assert lad_rob.gate < 0.2 * lad_max.gate
    # without the outlier, gate_q=0.9 barely moves vs a fresh fit —
    # the robust gate is stable under refits while max is not
    lad_clean = fit_ladder(normal_maps[1:], gate_q=0.9)
    assert lad_rob.gate == pytest.approx(lad_clean.gate, rel=0.05)


def _run_fit_ladder_iou(normal, test_imgs, gt_masks):
    """Shared body: build bank from normals, fit ladder from normal maps,
    detect on anomalous images, return (all_fired, mean IoU vs gt).

    layers=('layer1','layer2'): with a RANDOM-INIT backbone the deeper
    layer2+layer3 features of the reference config lose spatial specificity
    (no ImageNet training to make them semantic), so the self-calibrating
    setup uses the shallower pair — finer stride, texture-level features.
    """
    from localdiffusion_tpu.ood.thresholds import fit_ladder

    cfg = OODConfig(input_size=64, num_neighbors=3, coreset_ratio=0.25,
                    layers=("layer1", "layer2"))
    pc = PatchCore(cfg, rng=KEY)
    pc.build_memory_bank([normal.astype(np.float32)])
    normal_maps = [
        np.asarray(pc(jnp.asarray(normal[i : i + 1]))["anomaly_map"])
        for i in range(len(normal))
    ]
    ladder = fit_ladder(normal_maps, pixel_q=0.999)

    ious, fired = [], []
    for i in range(len(test_imgs)):
        amap = np.asarray(pc(jnp.asarray(test_imgs[i : i + 1]))["anomaly_map"])
        _, binary = soft_mask_from_map(amap, ladder)
        fired.append(not bool((binary == 1.0).all()))
        gt = (gt_masks[i : i + 1] > 0).astype(np.float32)
        inter = float((binary * gt).sum())
        union = float(((binary + gt) > 0).sum())
        ious.append(inter / max(union, 1.0))
    return all(fired), float(np.mean(ious))


@pytest.mark.slow
def test_fit_ladder_localizes_synthetic_defect():
    """VERDICT-r1 acceptance gate for self-calibrating detection: with a
    random-init backbone, a ladder fitted from normal-set scores must still
    localize synthetic texture defects — mean mask-IoU ≥ 0.3 vs ground
    truth, and the gate must fire (non-uniform mask) on every defective
    image (measured here: mean IoU ≈ 0.56)."""
    from localdiffusion_tpu.data.synthetic import synthetic_textures

    normal, _ = synthetic_textures(8, size=64, seed=42, defect=False)
    test_imgs, gt_masks = synthetic_textures(4, size=64, seed=7, defect=True)
    fired, miou = _run_fit_ladder_iou(normal, test_imgs, gt_masks)
    assert fired, "gate must fire on every defective image"
    assert miou >= 0.3, f"mean IoU {miou:.3f} < 0.3"


@pytest.mark.slow
def test_fit_ladder_localizes_synthetic_tumor():
    """Same acceptance gate on synthetic brain lesions
    (synthetic_brain_translation(tumor=True); measured mean IoU ≈ 0.41):
    the strong lesion shifts the whole score distribution, exercising the
    relative max−1std rung."""
    from localdiffusion_tpu.data.synthetic import synthetic_brain_translation

    _, lr_n, _ = synthetic_brain_translation(8, 64, tumor=False, seed=42)
    _, lr_t, seg = synthetic_brain_translation(4, 64, tumor=True, seed=7)
    rep = lambda x: np.repeat(x, 3, axis=-1).astype(np.float32)
    fired, miou = _run_fit_ladder_iou(rep(lr_n), rep(lr_t), seg)
    assert fired, "gate must fire on every tumor image"
    assert miou >= 0.3, f"mean IoU {miou:.3f} < 0.3"


def test_manual_mask_matches_reference_override():
    m = manual_mask((1, 28, 28, 1), 7)
    assert m[:, :, :7, :].min() == 1.0
    assert m[:, :, 7:, :].max() == 0.0


def test_dilate_mask_grows_square():
    from localdiffusion_tpu.ood.thresholds import dilate_mask

    m = np.zeros((9, 9, 1), np.float32)
    m[4, 4, 0] = 1.0
    d1 = dilate_mask(m, 1)
    assert d1.sum() == 9.0 and d1[3:6, 3:6].min() == 1.0  # 3×3 square
    d2 = dilate_mask(m, 2)
    assert d2.sum() == 25.0 and d2[2:7, 2:7].min() == 1.0  # 5×5 square
    # grey dilation: soft values propagate as maxima
    s = np.zeros((9, 9, 1), np.float32)
    s[4, 4, 0] = 0.5
    assert dilate_mask(s, 1).max() == 0.5
    # radius 0 is the identity
    np.testing.assert_array_equal(dilate_mask(m, 0), m)


def test_soft_mask_dilate_extension():
    """mask_dilate grows the detected region but leaves the uniform-ones
    bypass mask (gate not fired) untouched — dilating the bypass signal
    would be meaningless (reference test.py:264-266)."""
    amap = np.zeros((2, 8, 8, 1), np.float32)
    amap[0, 4, 4, 0] = 50.0  # single-pixel anomaly
    amap[0, amap[0] == 0.0] = 20.0
    amap[1] = 10.0  # below the 8to3 gate
    base_mask, base_bin = soft_mask_from_map(amap, ladder_for("mnist", "8to3"))
    mask, binary = soft_mask_from_map(
        amap, ladder_for("mnist", "8to3"), dilate=1
    )
    assert binary[0].sum() > base_bin[0].sum()  # region grew
    assert (binary[0] >= base_bin[0]).all()  # dilation only adds
    assert (mask[0] >= base_mask[0]).all()
    np.testing.assert_array_equal(binary[1], base_bin[1])  # bypass untouched
    np.testing.assert_array_equal(mask[1], base_mask[1])


def test_soft_mask_dilate_backs_off_before_saturation():
    """A large detected region dilated past the image border must NOT
    saturate to all-ones: an all-ones mask is the uniform bypass sentinel
    (pipeline.py:110) and would silently demote the branched chain to the
    plain chain.  Dilation stops at the last non-saturating radius."""
    amap = np.full((1, 8, 8, 1), 20.0, np.float32)
    amap[0, 1:7, 1:7, 0] = 50.0  # anomaly covers all but a 1-px border
    ladder = ladder_for("mnist", "8to3")
    base_mask, base_bin = soft_mask_from_map(amap, ladder)
    assert base_bin.min() == 0.0  # detected, non-uniform
    for r in (1, 3, 10):
        mask, binary = soft_mask_from_map(amap, ladder, dilate=r)
        assert binary.min() < 1.0, r  # never saturates to the sentinel
        assert mask.min() < 1.0, r
        assert binary.sum() >= base_bin.sum()  # still only grows


def test_frontend_seg_mask_dilate():
    from localdiffusion_tpu.ood.frontend import OODFrontend
    from localdiffusion_tpu.config import DiffusionConfig

    def seg_apply(x):
        logits = jnp.full((x.shape[0], 8, 8, 1), -10.0)
        return logits.at[:, 4, 4, 0].set(10.0)  # one positive pixel

    for r, want in ((0, 1.0), (1, 9.0)):
        cfg = Config(
            ood=OODConfig(detector="seg", mask_dilate=r),
            diffusion=DiffusionConfig(image_size=8, timesteps=10),
        )
        fe = OODFrontend(cfg, seg_apply=seg_apply)
        mask, binary, _ = fe.detect(np.zeros((1, 8, 8, 1), np.float32))
        assert binary.sum() == want, (r, binary.sum())


def test_resolved_mask_dilate_auto():
    """mask_dilate=-1 derives the dilation radius from detector stats
    (VERDICT r2 item 5): one feature cell of the coarsest patchcore layer in
    output pixels; seg/manual/none resolve to 0; explicit values pass
    through."""
    pc = OODConfig(mask_dilate=-1, layers=("layer2", "layer3"), input_size=224)
    # stride 16 at input 224 → 16·256/224 ≈ 18 (matches hand-tuned 16)
    assert pc.resolved_mask_dilate(256) == 18
    assert pc.resolved_mask_dilate(224) == 16
    shallow = OODConfig(
        mask_dilate=-1, layers=("layer1", "layer2"), input_size=84
    )
    assert shallow.resolved_mask_dilate(28) == 3  # 8·28/84 ≈ 2.7
    seg = OODConfig(detector="seg", mask_dilate=-1,
                    seg_model_path=None)
    assert seg.resolved_mask_dilate(256) == 0  # full-res masks: no halo
    assert OODConfig(mask_dilate=5).resolved_mask_dilate(256) == 5
    with pytest.raises(ValueError):
        OODConfig(mask_dilate=-2)


@pytest.mark.slow
def test_refit_ladder_multiseed_stability():
    """VERDICT r2 item 5: refit robustness as a tested property.  Five
    INDEPENDENT bank+ladder refits (disjoint normal sets, different coreset
    seeds) with the robust default gate (gate_q=0.95) and auto mask_dilate
    must EACH fire on every defective image and keep mask recall over the
    ground-truth OOD region ≥ 0.5 — the property that keeps detector-driven
    branched ≤ plain (a refit whose mask misses the OOD region was the r2
    failure mode rescued by hand-tuned dilation, docs/STATUS.md)."""
    from localdiffusion_tpu.data.synthetic import synthetic_textures
    from localdiffusion_tpu.ood.thresholds import fit_ladder

    cfg = OODConfig(input_size=64, num_neighbors=3, coreset_ratio=0.25,
                    layers=("layer1", "layer2"), mask_dilate=-1)
    dilate = cfg.resolved_mask_dilate(64)
    assert dilate == 8  # layer2 stride at input 64 → one feature cell
    test_imgs, gt_masks = synthetic_textures(3, size=64, seed=7, defect=True)

    for seed in range(5):
        normal, _ = synthetic_textures(8, size=64, seed=100 + seed,
                                       defect=False)
        pc = PatchCore(cfg, rng=jax.random.PRNGKey(seed))
        pc.build_memory_bank([normal.astype(np.float32)])
        normal_maps = [
            np.asarray(pc(jnp.asarray(normal[i : i + 1]))["anomaly_map"])
            for i in range(len(normal))
        ]
        ladder = fit_ladder(normal_maps)  # robust defaults
        for i in range(len(test_imgs)):
            amap = np.asarray(
                pc(jnp.asarray(test_imgs[i : i + 1]))["anomaly_map"]
            )
            _, binary = soft_mask_from_map(amap, ladder, dilate=dilate)
            assert not bool((binary == 1.0).all()), (
                f"seed {seed}: gate failed to fire on defective image {i}"
            )
            gt = (gt_masks[i : i + 1] > 0).astype(np.float32)
            recall = float((binary * gt).sum()) / max(float(gt.sum()), 1.0)
            assert recall >= 0.5, (
                f"seed {seed} image {i}: mask recall {recall:.3f} < 0.5"
            )
