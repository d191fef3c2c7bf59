"""OOD front-end and classifier orchestration tests (no real backbone)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localdiffusion_tpu.config import (
    Config,
    DataConfig,
    DiffusionConfig,
    ModelConfig,
    OODConfig,
    SamplerConfig,
)
from localdiffusion_tpu.ood.classifier import (
    ClassifierPatchCore,
    preprocess_for_patchcore,
    roc_optimal_threshold,
)
from localdiffusion_tpu.ood.frontend import OODFrontend


def mk_config(detector="manual", name="mnist"):
    return Config(
        model=ModelConfig(dim=8, dim_mults=(1, 2), full_attn=(False, True)),
        diffusion=DiffusionConfig(image_size=16, timesteps=8),
        sampler=SamplerConfig(),
        ood=OODConfig(detector=detector, manual_mask_cols=4, input_size=16),
        data=DataConfig(name=name),
    )


def test_manual_detector():
    fe = OODFrontend(mk_config("manual"))
    lr = np.zeros((2, 16, 16, 1), np.float32)
    mask, binary, amap = fe.detect(lr)
    assert mask.shape == (2, 16, 16, 1)
    assert mask[:, :, :4].min() == 1.0 and mask[:, :, 4:].max() == 0.0
    assert amap is None


def test_none_detector():
    fe = OODFrontend(mk_config("none"))
    mask, binary, _ = fe.detect(np.zeros((1, 16, 16, 1), np.float32))
    assert (mask == 1.0).all()


def test_seg_detector():
    def seg_apply(x):
        # logits positive in the left quarter
        b, h, w, _ = x.shape
        logits = jnp.full((b, h, w, 1), -5.0)
        return logits.at[:, :, : w // 4, :].set(5.0)

    fe = OODFrontend(mk_config("seg"), seg_apply=seg_apply)
    mask, binary, probs = fe.detect(np.zeros((1, 16, 16, 1), np.float32))
    assert binary[:, :, :4].min() == 1.0 and binary[:, :, 4:].max() == 0.0
    assert probs is not None


def test_seg_dilate_backs_off_before_saturation():
    """A seg mask dilated with a huge radius must stop before becoming
    uniform ones — all-ones collides with the bypass sentinel and would
    route a DETECTED anomaly onto the plain chain (ADVICE r2 medium)."""
    import dataclasses

    def seg_apply(x):
        b, h, w, _ = x.shape
        logits = jnp.full((b, h, w, 1), -5.0)
        return logits.at[:, :, : w // 4, :].set(5.0)

    cfg = mk_config("seg")
    cfg = cfg.replace(ood=dataclasses.replace(cfg.ood, mask_dilate=64))
    fe = OODFrontend(cfg, seg_apply=seg_apply)
    mask, binary, _ = fe.detect(np.zeros((1, 16, 16, 1), np.float32))
    assert binary.min() < 1.0  # never saturates to the bypass sentinel
    assert binary.sum() > 4 * 16  # but it did dilate beyond the raw region


def test_detector_requires_dependency():
    with pytest.raises(ValueError):
        OODFrontend(mk_config("patchcore"))
    with pytest.raises(ValueError):
        OODFrontend(mk_config("seg"))


def test_roc_optimal_threshold():
    labels = np.array([1, 1, 1, 2, 2, 2])  # reference stores cls+1
    scores = np.array([0.1, 0.2, 0.3, 0.8, 0.9, 0.7])
    thr = roc_optimal_threshold(labels, scores)
    assert 0.3 < thr <= 0.7


def test_preprocess_for_patchcore_shapes():
    x = jnp.full((2, 28, 28, 1), 1.5)
    out = preprocess_for_patchcore(x, 84)
    assert out.shape == (2, 84, 84, 3)
    # [0,2] halved to [0,1] then imagenet-normalized
    assert float(out.max()) < 3.0


class _StubPatchCore:
    """Stands in for PatchCore: score = mean intensity of the input."""

    class cfg:
        input_size = 16

    memory_bank = jnp.zeros((4, 8))

    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2, 3))
        return {
            "anomaly_map": jnp.mean(x, axis=-1, keepdims=True),
            "pred_score": s,
        }

    def _score(self, x, mem):
        out = self.__call__(x)
        return out["anomaly_map"], out["pred_score"]


def test_classifier_calibrate_and_gate():
    cls = ClassifierPatchCore(_StubPatchCore())
    # normals are dark (label 0), anomalies bright (label 1); varied values so
    # the ROC threshold (score > thr, exclusive like reference models.py:428)
    # sits strictly below the test queries
    loader = [
        (np.full((1, 16, 16, 1), v, np.float32), 0) for v in (0.05, 0.1, 0.15, 0.2)
    ] + [
        (np.full((1, 16, 16, 1), v, np.float32), 1) for v in (1.5, 1.7, 1.8, 1.9)
    ]
    thr = cls.calibrate(loader)
    assert np.isfinite(thr)
    pred, amap, score = cls(jnp.full((1, 16, 16, 1), 1.9))
    assert int(pred[0]) == 1
    pred0, _, _ = cls(jnp.full((1, 16, 16, 1), 0.1))
    assert int(pred0[0]) == 0
    gate = cls.as_sampler_gate()
    assert float(gate(jnp.full((1, 16, 16, 1), 1.9))[0]) > 0
    assert float(gate(jnp.full((1, 16, 16, 1), 0.1))[0]) < 0


class _RawSourceStubPC(_StubPatchCore):
    """Raw-preprocess source: the classifier must pass images through
    untouched (no /2, no resize-to-input_size, no ImageNet normalize)."""

    class source:
        preprocess = "raw"


def test_classifier_raw_source_skips_imagenet_prep():
    cls = ClassifierPatchCore(_RawSourceStubPC(), threshold=1.0)
    x = jnp.full((1, 28, 28, 1), 1.8)  # 28 != cfg.input_size=16 on purpose
    # score = mean intensity: raw path keeps 1.8; the WRN path would halve
    # to 0.9 and imagenet-shift it
    assert abs(float(cls.score_raw(x)[0]) - 1.8) < 1e-4
    gate = cls.as_sampler_gate()
    assert abs(float(gate(x)[0]) - 0.8) < 1e-4
    # WRN-style stub (no .source) still takes the legacy prep path
    legacy = ClassifierPatchCore(_StubPatchCore(), threshold=1.0)
    assert abs(float(legacy.score_raw(x)[0]) - 1.8) > 0.1


def test_classifier_gate_polarity():
    cls = ClassifierPatchCore(_StubPatchCore(), threshold=1.0)
    hot = jnp.full((1, 16, 16, 1), 1.5)   # anomalous-scoring input
    cold = jnp.full((1, 16, 16, 1), 0.5)  # normal-scoring input
    preserve = cls.as_sampler_gate(polarity="preserve")
    suppress = cls.as_sampler_gate(polarity="suppress")
    # preserve (reference ddpm.py:888): accept (>0) while still anomalous
    assert float(preserve(hot)[0]) > 0 and float(preserve(cold)[0]) < 0
    # suppress: accept while the output scores normal
    assert float(suppress(hot)[0]) < 0 and float(suppress(cold)[0]) > 0
