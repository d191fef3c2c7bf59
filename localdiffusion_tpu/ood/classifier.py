"""PatchCore-based accept/reject classifier with ROC threshold calibration.

Equivalent of reference models.py:257-430 (Classifier_PatchCore): wraps a
PatchCore detector as a binary oracle over generated images, auto-calibrates
its threshold from an ROC sweep (max TPR − FPR) over a labeled loader
(models.py:338-402), and exposes a jittable score function for the
classifier-gated re-branching inside the sampler (ddpm.py:883-916).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from localdiffusion_tpu.ood.patchcore import PatchCore
from localdiffusion_tpu.ops.resize import imagenet_normalize, resize_bilinear


def roc_optimal_threshold(labels: np.ndarray, scores: np.ndarray) -> float:
    """Threshold maximizing TPR − FPR (reference models.py:392-401)."""
    from sklearn import metrics

    fpr, tpr, thresholds = metrics.roc_curve(labels, scores, pos_label=2)
    return float(thresholds[int(np.argmax(tpr - fpr))])


def preprocess_for_patchcore(
    x: jnp.ndarray,
    input_size: int,
    denorm: Optional[Tuple[float, float, bool]] = None,
) -> jnp.ndarray:
    """Image prep shared by detector and classifier (models.py:404-424):

    1ch → 3ch repeat; mnist/mvtec values halved from [0,2] to [0,1] (or MRI
    denormalized by (mean, std, translate_zero) then /4096); resize to the
    PatchCore input; ImageNet-normalize.
    """
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    if denorm is None:
        x = x / 2.0
    else:
        mean, std, translate_zero = denorm
        if translate_zero:
            mini = (0.0 - mean) / std
            x = x - abs(mini)
        x = x * std + mean
        x = x / 4096.0
    x = resize_bilinear(x, (input_size, input_size))
    return imagenet_normalize(x)


class ClassifierPatchCore:
    """Accept/reject oracle over generated x_start images."""

    def __init__(
        self,
        patchcore: PatchCore,
        threshold: Optional[float] = None,
        denorm: Optional[Tuple[float, float, bool]] = None,
    ):
        self.patchcore = patchcore
        self.threshold = threshold
        self.denorm = denorm

    def _prep(self, x: jnp.ndarray) -> jnp.ndarray:
        """Raw-preprocess sources (seg_encoder / denoiser taps,
        ood/features.py) score the image exactly as the sampler holds it —
        the ImageNet denorm/resize pipeline is WRN-specific (mirrors
        OODFrontend._preprocess_patchcore's source dispatch)."""
        src = getattr(self.patchcore, "source", None)
        if getattr(src, "preprocess", "imagenet") == "raw":
            return x
        return preprocess_for_patchcore(
            x, self.patchcore.cfg.input_size, self.denorm
        )

    def calibrate(
        self, loader: Iterable[Tuple[np.ndarray, int]]
    ) -> float:
        """ROC-calibrate from (image, label) pairs; label 1 = anomalous.

        Mirrors models.py:338-402 (labels stored as cls+1, pos_label=2).
        """
        scores, labels = [], []
        for img, label in loader:
            out = self.score_raw(jnp.asarray(img))
            scores.append(np.asarray(out))
            labels.append(np.asarray([int(label) + 1]))
        scores = np.concatenate(scores)
        labels = np.concatenate(labels)
        self.threshold = roc_optimal_threshold(labels, scores)
        return self.threshold

    def score_raw(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.patchcore(self._prep(x))["pred_score"]

    def __call__(self, x: jnp.ndarray):
        """(pred ∈ {0,1}, anomaly_map, score) like models.py:404-430."""
        assert self.threshold is not None, "calibrate() or set threshold first"
        out = self.patchcore(self._prep(x))
        score = out["pred_score"]
        pred = (score > self.threshold).astype(jnp.int32)
        amap = resize_bilinear(out["anomaly_map"], x.shape[1:3])
        return pred, amap, score

    def as_sampler_gate(
        self, polarity: str = "preserve"
    ) -> Callable[[jnp.ndarray], jnp.ndarray]:
        """Jittable gate for the sampler: the sampler accepts when the
        returned value is > 0.

        polarity='preserve' (reference, ddpm.py:888): score − threshold —
        accept while the fused x_start still scores ANOMALOUS (the task
        output retains the anomaly; rejection means it was hallucinated
        away).  polarity='suppress' (extension, SamplerConfig
        .classifier_polarity): threshold − score — accept while the
        x_start scores NORMAL (anomaly-removing translations; rejection
        means lesion-like residue leaked into the output)."""
        assert self.threshold is not None
        assert polarity in ("preserve", "suppress"), polarity
        sign = 1.0 if polarity == "preserve" else -1.0
        thr = float(self.threshold)
        pc = self.patchcore
        mem = pc.memory_bank
        denorm = self.denorm
        input_size = pc.cfg.input_size
        raw = getattr(
            getattr(pc, "source", None), "preprocess", "imagenet"
        ) == "raw"

        def gate(x_start: jnp.ndarray, t=None) -> jnp.ndarray:
            if raw:
                xin = x_start
            else:
                xin = preprocess_for_patchcore(x_start, input_size, denorm)
            _, pred_score = pc._score(xin, mem)
            return sign * (pred_score - thr)

        return gate
