"""Per-dataset anomaly-threshold ladders and soft-mask construction.

Direct equivalents of the hard-coded ladders in reference test.py:251-375
(mnist 8to3/8to5, MRI t12flair/flair2t1, mvtec transistor/toothbrush/grid)
and the committed manual-mask override (test.py:379-381).  Host-side logic —
per-image scalar decisions stay out of jit; they emit fixed-shape masks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass(frozen=True)
class LadderRung:
    above: float  # applies when map.max() > above
    threshold: float | str  # absolute value, or 'max-K*std' / 'max-K'


@dataclass(frozen=True)
class ThresholdLadder:
    """gate: no anomaly if map.max() <= gate → uniform mask of ones
    (reference e.g. test.py:253, 264-266)."""

    gate: float
    rungs: Tuple[LadderRung, ...]  # checked top-down (highest `above` first)
    clip_lo: str = "thr-std"  # 'thr-std' | 'thr-halfstd' | 'min'

    def resolve_threshold(self, amax: float, astd: float) -> Optional[float]:
        if amax <= self.gate:
            return None
        for rung in self.rungs:
            if amax > rung.above:
                t = rung.threshold
                if isinstance(t, str):
                    if t.startswith("max-") and t.endswith("std"):
                        k = float(t[4:-3] or "1")
                        return amax - k * astd
                    if t.startswith("max-"):
                        return amax - float(t[4:])
                    raise ValueError(t)
                return float(t)
        raise AssertionError("gate passed but no rung matched")


# reference test.py:251-281 (mnist), 291-323 (mri), 329-375 (mvtec)
LADDERS = {
    ("mnist", "8to3"): ThresholdLadder(
        gate=37.0,
        rungs=(
            LadderRung(44.0, 41.7),
            LadderRung(40.0, 38.2),
            LadderRung(-np.inf, 35.0),
        ),
    ),
    ("mnist", "8to5"): ThresholdLadder(
        gate=58.5,
        rungs=(
            LadderRung(71.0, 61.0),
            LadderRung(65.0, 57.0),
            LadderRung(-np.inf, 55.0),
        ),
    ),
    ("mri", "t12flair"): ThresholdLadder(
        gate=43.0,
        rungs=(
            LadderRung(60.0, "max-12"),
            LadderRung(51.0, 47.0),
            LadderRung(48.5, 44.0),
            LadderRung(-np.inf, 42.0),
        ),
    ),
    ("mri", "flair2t1"): ThresholdLadder(
        gate=43.0,
        rungs=(
            LadderRung(60.0, 47.0),
            LadderRung(50.0, 43.0),
            LadderRung(-np.inf, 42.0),
        ),
    ),
    ("mvtec", "transistor"): ThresholdLadder(
        gate=32.0,
        rungs=(
            LadderRung(40.0, 33.5),
            LadderRung(36.8, "max-2std"),
            LadderRung(35.0, "max-1std"),
            LadderRung(-np.inf, 29.5),
        ),
        clip_lo="thr-halfstd",
    ),
    ("mvtec", "toothbrush"): ThresholdLadder(
        gate=35.0,
        rungs=(LadderRung(49.0, 40.0), LadderRung(-np.inf, 28.0)),
        clip_lo="min",
    ),
    ("mvtec", "grid"): ThresholdLadder(
        gate=27.0,
        rungs=(
            LadderRung(40.0, 35.0),
            LadderRung(35.0, 30.0),
            LadderRung(-np.inf, 26.5),
        ),
        clip_lo="min",
    ),
}


def soft_mask_from_map(
    anomaly_map: np.ndarray, ladder: ThresholdLadder
) -> Tuple[np.ndarray, np.ndarray]:
    """(mask_pred, binary_mask) from an anomaly map [B, H, W, 1].

    mask_pred = ((clip(map, lo, thr) − min) / (thr − min))², binary at > thr
    (reference e.g. test.py:260-263).  Uniform ones when the gate says no
    anomaly (test.py:264-266).
    """
    amax = float(anomaly_map.max())
    astd = float(anomaly_map.std())
    thr = ladder.resolve_threshold(amax, astd)
    if thr is None:
        ones = np.ones_like(anomaly_map, dtype=np.float32)
        return ones, ones
    binary = (anomaly_map > thr).astype(np.float32)
    if ladder.clip_lo == "thr-std":
        lo = thr - astd
    elif ladder.clip_lo == "thr-halfstd":
        lo = thr - 0.5 * astd
    else:
        lo = float(anomaly_map.min())
    clipped = np.clip(anomaly_map, lo, thr)
    mask = (clipped - clipped.min()) / (thr - clipped.min())
    return (mask**2).astype(np.float32), binary


def manual_mask(shape, cols: int = 7) -> np.ndarray:
    """Left-columns manual OOD mask — the committed reference behavior
    (test.py:379-381, the paper's motivational experiment)."""
    m = np.zeros(shape, np.float32)
    m[:, :, :cols, :] = 1.0
    return m


def mnist_half_mask(shape) -> np.ndarray:
    """Right-half-zero mask used when branch_out without detector
    (reference test.py:401-406)."""
    m = np.zeros(shape, np.float32)
    m[:, :, 14:, :] = 1.0
    return 1.0 - m


def ladder_for(data_name: str, variant: str) -> ThresholdLadder:
    key = (data_name, variant)
    if key not in LADDERS:
        raise KeyError(
            f"no threshold ladder for {key}; available: {sorted(LADDERS)}"
        )
    return LADDERS[key]
