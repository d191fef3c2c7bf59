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
