"""Inference-script integration: CLI flow with manual detector on CPU."""

import os
import sys

import pytest
import yaml


@pytest.mark.slow
def test_test_script_manual_detector(tmp_path, monkeypatch, capsys):
    cfg = {
        "model": {"dim": 8, "dim_mults": [1, 2], "full_attn": [False, True],
                  "channels": 1},
        "diffusion": {"image_size": 16, "timesteps": 6},
        "sampler": {"start_timestep": 1},
        "ood": {"detector": "manual", "manual_mask_cols": 4, "input_size": 16},
        "data": {"name": "synthetic"},
        "train": {"results_dir": str(tmp_path), "project_name": "t"},
    }
    p = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(p, "w"))

    sys.path.insert(0, os.getcwd())
    from scripts import test as test_script

    # the mnist fallback path uses synthetic digits when files are absent;
    # force the synthetic dataset name through the mnist branch by pointing
    # data at mnist with bogus paths
    cfg["data"] = {"name": "mnist", "mnist_path": "/nonexistent",
                   "mnist_labels_path": "/nonexistent", "anomaly_name": 3}
    yaml.safe_dump(cfg, open(p, "w"))
    monkeypatch.setattr(
        sys, "argv",
        ["test.py", "--config", str(p), "--milestone", "none",
         "--max-images", "2"],
    )
    test_script.main()
    out = capsys.readouterr().out
    assert "WARNING: no checkpoint" in out  # random-init fallback engaged
    assert "Test loss:" in out
    assert "Average sampling time:" in out
