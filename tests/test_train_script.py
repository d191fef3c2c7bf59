"""Train-script integration: CLI flow, checkpointing, auto-resume."""

import os
import sys

import pytest
import yaml


@pytest.mark.slow
def test_train_script_runs_and_resumes(tmp_path, monkeypatch, capsys):
    cfg = {
        "model": {"dim": 8, "dim_mults": [1, 2], "full_attn": [False, True],
                  "channels": 1},
        "diffusion": {"image_size": 16, "timesteps": 8},
        "data": {"name": "synthetic"},
        "train": {"results_dir": str(tmp_path), "project_name": "t",
                  "num_steps": 3},
    }
    p = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(p, "w"))

    sys.path.insert(0, os.getcwd())
    from scripts.train import main

    argv = ["train.py", "--config", str(p), "--steps", "2", "--batch-size", "16",
            "--eval-every", "2"]
    monkeypatch.setattr(sys, "argv", argv)
    main()
    assert os.path.exists(tmp_path / "t" / "model-latest")
    assert os.path.exists(tmp_path / "t" / "train_loss.csv")

    # resume: continue to step 4 from latest (step 2)
    monkeypatch.setattr(sys, "argv", argv[:-4] + ["--steps", "4", "--eval-every", "4",
                                                  "--batch-size", "16"])
    main()
    out = capsys.readouterr().out
    assert "auto-resumed from model-latest at step 2" in out
