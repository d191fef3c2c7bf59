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


def test_best_eval_tracker_monotone_across_relaunch(tmp_path):
    """Watchdog relaunch hygiene: a relaunched run resumes the best-eval
    tracker from best_eval.json, so a post-wedge eval that is WORSE than the
    pre-wedge best never records a new 'best' milestone."""
    from localdiffusion_tpu.train.trainer import load_best_eval, record_best_eval

    d = str(tmp_path / "proj")
    # fresh results dir → no prior best
    assert load_best_eval(d) == float("inf")
    # pre-wedge run records best 0.010
    record_best_eval(d, 0.010, "best400")
    # relaunched process (watchdog kill → auto-resume) reloads it
    best = load_best_eval(d)
    assert best == 0.010
    # worse eval after relaunch must NOT beat it
    assert not (0.020 < best)
    # a genuinely better eval updates the file atomically
    record_best_eval(d, 0.004, "best800")
    assert load_best_eval(d) == 0.004
    # corrupt file degrades to inf, never crashes the trainer
    with open(os.path.join(d, "best_eval.json"), "w") as f:
        f.write("{broken")
    assert load_best_eval(d) == float("inf")
