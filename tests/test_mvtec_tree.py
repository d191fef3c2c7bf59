"""Fake MVTec-AD folder tree driving the real-data path logic end-to-end.

Rehearses the reference's directory-shape assumptions (glob over
<root>/<category>/{train/good, test/<defect>}/*.png, category from the path
— reference test.py:330 `split('/')[5]`) without real data (VERDICT r1
item 9)."""

import os
import sys

import numpy as np
import pytest
import yaml


def _make_tree(root, category="grid", n_good=6, n_defect=4):
    """<root>/<category>/train/good/*.png + test/{broken,good}/*.png"""
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = {
        ("train", "good"): n_good,
        ("test", "broken"): n_defect,
        ("test", "good"): 2,
    }
    for (split, defect), n in paths.items():
        d = os.path.join(root, category, split, defect)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            arr = (rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i:03d}.png"))
    return os.path.join(root, category)


def test_mvtec_tree_selection(tmp_path):
    import glob

    from localdiffusion_tpu.data import MvtecDatasetSR

    cat_dir = _make_tree(str(tmp_path), "grid")
    files = sorted(glob.glob(os.path.join(cat_dir, "*", "*", "*.png")))
    assert len(files) == 12

    tr = MvtecDatasetSR(files, train=True, size=16)
    # train keeps 'good' only (both train/good and test/good match the
    # reference's substring filter, data.py:208-210)
    assert len(tr.items) == 8
    te = MvtecDatasetSR(files, train=False, mode=["broken"], size=16)
    assert len(te.items) == 4
    hr, lr, label, defect = te[0]
    assert hr.shape == (16, 16, 3) and defect == "broken"
    assert hr.max() <= 2.0 and hr.min() >= 0.0


def test_mvtec_category_ladder_resolution(tmp_path):
    """Known category → its hand-tuned ladder; unknown → DEFAULT_LADDER
    (no raise)."""
    from localdiffusion_tpu.config import Config, DataConfig, OODConfig
    from localdiffusion_tpu.ood.frontend import OODFrontend
    from localdiffusion_tpu.ood.thresholds import DEFAULT_LADDER, LADDERS, ladder_for

    for cat, expect_default in (("grid", False), ("pill", True)):
        cat_dir = _make_tree(str(tmp_path), cat, n_good=1, n_defect=1)
        cfg = Config(
            data=DataConfig(
                name="mvtec",
                mvtec_path=os.path.join(cat_dir, "*", "*", "*.png"),
            ),
            ood=OODConfig(detector="manual"),
        )
        fe = OODFrontend(cfg)
        variant = fe._ladder_variant()
        lad = ladder_for("mvtec", variant)
        if expect_default:
            assert lad is DEFAULT_LADDER
        else:
            assert lad is LADDERS[("mvtec", "grid")]


@pytest.mark.slow
def test_mvtec_tree_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """scripts/test.py drives the fake tree through the mvtec branch:
    glob → MvtecDatasetSR → pipeline (manual detector, random init)."""
    cat_dir = _make_tree(str(tmp_path), "grid")
    cfg = {
        "model": {"dim": 8, "dim_mults": [1, 2], "full_attn": [False, True],
                  "channels": 3},
        "diffusion": {"image_size": 16, "timesteps": 6},
        "sampler": {"start_timestep": 1, "cond_in_floor": 0.95},
        "ood": {"detector": "manual", "manual_mask_cols": 4, "input_size": 16},
        "data": {"name": "mvtec", "anomaly_name": "broken",
                 "mvtec_path": os.path.join(cat_dir, "*", "*", "*.png")},
        "train": {"results_dir": str(tmp_path), "project_name": "t"},
    }
    p = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(p, "w"))

    sys.path.insert(0, os.getcwd())
    from scripts import test as test_script

    monkeypatch.setattr(
        sys, "argv",
        ["test.py", "--config", str(p), "--milestone", "none",
         "--max-images", "2"],
    )
    test_script.main()
    out = capsys.readouterr().out
    assert "Test loss:" in out
