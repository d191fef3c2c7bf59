"""Data pipeline tests: IDX parsing, reference degradation quirks, loaders."""

import os

import numpy as np
import pytest

from localdiffusion_tpu.data import (
    ArrayLoader,
    MNISTDataset,
    MvtecDatasetSR,
    degrade,
    read_idx,
    synthetic_brain_pair,
    synthetic_digits,
)
from localdiffusion_tpu.data.brats import _center_crop_np

REF_MNIST = "/root/reference/MNIST/raw"


def test_read_idx_labels_if_available():
    p = os.path.join(REF_MNIST, "train-labels-idx1-ubyte")
    if not os.path.exists(p):
        pytest.skip("reference MNIST labels not mounted")
    labels = read_idx(p)
    assert labels.shape == (60000,)
    assert labels.min() >= 0 and labels.max() <= 9


def test_read_idx_gz_images_if_available():
    p = os.path.join(REF_MNIST, "t10k-images-idx3-ubyte.gz")
    if not os.path.exists(p):
        pytest.skip("reference MNIST test images not mounted")
    imgs = read_idx(p)
    assert imgs.shape == (10000, 28, 28)


def test_degrade_h_only_quirk_matches_torch():
    """Reference data.py:825-827: H-only ×2 subsample then bilinear resize."""
    import torch
    import torch.nn.functional as F

    img = np.random.default_rng(0).uniform(0, 255, (28, 28)).astype(np.float32)
    got = degrade(img, "h_only")
    t = torch.from_numpy(img)[None, None]  # [1,1,28,28]
    t_down = t[:, ::2, ::2]  # strides dims 1,2 → H-only
    want = F.interpolate(t_down, size=(28, 28), mode="bilinear", align_corners=False)
    np.testing.assert_allclose(got, want[0, 0].numpy(), rtol=1e-4, atol=1e-4)


def test_mnist_dataset_filtering_and_range():
    imgs, labels = synthetic_digits(50, seed=0)
    ds = MNISTDataset(imgs, labels, num=[3], max_file=5)
    assert len(ds) <= 5
    assert all(l == 3 for l in ds.labels)
    if len(ds):
        hr, lr, y = ds[0]
        assert hr.shape == (28, 28, 1) and lr.shape == (28, 28, 1)
        assert 0.0 <= hr.min() and hr.max() <= 2.0  # 2·x/255 range
        assert y == 3


def test_center_crop_np():
    img = np.arange(36, dtype=np.float32).reshape(6, 6)
    out = _center_crop_np(img, (4, 4))
    assert out.shape == (4, 4)
    assert out[0, 0] == img[1, 1]
    # pads when smaller
    out2 = _center_crop_np(img, (8, 8))
    assert out2.shape == (8, 8)
    assert out2[0, 0] == 0.0


def test_array_loader_deterministic_epochs():
    x = np.arange(10)
    dl = ArrayLoader(x, batch_size=3, seed=7)
    e0a = [b[0].tolist() for b in dl.epoch_batches(0)]
    e0b = [b[0].tolist() for b in dl.epoch_batches(0)]
    e1 = [b[0].tolist() for b in dl.epoch_batches(1)]
    assert e0a == e0b
    assert e0a != e1
    assert sorted(sum(e0a, [])) == list(range(10))
    assert len(dl) == 4


def test_synthetic_brain_pair_tumor_marks_seg():
    t1, flair, seg = synthetic_brain_pair(4, size=32, tumor=True)
    assert t1.shape == (4, 32, 32, 1)
    assert seg.max() == 1.0
    t1n, _, segn = synthetic_brain_pair(4, size=32, tumor=False)
    assert segn.max() == 0.0


def test_mvtec_selection(tmp_path):
    from PIL import Image

    # build a tiny fake mvtec tree
    for sub, n in [("good", 3), ("bent_lead", 2)]:
        d = tmp_path / "transistor" / "test" / sub
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(
                (np.random.default_rng(i).uniform(0, 255, (16, 16, 3))).astype(
                    np.uint8
                )
            ).save(d / f"{i}.png")
    files = sorted(str(p) for p in tmp_path.rglob("*.png"))
    train_ds = MvtecDatasetSR(files, train=True, size=16)
    assert len(train_ds) == 3  # 'good' only
    test_ds = MvtecDatasetSR(files, train=False, mode=["bent_lead"], size=16)
    assert len(test_ds) == 2
    hr, lr, label, defect = test_ds[0]
    assert hr.shape == (16, 16, 3) and lr.shape == (16, 16, 3)
    assert hr.max() <= 2.0 and label == 1 and defect == "bent_lead"
