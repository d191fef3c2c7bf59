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
from localdiffusion_tpu.config import DataConfig

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


def test_brats_png_dataset(tmp_path):
    from PIL import Image

    from localdiffusion_tpu.config import DataConfig
    from localdiffusion_tpu.data import BRATSPngDataset

    rng = np.random.default_rng(0)
    flairs = []
    for i in range(4):
        base = tmp_path / f"case{i}"
        t1 = rng.uniform(0, 800, (64, 64)).astype(np.uint16)
        flair = rng.uniform(0, 600, (64, 64)).astype(np.uint16)
        seg = np.zeros((64, 64), np.uint8)
        if i >= 2:  # tumor cases with >1% of 256² OOD area
            seg[10:45, 10:45] = 1
        Image.fromarray(t1).save(base.with_name(f"case{i}_t1.png"))
        Image.fromarray(flair).save(base.with_name(f"case{i}_flair.png"))
        np.save(base.with_name(f"case{i}_seg.npy"), seg)
        flairs.append(str(base.with_name(f"case{i}_flair.png")))

    cfg = DataConfig(name="mri", translate_zero=True)
    train_ds = BRATSPngDataset(cfg, flairs, train=True, crop=32)
    assert len(train_ds) == 2  # tumor-free only (reference data.py:350-352)
    test_ds = BRATSPngDataset(cfg, flairs, train=False, tumor=True, crop=32)
    assert len(test_ds) == 2  # tumors with >1% area (data.py:354-362)
    hr, lr, seg = test_ds[0]
    assert hr.shape == (32, 32, 1) and lr.shape == (32, 32, 1)
    # translate_zero floors values at 0 (data.py:406-410)
    assert hr.min() >= 0.0 and lr.min() >= 0.0
    # direction: mode='flair' returns (flair, t1) (data.py:440-442)
    ds2 = BRATSPngDataset(cfg, flairs, train=False, tumor=True, mode="t1", crop=32)
    a, b, _ = ds2[0]
    assert not np.allclose(a, hr)


def test_mvtec_gray_and_mask_train(tmp_path):
    from PIL import Image

    from localdiffusion_tpu.data.mvtec import MvtecDatasetSR, rgb_to_gray

    d = tmp_path / "cat" / "test" / "good"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8).astype(np.uint8)).save(d / f"{i}.png")
    files = sorted(str(p) for p in d.glob("*.png"))

    gray_ds = MvtecDatasetSR(files, train=True, size=16, gray=True)
    hr, lr, label, defect = gray_ds[0]
    assert hr.shape == (16, 16, 1)

    mt = MvtecDatasetSR(files, train=True, size=16, mask_train=True)
    img, down, mask = mt[0]
    assert mask.shape == (16, 16, 1)
    assert mask.max() == 1.0 and mask.min() == 0.0
    # content zeroed outside the mask box
    assert np.all(img[mask[..., 0] == 0.0] == 0.0)


def test_image_folder_dataset(tmp_path):
    from PIL import Image

    from localdiffusion_tpu.data.folder import ImageFolderDataset

    sub = tmp_path / "a" / "b"
    sub.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i, shape in enumerate([(20, 30, 3), (32, 16, 3)]):
        Image.fromarray(rng.integers(0, 255, shape, dtype=np.uint8).astype(np.uint8)).save(sub / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path), image_size=12)
    assert len(ds) == 2
    out = ds.as_arrays()
    assert out.shape == (2, 12, 12, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_brats_volume_dataset():
    from localdiffusion_tpu.config import DataConfig
    from localdiffusion_tpu.data import BRATSVolumeDataset

    rng = np.random.default_rng(0)
    t1 = [rng.uniform(0, 1000, (130, 48, 48)).astype(np.float32)]
    fl = [rng.uniform(0, 800, (130, 48, 48)).astype(np.float32)]
    seg = [np.zeros((130, 48, 48), np.float32)]
    cfg = DataConfig(name="mri")
    ds = BRATSVolumeDataset(cfg, t1, fl, seg, crop=32)
    # slice range 60-120 step 5 (reference data.py:478-480)
    assert len(ds) == 12
    a, b, s = ds[0]
    assert a.shape == (32, 32, 1) and b.shape == (32, 32, 1)
    assert a.min() >= 0.0  # translate_zero


def test_brats_seg_dataset(tmp_path):
    from PIL import Image

    from localdiffusion_tpu.config import DataConfig
    from localdiffusion_tpu.data import BRATSPngDataset, BRATSSegDataset

    rng = np.random.default_rng(1)
    flairs = []
    for i in range(2):
        t1 = rng.uniform(0, 800, (40, 40)).astype(np.uint16)
        fl = rng.uniform(0, 600, (40, 40)).astype(np.uint16)
        seg = np.zeros((40, 40), np.uint8)
        seg[2:38, 2:38] = 2  # nonbinary labels; >1% of 256^2 area
        Image.fromarray(t1).save(tmp_path / f"c{i}_t1.png")
        Image.fromarray(fl).save(tmp_path / f"c{i}_flair.png")
        np.save(tmp_path / f"c{i}_seg.npy", seg)
        flairs.append(str(tmp_path / f"c{i}_flair.png"))
    cfg = DataConfig(name="mri")
    base = BRATSPngDataset(cfg, flairs, train=False, tumor=True, crop=32)
    seg_ds = BRATSSegDataset(base)
    img, seg = seg_ds[0]
    assert seg.shape == (32, 32, 1)
    assert set(np.unique(seg)) <= {0.0, 1.0}  # binarized


def test_brats_volume_slice_filters():
    """Per-volume slice selection semantics (reference data.py:467-494)."""
    from localdiffusion_tpu.data.brats import BRATSVolumeDataset

    cfg = DataConfig(name="brats", mean_t1=0.0, std_t1=1.0,
                     mean_flair=0.0, std_flair=1.0)
    d, h, w = 130, 16, 16
    t1 = np.random.RandomState(0).rand(d, h, w).astype(np.float32)
    flair = np.random.RandomState(1).rand(d, h, w).astype(np.float32)
    seg = np.zeros((d, h, w), np.float32)
    for s in (60, 65, 70, 75):  # four tumor slices in the 60-120/5 range
        seg[s, 4:8, 4:8] = 1.0

    rng_len = len(range(60, 120, 5))  # 12 slices in range
    ds_all = BRATSVolumeDataset(cfg, [t1], [flair], [seg], crop=16)
    assert len(ds_all) == rng_len

    ds_healthy = BRATSVolumeDataset(cfg, [t1], [flair], [seg], crop=16,
                                    slice_filter="healthy")
    assert len(ds_healthy) == rng_len - 4

    ds_tumor = BRATSVolumeDataset(cfg, [t1], [flair], [seg], crop=16,
                                  slice_filter="tumor_capped")
    assert len(ds_tumor) == 2  # capped at 2 per volume (data.py:483-484)
    _, _, s0 = ds_tumor[0]
    assert s0.max() > 0

    ds_norm = BRATSVolumeDataset(cfg, [t1], [flair], [seg], crop=16,
                                 slice_filter="healthy_capped")
    assert len(ds_norm) == 2
    _, _, sn = ds_norm[0]
    assert sn.max() == 0

    single = BRATSVolumeDataset.single_volume(cfg, t1, flair, seg, crop=16)
    assert len(single) == d  # every slice, unfiltered (SingleMedDataset)

    # total cap across volumes: the reference test path stops at
    # self.total = 28 slices (data.py:464, 494-495) — with 3 volumes at
    # 2 tumor slices each and total_cap=5 the third volume is truncated
    ds_cap = BRATSVolumeDataset(
        cfg, [t1] * 3, [flair] * 3, [seg] * 3, crop=16,
        slice_filter="tumor_capped", total_cap=5,
    )
    assert len(ds_cap) == 5
    # and without the cap, 2 per volume × 3 volumes
    ds_nocap = BRATSVolumeDataset(
        cfg, [t1] * 3, [flair] * 3, [seg] * 3, crop=16,
        slice_filter="tumor_capped",
    )
    assert len(ds_nocap) == 6
