"""MetaImage reader/writer + .mha→.npy converter CLI + volume-dataset flow.

The real-data rehearsal without real data (VERDICT r1 item 9): synthetic
.mha volumes exercise the exact container parsing, conversion CLI, and the
BRATSVolumeDataset slice/crop/normalize path the reference drives through
medpy (reference data.py:444-604)."""

import os
import sys

import numpy as np
import pytest

from localdiffusion_tpu.data.mha import load_mha, save_mha


def _vol(shape=(8, 10, 12), dtype=np.int16, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(0, 1000, shape)).astype(dtype)


@pytest.mark.parametrize("dtype", [np.int16, np.uint8, np.float32])
@pytest.mark.parametrize("compressed", [False, True])
def test_mha_roundtrip(tmp_path, dtype, compressed):
    v = _vol(dtype=dtype)
    p = str(tmp_path / "vol.mha")
    save_mha(p, v, compressed=compressed)
    got, header = load_mha(p)
    np.testing.assert_array_equal(got, v)
    assert header["CompressedData"] == str(compressed)
    # DimSize is stored fastest-first (x y z) — reversed of the array shape
    assert header["DimSize"] == "12 10 8"


def test_mha_external_datafile(tmp_path):
    """ElementDataFile pointing at a sibling .raw file."""
    v = _vol(dtype=np.float32, seed=1)
    raw = tmp_path / "vol.raw"
    raw.write_bytes(np.ascontiguousarray(v).tobytes())
    hdr = (
        "ObjectType = Image\nNDims = 3\nBinaryData = True\n"
        "BinaryDataByteOrderMSB = False\nDimSize = 12 10 8\n"
        "ElementType = MET_FLOAT\nElementDataFile = vol.raw\n"
    )
    p = tmp_path / "vol.mhd"
    p.write_text(hdr)
    got, _ = load_mha(str(p))
    np.testing.assert_array_equal(got, v)


def test_mha_compressed_zraw_sibling(tmp_path):
    """ElementDataFile pointing at a zlib-compressed sibling .zraw — the
    layout real BRATS archives ship (.mhd header + .zraw data); rehearses
    asset drop-in without the asset (VERDICT r2 #8)."""
    import zlib

    v = _vol(dtype=np.int16, seed=5)
    (tmp_path / "vol.zraw").write_bytes(
        zlib.compress(np.ascontiguousarray(v).tobytes())
    )
    hdr = (
        "ObjectType = Image\nNDims = 3\nBinaryData = True\n"
        "BinaryDataByteOrderMSB = False\nCompressedData = True\n"
        "DimSize = 12 10 8\nElementType = MET_SHORT\n"
        "ElementDataFile = vol.zraw\n"
    )
    (tmp_path / "vol.mhd").write_text(hdr)
    got, header = load_mha(str(tmp_path / "vol.mhd"))
    np.testing.assert_array_equal(got, v)
    assert header["ElementDataFile"] == "vol.zraw"


def test_mha_big_endian(tmp_path):
    v = _vol(dtype=np.int16, seed=2)
    raw = v.astype(">i2").tobytes()
    hdr = (
        "ObjectType = Image\nNDims = 3\nBinaryData = True\n"
        "BinaryDataByteOrderMSB = True\nDimSize = 12 10 8\n"
        "ElementType = MET_SHORT\nElementDataFile = LOCAL\n"
    )
    p = tmp_path / "vol.mha"
    with open(p, "wb") as fh:
        fh.write(hdr.encode())
        fh.write(raw)
    got, _ = load_mha(str(p))
    np.testing.assert_array_equal(got.astype(np.int16), v)


def test_convert_mha_cli_to_volume_dataset(tmp_path, monkeypatch, capsys):
    """CLI glob → .npy → BRATSVolumeDataset consumes the converted arrays."""
    from localdiffusion_tpu.config import DataConfig
    from localdiffusion_tpu.data.brats import BRATSVolumeDataset

    # two fake subject volumes, BRATS-ish depth
    for name, seed in (("sub1_T1", 3), ("sub2_T1", 4)):
        save_mha(str(tmp_path / f"{name}.mha"),
                 _vol((130, 40, 40), np.int16, seed), compressed=True)

    sys.path.insert(0, os.getcwd())
    from scripts import convert_mha

    out_dir = tmp_path / "npy"
    monkeypatch.setattr(
        sys, "argv",
        ["convert_mha.py", str(tmp_path / "*_T1.mha"),
         "--out-dir", str(out_dir), "--dtype", "float32"],
    )
    convert_mha.main()
    out = capsys.readouterr().out
    assert "shape=(130, 40, 40)" in out

    vols = [np.load(out_dir / f) for f in sorted(os.listdir(out_dir))]
    assert len(vols) == 2
    cfg = DataConfig(name="mri", mean_t1=500.0, std_t1=290.0,
                     mean_flair=500.0, std_flair=290.0)
    ds = BRATSVolumeDataset(cfg, vols, vols, crop=32)
    # slice range 60..120 step 5 → 12 slices per volume (data.py:478-480)
    assert len(ds) == 24
    hr, lr, seg = ds[0]
    assert hr.shape == (32, 32, 1) and lr.shape == (32, 32, 1)
    assert np.isfinite(hr).all()
