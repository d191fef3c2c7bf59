"""StreamLoader: sharded streaming input with background prefetch.

Covers determinism (same seed+epoch → same global order), exact coverage,
batch-size parity with ArrayLoader, shard-boundary carry, decode-error
propagation, and the device_prefetch wrapper.
"""

import numpy as np
import pytest

from localdiffusion_tpu.data import ArrayLoader, StreamLoader, device_prefetch
from localdiffusion_tpu.data.stream import npy_shard


def _shards(sizes, dim=3, base=0):
    """In-memory shards of distinct rows: (x, y) with x[i,0] a unique id."""
    shards, offset = [], base
    for n in sizes:
        x = np.arange(offset, offset + n, dtype=np.float32)[:, None] * np.ones(
            (1, dim), np.float32
        )
        y = -x
        shards.append((lambda x=x, y=y: (x, y)))
        offset += n
    return shards


def _collect_ids(loader, epoch):
    ids, shapes = [], []
    for x, y in loader.epoch_batches(epoch):
        np.testing.assert_array_equal(y, -x)
        ids.extend(x[:, 0].tolist())
        shapes.append(len(x))
    return ids, shapes


def test_exact_coverage_and_determinism():
    sizes = [7, 5, 11]
    ld = StreamLoader(_shards(sizes), sizes, batch_size=4, seed=3)
    ids1, shapes1 = _collect_ids(ld, 0)
    assert sorted(ids1) == list(range(23))  # every row exactly once
    assert shapes1 == [4, 4, 4, 4, 4, 3]  # full batches + remainder
    ids2, _ = _collect_ids(ld, 0)
    assert ids1 == ids2  # same epoch → identical order
    ids3, _ = _collect_ids(ld, 1)
    assert ids1 != ids3 and sorted(ids3) == list(range(23))


def test_batch_shapes_match_arrayloader():
    sizes = [6, 9]
    ld = StreamLoader(_shards(sizes), sizes, batch_size=4, drop_last=True)
    x = np.zeros((15, 3), np.float32)
    al = ArrayLoader(x, x, batch_size=4, drop_last=True)
    assert len(ld) == len(al) == 3
    assert [len(b[0]) for b in ld.epoch_batches(0)] == [4, 4, 4]


def test_no_shuffle_preserves_order():
    sizes = [4, 4]
    ld = StreamLoader(_shards(sizes), sizes, batch_size=3, shuffle=False)
    ids, _ = _collect_ids(ld, 0)
    assert ids == list(range(8))


def test_npy_shard_roundtrip(tmp_path):
    x = np.random.default_rng(0).normal(size=(5, 2)).astype(np.float32)
    y = -x
    np.save(tmp_path / "x.npy", x)
    np.save(tmp_path / "y.npy", y)
    sh = npy_shard(str(tmp_path / "x.npy"), str(tmp_path / "y.npy"))
    ld = StreamLoader([sh], [5], batch_size=2, shuffle=False)
    got = np.concatenate([b[0] for b in ld.epoch_batches(0)])
    np.testing.assert_array_equal(got, x)


def test_decode_error_propagates():
    def bad():
        raise IOError("corrupt shard")

    ld = StreamLoader([bad], [3], batch_size=2)
    with pytest.raises(IOError, match="corrupt shard"):
        list(ld.epoch_batches(0))


def test_size_mismatch_detected():
    ld = StreamLoader(_shards([4]), [5], batch_size=2)
    with pytest.raises(AssertionError, match="declared 5 rows"):
        list(ld.epoch_batches(0))


def test_abandoned_epoch_stops_worker():
    """Closing the generator mid-epoch must stop the decode thread instead
    of leaving it blocked on the bounded queue with shards pinned."""
    import time

    loads = []

    def make_shard(i):
        def load():
            loads.append(i)
            x = np.full((4, 3), float(i), np.float32)
            return (x, -x)

        return load

    ld = StreamLoader([make_shard(i) for i in range(6)], [4] * 6,
                      batch_size=2, prefetch_shards=1, shuffle=False)
    it = ld.epoch_batches(0)
    next(it)
    it.close()  # GeneratorExit → stop event
    time.sleep(0.6)
    n_after_close = len(loads)
    time.sleep(0.6)
    assert len(loads) == n_after_close  # worker exited, no further decodes
    assert n_after_close < 6  # and it never decoded the whole epoch


def test_device_prefetch_same_data():
    sizes = [5, 6]
    ld = StreamLoader(_shards(sizes), sizes, batch_size=4, seed=1)
    plain = [b[0][:, 0] for b in ld.epoch_batches(0)]
    pre = [
        np.asarray(b[0])[:, 0]
        for b in device_prefetch(ld.epoch_batches(0), size=2)
    ]
    assert len(plain) == len(pre)
    for a, b in zip(plain, pre):
        np.testing.assert_array_equal(a, b)
