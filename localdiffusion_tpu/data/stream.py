"""Sharded streaming input pipeline with background prefetch.

ArrayLoader (loader.py) batches arrays that already live in host RAM — the
right tool at the reference's scales (MNIST/BRATS-png fit trivially).  Real
deployments stream: BRATS volume archives or MVTec-AD category trees can
exceed RAM, and the reference's answer — torch DataLoader workers
(reference ddpm.py:1321, num_workers=cpu_count()) — is a process pool.
The TPU-native equivalent is a *thread* pipeline: the device computes while
one background thread decodes the next shard (numpy releases the GIL for
IO/decode), and an optional device_prefetch keeps the next batches already
transferred so the train step never waits on PCIe/tunnel dispatch.

Determinism matches ArrayLoader: shard order and intra-shard order are
drawn from seed+epoch, so every epoch's global order is reproducible
independently of timing (the reference's np.random.seed(42) shuffles,
ddpm.py:1310, 1336).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence, Tuple

import numpy as np

ShardFn = Callable[[], Tuple[np.ndarray, ...]]


def npy_shard(*paths: str) -> ShardFn:
    """Shard loader reading parallel .npy files (one per stream)."""

    def load() -> Tuple[np.ndarray, ...]:
        return tuple(np.load(p) for p in paths)

    return load


class StreamLoader:
    """Deterministic epoch batches over lazily-loaded shards.

    `shards` is a sequence of zero-arg callables, each returning a tuple of
    parallel arrays (e.g. (hr, lr)); `sizes` gives each shard's length up
    front so __len__ and batch accounting need no IO.  Per epoch: shard
    order is shuffled (seed+epoch), each shard's rows are shuffled with a
    per-shard substream, and a background thread decodes shard k+1 while
    shard k is being consumed.  Rows left over at a shard boundary carry
    into the next shard's batches, so batch sizes match ArrayLoader exactly.

    API-compatible with ArrayLoader.epoch_batches — drop-in for the
    'epoch'/'batch' Trainer step modes.
    """

    def __init__(
        self,
        shards: Sequence[ShardFn],
        sizes: Sequence[int],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 42,
        drop_last: bool = False,
        prefetch_shards: int = 2,
    ):
        assert len(shards) == len(sizes) and len(shards) > 0
        self.shards = list(shards)
        self.sizes = [int(s) for s in sizes]
        self.n = sum(self.sizes)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch_shards = max(1, prefetch_shards)
        self.epoch = 0

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    # -- internals ------------------------------------------------------
    def _shard_iter(self, e: int) -> Iterator[Tuple[np.ndarray, ...]]:
        """Yields loaded+shuffled shards in the epoch's order, decoding
        ahead in a bounded background thread."""
        order = np.arange(len(self.shards))
        if self.shuffle:
            np.random.default_rng((self.seed, e)).shuffle(order)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch_shards)
        SENTINEL = object()
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that gives up when the consumer abandoned the
            # epoch (generator closed mid-iteration) — otherwise the
            # worker would block forever pinning decoded shards
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for k in order:
                    if stop.is_set():
                        return
                    arrays = self.shards[k]()
                    n = len(arrays[0])
                    assert n == self.sizes[k], (
                        f"shard {k} declared {self.sizes[k]} rows, "
                        f"loaded {n}"
                    )
                    if self.shuffle:
                        idx = np.arange(n)
                        np.random.default_rng((self.seed, e, int(k))).shuffle(idx)
                        arrays = tuple(a[idx] for a in arrays)
                    if not _put(arrays):
                        return
                _put(SENTINEL)
            except BaseException as exc:  # surface decode errors to consumer
                _put(exc)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def epoch_batches(self, epoch: Optional[int] = None) -> Iterator[Tuple]:
        e = self.epoch if epoch is None else epoch
        bs = self.batch_size
        pending: Optional[Tuple[np.ndarray, ...]] = None
        for arrays in self._shard_iter(e):
            if pending is not None:
                arrays = tuple(
                    np.concatenate([p, a]) for p, a in zip(pending, arrays)
                )
                pending = None
            n = len(arrays[0])
            full = (n // bs) * bs
            for i in range(0, full, bs):
                yield tuple(a[i : i + bs] for a in arrays)
            if full < n:
                pending = tuple(a[full:] for a in arrays)
        if pending is not None and not self.drop_last:
            yield pending
        if epoch is None:
            self.epoch += 1


def device_prefetch(batches: Iterator[Tuple], size: int = 2,
                    put: Optional[Callable] = None) -> Iterator[Tuple]:
    """Keep `size` batches already transferred to device ahead of the
    consumer (double buffering over the host↔device link).  `put` maps a
    host batch tuple to device arrays (default jax.device_put)."""
    import jax

    put = put or (lambda b: jax.tree_util.tree_map(jax.device_put, b))
    buf: "queue.Queue" = queue.Queue()
    it = iter(batches)
    try:
        for _ in range(size):
            buf.put(put(next(it)))
    except StopIteration:
        pass
    while not buf.empty():
        out = buf.get()
        try:
            buf.put(put(next(it)))
        except StopIteration:
            pass
        yield out
