"""Production serving runtime: dynamic batching over the compiled pipeline.

The reference serves nothing — its inference is a batch-1 offline loop
(reference test.py:108, 180-445).  This module is the deployment surface a
TPU chip actually wants:

  * ONE static batch shape per program.  XLA compiles the plain and the
    branched chain once at `batch_size`; every dispatch reuses them.
    Partial batches are padded (replicating the last real row) and the
    padding is dropped on output — no recompiles, ever.
  * Dynamic batching: requests queue up; a worker collects up to
    `batch_size` of them, waiting at most `max_wait_ms` after the first —
    latency-bounded batch fill, the standard TPU serving pattern.
  * Pipelined detection (overlap_detect=True): Stage A (detector) for
    batch N+1 runs on a separate thread while batch N's sampling chain is
    still executing.  The sampling scan is one long device-resident
    dispatch, so the detect thread's host work (mask fitting, transfers,
    dispatch latency over the tunnel) hides behind it instead of
    serializing with it — the reference pays Stage A serially per image
    (reference test.py:199-383).
  * Uniform/branched partitioning: Stage A (detector) runs batched on the
    collected inputs, then rows whose mask is uniform ones take the plain
    chain (half the UNet work) and only anomalous rows take the branched
    chain — the request-level generalization of the reference's whole-run
    uniform-mask bypass (reference ddpm.py:1110-1117).
  * Deterministic keys: batch i samples with fold_in(base_key, i), so a
    served result is reproducible by replaying the same rows in the same
    slots (see tests/test_serving.py).

Transport lives in scripts/serve.py (stdlib HTTP); this module is
transport-agnostic and usable in-process.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import numpy as np


@dataclass(eq=False)  # identity equality: requests are queue tickets
class _Request:
    lr: np.ndarray  # [H, W, C]
    mask: Optional[np.ndarray]  # [H, W, 1] or None → detector decides
    future: Future = field(default_factory=Future)
    t_enqueue: float = field(default_factory=time.perf_counter)


class InferenceServer:
    """Dynamic-batching front over a LocalDiffusionPipeline.

    Usage:
        srv = InferenceServer(pipe, batch_size=8, max_wait_ms=50)
        srv.start()
        fut = srv.submit(lr_image)           # [H, W, C] float32
        out = fut.result()                   # {"pred": [H,W,C], "branched": bool}
        srv.stop()
    """

    def __init__(
        self,
        pipeline,
        batch_size: int = 8,
        max_wait_ms: float = 50.0,
        base_seed: int = 0,
        merge_mixed: bool = True,
        overlap_detect: bool = True,
    ):
        self.pipe = pipeline
        self.batch_size = int(batch_size)
        self.max_wait = max_wait_ms / 1e3
        self.merge_mixed = bool(merge_mixed)
        self.overlap_detect = bool(overlap_detect)
        self.base_key = jax.random.PRNGKey(base_seed)
        self._q: "queue.Queue[_Request]" = queue.Queue()
        # detect→sample handoff: bounded so the detect thread runs at most
        # one batch ahead of the sampler (two would add queueing latency
        # without adding overlap — there is only one chip)
        self._sq: "queue.Queue" = queue.Queue(maxsize=1)
        self._stop = threading.Event()
        self._worker: Optional[threading.Thread] = None
        self._sampler_thread: Optional[threading.Thread] = None
        self._sampling = threading.Event()  # Stage B in flight
        self._batch_index = 0
        self._lock = threading.Lock()
        self.stats: Dict[str, float] = {
            "requests": 0,
            "batches": 0,
            "plain_dispatches": 0,
            "branched_dispatches": 0,
            "merged_dispatches": 0,
            "padded_slots": 0,
            "overlap_batches": 0,  # Stage A ran while a Stage B was in flight
            "latency_sum_s": 0.0,
            "latency_max_s": 0.0,
        }

    # ------------------------------------------------------------------
    def start(self, warmup: bool = False):
        """Start the batching worker.  warmup=True compiles both chain
        programs up front (first-request latency → startup latency)."""
        if warmup:
            self._warmup()
        self._stop.clear()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()
        if self.overlap_detect:
            self._sampler_thread = threading.Thread(
                target=self._sample_loop, daemon=True
            )
            self._sampler_thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._worker is not None:
            self._worker.join(timeout=60)
            self._worker = None
        if self._sampler_thread is not None:
            self._sq.put(None)  # sentinel: drain-and-exit
            self._sampler_thread.join(timeout=120)
            self._sampler_thread = None
        # requests still queued will never be processed — fail their
        # futures so callers blocked in result(timeout=...) return now
        # instead of hanging until their timeout
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            if not req.future.done():
                req.future.set_exception(RuntimeError("server stopped"))

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # ------------------------------------------------------------------
    def submit(self, lr: np.ndarray, mask: Optional[np.ndarray] = None) -> Future:
        """Enqueue one [H, W, C] conditioning image; resolves to a dict with
        'pred' [H, W, C], 'mask', 'branched', 'latency_s'."""
        lr = np.asarray(lr, np.float32)
        if lr.ndim != 3:
            raise ValueError(f"submit expects one [H,W,C] image, got {lr.shape}")
        req = _Request(lr=lr, mask=None if mask is None else np.asarray(mask, np.float32))
        self._q.put(req)
        return req.future

    # ------------------------------------------------------------------
    def _warmup(self):
        b = self.batch_size
        s = self.pipe.gd.image_size
        c = self.pipe.gd.model_cfg.channels
        zeros = np.zeros((b, s, s, c), np.float32)
        key = jax.random.fold_in(self.base_key, 0)
        # plain program
        self.pipe.translate(zeros, key=key, mask=np.ones((b, s, s, 1), np.float32))
        if self.pipe.config.sampler.branch_out:
            half = np.ones((b, s, s, 1), np.float32)
            half[:, :, : s // 2] = 0.5
            self.pipe.translate(zeros, key=key, mask=half)

    def _collect(self) -> List[_Request]:
        """Block for the first request, then fill the batch for max_wait."""
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait
        while len(batch) < self.batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        """Collect + Stage A.  With overlap_detect, finished batches are
        handed to the sampler thread; otherwise Stage B runs inline."""
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            key = jax.random.fold_in(self.base_key, self._batch_index)
            self._batch_index += 1
            try:
                overlapped = self._sampling.is_set()
                self._stage_a(batch)
                if overlapped:
                    with self._lock:
                        self.stats["overlap_batches"] += 1
            except Exception as e:  # resolve futures, keep serving
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
                continue
            if self.overlap_detect:
                self._sq.put((batch, key))
            else:
                self._run_stage_b(batch, key)

    def _sample_loop(self):
        while True:
            item = self._sq.get()
            if item is None:  # stop() sentinel — queued batches already drained (FIFO)
                return
            batch, key = item
            self._run_stage_b(batch, key)

    def _run_stage_b(self, batch: List[_Request], key):
        self._sampling.set()
        try:
            self._stage_b(batch, key)
        except Exception as e:
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)
        finally:
            self._sampling.clear()

    # ------------------------------------------------------------------
    def _pad(self, rows: List[np.ndarray]) -> np.ndarray:
        """Stack rows and pad to the static batch size by replicating the
        last row (keeps padding in-distribution; dropped on output)."""
        arr = np.stack(rows)
        pad = self.batch_size - len(rows)
        if pad > 0:
            arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
        return arr

    def _stage_a(self, batch: List[_Request]):
        """Detector masks for rows that did not bring one."""
        scfg = self.pipe.config.sampler
        need = [r for r in batch if r.mask is None]
        if need and self.pipe.frontend is not None and scfg.ood_ad:
            lrs = self._pad([r.lr for r in need])
            masks, _, _ = self.pipe.frontend.detect(lrs)
            for r, m in zip(need, np.asarray(masks)):
                r.mask = m
        for r in batch:
            if r.mask is None:
                r.mask = np.ones((*r.lr.shape[:2], 1), np.float32)

    def _stage_b(self, batch: List[_Request], key):
        scfg = self.pipe.config.sampler
        # partition: uniform-ones masks → plain chain (1 UNet call/step),
        # anomalous masks → branched chain (2 calls/step)
        plain = [r for r in batch if np.all(r.mask == 1.0) or not scfg.branch_out]
        branched = [r for r in batch if r not in plain]

        # mixed batch → ONE branched dispatch for everything: a plain row
        # rides the branched program under its uniform-ones mask (the fused
        # image is the IND branch everywhere, i.e. the plain trajectory).
        # Cost: 2·B UNet calls/step vs 3·B for two padded dispatches
        # (B plain + 2B branched) — strictly cheaper AND fewer padded
        # slots.  Deterministic: routing depends only on batch composition.
        # merge_mixed=False keeps the two-dispatch route (the measurement
        # knob for this policy — scripts/bench_serve.py --split-mixed).
        if plain and branched and self.merge_mixed:
            groups = [(batch, True, "merged_dispatches")]
        else:
            groups = [(plain, False, "plain_dispatches"),
                      (branched, True, "branched_dispatches")]

        outs: Dict[int, Dict] = {}
        for group, is_branched, stat_key in groups:
            if not group:
                continue
            lr = self._pad([r.lr for r in group])
            mask = self._pad([r.mask for r in group])
            res = self.pipe.translate(lr, key=key, mask=mask)
            with self._lock:  # snapshot_stats reads from another thread
                self.stats[stat_key] += 1
                self.stats["padded_slots"] += self.batch_size - len(group)
            for i, r in enumerate(group):
                outs[id(r)] = {
                    "pred": res["pred"][i],
                    "mask": np.asarray(r.mask),
                    # per-row flag: a plain row riding a merged branched
                    # dispatch was still served the plain trajectory
                    "branched": bool(res["branched"])
                    and not bool(np.all(r.mask == 1.0)),
                }

        now = time.perf_counter()
        with self._lock:
            self.stats["requests"] += len(batch)
            self.stats["batches"] += 1
        for r in batch:
            out = outs[id(r)]
            lat = now - r.t_enqueue
            out["latency_s"] = lat
            with self._lock:
                self.stats["latency_sum_s"] += lat
                self.stats["latency_max_s"] = max(self.stats["latency_max_s"], lat)
            r.future.set_result(out)

    # ------------------------------------------------------------------
    def snapshot_stats(self) -> Dict[str, float]:
        with self._lock:
            s = dict(self.stats)
        if s["requests"]:
            s["latency_mean_s"] = s["latency_sum_s"] / s["requests"]
            s["mean_batch_fill"] = s["requests"] / max(s["batches"], 1)
        return s
