#!/usr/bin/env python
"""Serving throughput benchmark: dynamic-batched translation requests/s.

The reference's inference is an offline batch-1 loop (reference
test.py:108, 392-415, one image per sample() call); the serving runtime
(localdiffusion_tpu/serving.py) batches concurrent requests into
static-shape compiled chains.  This measures the deployment metric the
reference never could: sustained translated-images/s under concurrent load,
with latency percentiles and batch fill.

    python scripts/bench_serve.py --config configs/mnist.yaml \
        --milestone best10000 [--detector none] [--requests 256] \
        [--clients 16] [--batch-size 8] [--max-wait-ms 30]

Prints one JSON line: {"metric": "serve_images_per_s", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/mnist.yaml")
    ap.add_argument("--milestone", default="best10000")
    ap.add_argument("--params-npz", default=None)
    ap.add_argument("--detector", default=None,
                    help="override ood detector (patchcore|seg|manual|none)")
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=30.0)
    ap.add_argument("--dtype", choices=["float32", "bfloat16"], default=None,
                    help="compute dtype override (bf16 chains run 2-5x faster)")
    ap.add_argument("--mesh-data", type=int, default=0,
                    help="shard serving batches over a mesh with this 'data' "
                         "width (0 = no mesh, single device)")
    ap.add_argument("--mesh-patch", type=int, default=1,
                    help="'patch' width for the branched IND/OOD pair")
    ap.add_argument("--plain-frac", type=float, default=0.0,
                    help="fraction of requests submitted with a uniform-ones "
                         "mask (plain-chain rows) — creates MIXED batches to "
                         "exercise the merged-vs-split dispatch policy")
    ap.add_argument("--split-mixed", action="store_true",
                    help="serve mixed batches as two dispatches (plain + "
                         "branched) instead of one merged branched dispatch "
                         "— the policy A/B for serving.py")
    ap.add_argument("--no-overlap", action="store_true",
                    help="disable the pipelined Stage A (detect batch N+1 "
                         "while batch N samples) — the overlap A/B")
    args = ap.parse_args()

    from localdiffusion_tpu.utils.logging import (
        enable_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()
    enable_compilation_cache()

    import dataclasses

    from scripts.train import load_config

    from localdiffusion_tpu.factory import build_pipeline
    from localdiffusion_tpu.serving import InferenceServer

    cfg = load_config(args.config)
    if args.dtype:
        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train, compute_dtype=args.dtype)
        )
    if args.detector:
        cfg = cfg.replace(ood=dataclasses.replace(cfg.ood, detector=args.detector))
    mesh = None
    if args.mesh_data:
        from localdiffusion_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=args.mesh_data, patch=args.mesh_patch)
        if args.batch_size % args.mesh_data:
            ap.error(f"--batch-size {args.batch_size} must be divisible by "
                     f"--mesh-data {args.mesh_data}")
    pipe = build_pipeline(cfg, milestone=args.milestone,
                          params_npz=args.params_npz, mesh=mesh)

    size = cfg.diffusion.image_size
    ch = cfg.model.channels
    rng = np.random.default_rng(0)
    # request pool drawn from the config's test distribution when available,
    # else uniform noise in the data range (throughput is shape-dependent,
    # not content-dependent — the chain is a static program)
    images = rng.uniform(0.0, 2.0, (32, size, size, ch)).astype(np.float32)

    if args.clients > args.requests:
        args.clients = args.requests
    srv = InferenceServer(pipe, batch_size=args.batch_size,
                          max_wait_ms=args.max_wait_ms,
                          merge_mixed=not args.split_mixed,
                          overlap_detect=not args.no_overlap)
    ones_mask = np.ones((size, size, 1), np.float32)
    try:
        # warmup: the server's own warmup compiles BOTH the plain and the
        # branched chain (a single request would compile only the chain it
        # happens to route to, pushing the other compile into the timing)
        t_build = time.time()
        srv.start(warmup=True)
        srv.submit(images[0]).result()
        warmup_s = time.time() - t_build

        latencies = []
        lat_lock = threading.Lock()
        n_per_client = args.requests // args.clients

        def client(cid):
            for i in range(n_per_client):
                k = cid * n_per_client + i
                img = images[k % len(images)]
                # deterministically mark a --plain-frac share of requests as
                # known-normal (uniform-ones mask → plain chain row)
                mask = ones_mask if (
                    args.plain_frac > 0
                    and (k % 100) < args.plain_frac * 100
                ) else None
                t0 = time.time()
                srv.submit(img, mask=mask).result()
                with lat_lock:
                    latencies.append(time.time() - t0)

        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(args.clients)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.time() - t0
        stats = srv.snapshot_stats()
    finally:
        srv.stop()

    n = len(latencies)
    lat = np.array(latencies)
    out = {
        "metric": "serve_images_per_s",
        "value": round(n / dt, 2),
        "unit": "img/s",
        "requests": n,
        "clients": args.clients,
        "batch_size": args.batch_size,
        "mesh": (f"data={args.mesh_data},patch={args.mesh_patch}"
                 if mesh is not None else "none"),
        "detector": cfg.ood.detector,
        "plain_frac": args.plain_frac,
        "mixed_policy": "split" if args.split_mixed else "merged",
        "overlap_detect": not args.no_overlap,
        "p50_s": round(float(np.percentile(lat, 50)), 4),
        "p95_s": round(float(np.percentile(lat, 95)), 4),
        "p99_s": round(float(np.percentile(lat, 99)), 4),
        "warmup_s": round(warmup_s, 2),
        "server_stats": {k: (round(v, 4) if isinstance(v, float) else v)
                         for k, v in stats.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
