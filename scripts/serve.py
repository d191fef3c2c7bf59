#!/usr/bin/env python
"""HTTP serving entry: dynamic-batching local-diffusion translation service.

The reference has no serving path (its test.py is an offline batch-1 loop);
this is the deployment surface for the TPU-native pipeline
(localdiffusion_tpu/serving.py: static-shape compile-once programs, dynamic
batching, uniform/branched request partitioning).

    python scripts/serve.py --config configs/mnist.yaml --milestone best10000 \
        [--detector patchcore|seg|manual|none] [--port 8800] \
        [--batch-size 8] [--max-wait-ms 50]

Protocol (stdlib HTTP, JSON bodies):
  POST /v1/translate   {"image": [[..HxW..], ...] nested list (HxW or HxWxC),
                        "mask": optional same-shape-with-1-channel list}
                     → {"pred": [...], "branched": bool, "latency_s": f}
  GET  /healthz        → {"ok": true}
  GET  /stats          → serving counters (batches, fill, latencies)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_pipeline(args):
    """Same construction path as scripts/test.py, via the library factory."""
    import dataclasses

    from scripts.train import load_config

    from localdiffusion_tpu.factory import build_pipeline as factory_build

    cfg = load_config(args.config)
    if getattr(args, "dtype", None):
        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train, compute_dtype=args.dtype)
        )
    if args.detector:
        cfg = cfg.replace(ood=dataclasses.replace(cfg.ood, detector=args.detector))
    # strict: a serving deployment must fail startup on a missing/corrupt
    # checkpoint instead of silently serving random-init predictions
    return factory_build(cfg, milestone=args.milestone,
                         params_npz=args.params_npz,
                         strict=not getattr(args, "allow_random_init", False))


def make_handler(server, channels):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet access log
            pass

        def do_GET(self):
            if self.path == "/healthz":
                return self._send(200, {"ok": True})
            if self.path == "/stats":
                return self._send(200, server.snapshot_stats())
            return self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/v1/translate":
                return self._send(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                img = np.asarray(req["image"], np.float32)
                if img.ndim == 2:
                    img = img[..., None]
                if img.shape[-1] != channels:
                    raise ValueError(
                        f"expected {channels} channel(s), got {img.shape}"
                    )
                mask = req.get("mask")
                if mask is not None:
                    mask = np.asarray(mask, np.float32)
                    if mask.ndim == 2:
                        mask = mask[..., None]
                out = server.submit(img, mask=mask).result(timeout=600)
                return self._send(200, {
                    "pred": np.asarray(out["pred"], np.float32).tolist(),
                    "branched": out["branched"],
                    "latency_s": out["latency_s"],
                })
            except Exception as e:
                return self._send(400, {"error": str(e)})

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--milestone", default="latest")
    ap.add_argument("--params-npz", default=None)
    ap.add_argument("--detector", default=None,
                    help="override config detector (patchcore|seg|manual|none)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8800)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=50.0)
    ap.add_argument("--dtype", choices=["float32", "bfloat16"], default=None,
                    help="compute dtype override (bf16 chains run 2-5x faster)")
    ap.add_argument("--allow-random-init", action="store_true",
                    help="serve random-init params when no checkpoint loads "
                         "(smoke tests only; default is to fail startup)")
    args = ap.parse_args()

    from localdiffusion_tpu.serving import InferenceServer
    from localdiffusion_tpu.utils.logging import (
        enable_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()

    enable_compilation_cache()
    pipe = build_pipeline(args)
    srv = InferenceServer(pipe, batch_size=args.batch_size,
                          max_wait_ms=args.max_wait_ms)
    print("compiling serving programs...", flush=True)
    srv.start(warmup=True)

    from http.server import ThreadingHTTPServer

    channels = pipe.gd.model_cfg.channels
    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(srv, channels))
    print(f"serving on http://{args.host}:{args.port} "
          f"(batch {args.batch_size}, wait {args.max_wait_ms} ms)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        srv.stop()


if __name__ == "__main__":
    main()
