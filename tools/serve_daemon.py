#!/usr/bin/env python
"""HTTP serving daemon: a StableHLO classifier artifact behind a socket.

Minimal production front-end for the serving stack (docs/serving.md): load
an artifact (or export fresh from a checkpoint), wrap it in
:class:`pevit_tpu.serve.InferencePipeline`, and answer requests:

  POST /infer    body = .npy (numpy save format) uint8 array (N, H, W, 3)
                 response = .npy float32 logits (N, K)
  GET  /healthz  liveness: {"status": "ok", "image_size": S}
  GET  /stats    cumulative {"images", "batches", "seconds", "throughput",
                 "requests", "groups", "latency": {count, mean_ms, p50_ms,
                 p95_ms, p99_ms}} — per-request wall latency percentiles
                 (enqueue -> logits ready) over a recent-window reservoir

The .npy wire format keeps the protocol dependency-free on both ends
(`np.save`/`np.load` over HTTP; curl works too).  Concurrent requests are
coalesced by :class:`pevit_tpu.serve.MicroBatcher`: requests arriving
within ``--window-ms`` of each other (or until a full device batch is
pending) share ONE pipeline submission, so 8 concurrent 1-image clients
cost one 8-image batch instead of 8 serialized dispatches; within each
submission the pipeline keeps the device fed (bucketed batching +
``depth`` batches in flight).

    # serve an exported artifact
    python tools/serve_daemon.py --artifact cifar10.stablehlo --port 8000

    # or deploy straight from a checkpoint (program-only export at boot)
    python tools/serve_daemon.py --model resources/model/vitb32_CLIP.yaml \
        --ds resources/datasets/cifar10.yaml --weights-from /ckpts/cifar10 \
        --port 8000

    # client
    import io, urllib.request, numpy as np
    buf = io.BytesIO(); np.save(buf, images_u8)
    req = urllib.request.Request("http://host:8000/infer", data=buf.getvalue())
    logits = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
"""

from __future__ import annotations

import argparse
import io
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

MAX_BODY = 1 << 30  # 1 GiB request cap


def make_server(call_fn, image_size: int, *, host: str = "127.0.0.1",
                port: int = 0, max_batch: int = 256, min_bucket: int = 8,
                depth: int = 2, place_fn=None,
                window_ms: float = 2.0, pad_policy: str = "bucket") -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server around ``call_fn``."""
    from pevit_tpu.serve import InferencePipeline, MicroBatcher

    pipe = InferencePipeline(call_fn, max_batch=max_batch,
                             min_bucket=min_bucket, depth=depth,
                             place_fn=place_fn, pad_policy=pad_policy)
    batcher = MicroBatcher(pipe, window_ms=window_ms)

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _reply(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "image_size": image_size})
            elif self.path == "/stats":
                self._json(200, {**pipe.stats, **batcher.stats,
                                 "throughput": pipe.throughput,
                                 "latency": batcher.latency_stats()})
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/infer":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                if not 0 < n <= MAX_BODY:
                    raise ValueError(f"bad Content-Length {n}")
                imgs = np.load(io.BytesIO(self.rfile.read(n)), allow_pickle=False)
                if imgs.dtype != np.uint8 or imgs.ndim != 4 or imgs.shape[0] == 0:
                    raise ValueError(
                        f"want uint8 (N,H,W,3) with N>0, got {imgs.dtype} {imgs.shape}")
                if imgs.shape[1:3] != (image_size, image_size):
                    raise ValueError(
                        f"model takes {image_size}x{image_size} frames, got {imgs.shape}")
            except Exception as e:  # malformed request: client error, stay up
                self._json(400, {"error": str(e)})
                return
            try:
                logits = batcher.infer(imgs)
                buf = io.BytesIO()
                np.save(buf, logits)
                self._reply(200, buf.getvalue(), "application/octet-stream")
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet access log
            pass

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.pipeline = pipe  # for /stats introspection in tests
    srv.batcher = batcher
    return srv


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--artifact", default="", help=".stablehlo artifact to serve")
    ap.add_argument("--model", default="", help="model YAML (checkpoint-deploy mode, "
                    "or to rebuild a program-only artifact's weight bundle)")
    ap.add_argument("--ds", default="", help="dataset YAML (sets NUM_CLASSES)")
    ap.add_argument("--method", default="kadaptation")
    ap.add_argument("--weights-from", default="", help="Orbax dir with trained state")
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-batch", type=int, default=256)
    ap.add_argument("--min-bucket", type=int, default=8)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--pad-policy", choices=["bucket", "exact"], default="bucket",
                    help="'exact' never pads ragged tails: training-equal numerics "
                         "for composition-sensitive PEFT towers, one compile per "
                         "distinct size (offline batch scoring, not public traffic)")
    ap.add_argument("--window-ms", type=float, default=2.0,
                    help="cross-request micro-batching window (0 disables waiting)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("opts", nargs=argparse.REMAINDER, help="KEY VALUE config overrides")
    args = ap.parse_args(argv)

    from pevit_tpu.utils.platform import ensure_platform

    ensure_platform()
    from pevit_tpu.serving_loader import load_serving_callable

    config = None
    if args.model or args.ds:
        from pevit_tpu.config import get_default_config, update_config

        config = get_default_config()
        for cfg_file in (args.ds, args.model):
            if cfg_file:
                args.cfg = cfg_file
                update_config(config, args)

    call, image_size = load_serving_callable(
        artifact=args.artifact, config=config, method=args.method,
        weights_from=args.weights_from, quantize=args.quantize, seed=args.seed,
    )
    srv = make_server(call, image_size, host=args.host, port=args.port,
                      max_batch=args.max_batch, min_bucket=args.min_bucket,
                      depth=args.depth, window_ms=args.window_ms,
                      pad_policy=args.pad_policy)
    print(f"serving on http://{args.host}:{srv.server_address[1]} "
          f"(image_size={image_size}, max_batch={args.max_batch}, "
          f"depth={args.depth})", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
    finally:
        srv.batcher.close()


if __name__ == "__main__":
    main()
