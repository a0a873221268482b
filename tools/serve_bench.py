#!/usr/bin/env python
"""Serving throughput benchmark: artifact replay through InferencePipeline.

Measures sustained images/sec of a StableHLO serving artifact (or a freshly
exported one) under three drivers and prints one JSON line per arm:

  * ``naive``  — transfer -> compute -> fetch, strictly serial per batch;
  * ``pipeN``  — :class:`pevit_tpu.serve.InferencePipeline` with N batches
    in flight (double/triple buffering: the device computes batch i while
    the host pads + ships batch i+1);
  * ``daemonN`` (``--clients N``) — the FULL HTTP daemon under N concurrent
    clients posting ``--client-batch``-image requests: measures the
    MicroBatcher's cross-request coalescing end-to-end over real sockets.

The reference has no serving runtime at all (SURVEY.md §5.4); this tool is
the measurement harness for the beyond-reference serving stack and the
source of the serving numbers in ARCHITECTURE.md.

    # fresh-export B/32, bf16, batch 256, 8192 synthetic images, on the TPU
    python tools/serve_bench.py --model resources/model/vitb32_CLIP.yaml \
        --batch 256 --images 8192 MODEL.PRETRAINED random

    # replay a previously exported program-only artifact
    python tools/serve_bench.py --artifact clf.stablehlo --weights-from ckpt/
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _config_from(args):
    from pevit_tpu.config import get_default_config, update_config

    config = get_default_config()
    for cfg_file in (args.ds, args.model):
        if cfg_file:
            args.cfg = cfg_file
            update_config(config, args)
    return config


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--artifact", default="", help="replay this .stablehlo artifact "
                    "(default: fresh export from --model/--ds)")
    ap.add_argument("--model", default="", help="model YAML (fresh-export mode)")
    ap.add_argument("--ds", default="", help="dataset YAML (sets NUM_CLASSES)")
    ap.add_argument("--method", default="kadaptation")
    ap.add_argument("--weights-from", default="", help="Orbax dir for the trained "
                    "state (program-only artifacts / fresh export)")
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--images", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--depths", default="2,3", help="pipeline depths to measure")
    ap.add_argument("--clients", type=int, default=0,
                    help="add a daemon arm with this many concurrent HTTP clients")
    ap.add_argument("--client-batch", type=int, default=16,
                    help="images per HTTP request in the daemon arm")
    ap.add_argument("--window-ms", type=float, default=2.0,
                    help="daemon micro-batching window")
    ap.add_argument("--request-sizes", default="",
                    help="comma list of ragged request sizes: adds a mixed-size "
                         "request-stream arm per --pad-policies entry "
                         "(the pad_policy='exact' cost/benefit A/B)")
    ap.add_argument("--pad-policies", default="bucket,exact",
                    help="policies measured by the --request-sizes arm")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("opts", nargs=argparse.REMAINDER, help="KEY VALUE config overrides")
    args = ap.parse_args(argv)

    from pevit_tpu.utils.platform import ensure_platform

    ensure_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pevit_tpu.serve import InferencePipeline
    from pevit_tpu.serving_loader import load_serving_callable

    if not args.artifact and not args.model:
        raise SystemExit("need --model (fresh export) or --artifact (replay)")
    config = _config_from(args) if (args.model or args.ds) else None
    if config is not None and int(config.DATASET.NUM_CLASSES) <= 0:
        # bench harness: any head size exercises the same program shape —
        # default to 100 classes when no dataset YAML pins one
        config.defrost()
        config.DATASET.NUM_CLASSES = 100
        config.freeze()
        print("# no --ds: benching with a 100-class head", flush=True)
    call, image_size = load_serving_callable(
        artifact=args.artifact, config=config, method=args.method,
        weights_from=args.weights_from, quantize=args.quantize, seed=args.seed,
    )

    rng = np.random.default_rng(args.seed)
    n = (args.images // args.batch) * args.batch or args.batch
    stream = rng.integers(0, 256, (n, image_size, image_size, 3), np.uint8)

    t0 = time.time()
    w = call(jnp.asarray(stream[: args.batch]))
    _ = float(np.asarray(w[:1, :1]).ravel()[0])  # burn compile + first-dispatch tax
    print(f"# warmup {time.time() - t0:.1f}s", flush=True)

    def run_naive():
        out = []
        for off in range(0, n, args.batch):
            dev = call(jnp.asarray(stream[off:off + args.batch]))
            out.append(np.asarray(dev, np.float32))  # fetch blocks the next ship
        return np.concatenate(out)

    def run_pipe(depth):
        pipe = InferencePipeline(call, max_batch=args.batch,
                                 min_bucket=args.batch, depth=depth)
        return pipe(stream)

    def run_daemon():
        """Full HTTP daemon under --clients concurrent posters."""
        import importlib.util
        import io
        import threading
        import urllib.request

        spec = importlib.util.spec_from_file_location(
            "serve_daemon", REPO / "tools" / "serve_daemon.py")
        daemon = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(daemon)
        depth = max((int(x) for x in args.depths.split(",") if x), default=2)
        srv = daemon.make_server(call, image_size, port=0, max_batch=args.batch,
                                 min_bucket=8, depth=depth, window_ms=args.window_ms)
        st = threading.Thread(target=srv.serve_forever, daemon=True)
        st.start()
        url = f"http://127.0.0.1:{srv.server_address[1]}/infer"
        out = np.empty((n, num_classes), np.float32)
        errors = []

        def client(cid):
            try:
                for off in range(cid * per_client, (cid + 1) * per_client,
                                 args.client_batch):
                    chunk = stream[off : off + args.client_batch]
                    buf = io.BytesIO()
                    np.save(buf, chunk)
                    req = urllib.request.Request(url, data=buf.getvalue())
                    with urllib.request.urlopen(req, timeout=600) as r:
                        out[off : off + chunk.shape[0]] = np.load(io.BytesIO(r.read()))
            except Exception as e:  # surface in the main thread
                errors.append(e)

        per_client = n // args.clients
        threads = [threading.Thread(target=client, args=(c,)) for c in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        srv.shutdown()
        srv.batcher.close()
        if errors:
            raise errors[0]
        groups = srv.batcher.stats["groups"]
        reqs = srv.batcher.stats["requests"]
        print(f"#   daemon: {reqs} requests coalesced into {groups} device groups",
              flush=True)
        print(f"#   daemon latency: {srv.batcher.latency_stats()}", flush=True)
        return out[: per_client * args.clients]

    def run_mix(policy):
        """Ragged request-size mix through the pipeline under one pad policy.

        The pad_policy='exact' A/B: 'bucket' pads each ragged request up to
        a power-of-two (bounded compiles), 'exact' runs every distinct size
        natural (training-equal numerics, one compile per size).  Steady-state
        throughput should match; the first exact rep pays the extra compiles.
        """
        depth = max((int(x) for x in args.depths.split(",") if x), default=2)
        pipe = InferencePipeline(call, max_batch=args.batch, min_bucket=8,
                                 depth=depth, pad_policy=policy)
        reqs, off, i = [], 0, 0
        while off < n:
            s = min(mix_sizes[i % len(mix_sizes)], n - off)
            reqs.append(stream[off:off + s])
            off += s
            i += 1
        return np.concatenate(pipe.run(reqs))

    num_classes = int(np.asarray(w).shape[-1])
    mix_sizes = [int(x) for x in args.request_sizes.split(",") if x]
    arms = [("naive", run_naive)]
    arms += [(f"pipe{d}", (lambda d=d: run_pipe(d)))
             for d in (int(x) for x in args.depths.split(",") if x)]
    if args.clients:
        arms.append((f"daemon{args.clients}", run_daemon))
    if mix_sizes:
        for pol in (p.strip() for p in args.pad_policies.split(",") if p.strip()):
            arms.append((f"mix-{pol}", lambda pol=pol: run_mix(pol)))
    results = {name: [] for name, _ in arms}
    last_out = {}
    ref = None
    for rep in range(args.reps):  # interleaved reps: relay drift hits all arms
        for name, fn in arms:
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            results[name].append(len(out) / dt)
            last_out[name] = out
            if ref is None:
                ref = out
            elif name.startswith("mix-"):
                # mix arms repartition the stream into ragged requests, and
                # bucket padding legitimately shifts composition-sensitive
                # logits (the reason pad_policy='exact' exists) — so gate
                # only against ROUTING bugs (swapped rows => argmax churn
                # near 1/K and O(scale) diffs), and report the delta.
                m = min(len(out), len(ref))
                scale = float(np.abs(ref[:m]).max()) or 1.0
                maxd = float(np.abs(out[:m] - ref[:m]).max())
                agree = float((out[:m].argmax(1) == ref[:m].argmax(1)).mean())
                if agree < 0.90 or maxd > 0.5 * scale:
                    raise SystemExit(
                        f"{name} rep{rep}: row routing broken vs first arm "
                        f"(max|d|={maxd:.4f} at scale {scale:.2f}, "
                        f"argmax agreement {agree:.4f})")
                print(f"#   {name}: argmax agreement {agree:.4f}, "
                      f"max|d| {maxd:.4f} vs batch arm", flush=True)
            else:
                m = min(len(out), len(ref))  # daemon arm trims to clients*per_client
                # Cross-arm equality must be SHAPE-ROBUST: the daemon's
                # coalesced groups run bucketed sub-batches whose bf16
                # rounding legitimately differs from the batch-N arms (at
                # logit scale ~100 one bf16 ulp is ~0.5).  Same-shape arms
                # stay bit-close; across shapes, gate on relative max-diff
                # plus argmax agreement — a routing bug (rows swapped
                # between requests) produces O(logit-range) diffs and
                # argmax churn, far past both gates.
                scale = float(np.abs(ref[:m]).max()) or 1.0
                maxd = float(np.abs(out[:m] - ref[:m]).max())
                agree = float((out[:m].argmax(1) == ref[:m].argmax(1)).mean())
                if maxd > 0.02 * scale or agree < 0.995:
                    raise SystemExit(
                        f"{name} rep{rep}: logits mismatch vs first arm "
                        f"(max|d|={maxd:.4f} at scale {scale:.2f}, "
                        f"argmax agreement {agree:.4f})")
            print(f"# {name} rep{rep}: {len(out) / dt:.0f} img/s ({dt:.1f}s)", flush=True)

    if "mix-bucket" in last_out and "mix-exact" in last_out:
        # the numerics delta pad_policy='exact' removes: same rows, same
        # request partition, padded vs natural sub-batches
        d = float(np.abs(last_out["mix-bucket"] - last_out["mix-exact"]).max())
        s = float(np.abs(last_out["mix-exact"]).max()) or 1.0
        print(f"# pad-policy numerics: max|bucket - exact| = {d:.6f} "
              f"(logit scale {s:.2f})", flush=True)
    for name, vals in results.items():
        out_rec = {
            "arm": name, "img_per_s_best": round(max(vals), 1),
            "img_per_s_all": [round(v, 1) for v in vals],
            "batch": args.batch, "images": n,
        }
        if name.startswith("mix-"):
            out_rec["request_sizes"] = mix_sizes
        print(json.dumps(out_rec), flush=True)
    return results


if __name__ == "__main__":
    main()
