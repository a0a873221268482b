#!/usr/bin/env python
"""Profile the bench train step on the real TPU and aggregate leaf op times.

Usage: timeout 580 python scripts/profile_bench.py [--model b32] [--epochs 2]
Prints a sorted table of device-op time by HLO op category.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", type=str, default="b32", choices=["b32", "b16"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n-train", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--method", type=str, default="kadaptation")
    ap.add_argument("--trace-dir", type=str, default="/tmp/jax_trace")
    args = ap.parse_args()
    if args.model == "b16" and args.batch > 64:
        args.batch = 32

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from pevit_tpu.config import get_default_config
    from pevit_tpu.core import CLIPSpec, init_clip_params
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.train import TaskStatic, TrainTask
    from pevit_tpu.train.optim import make_optimizer
    from pevit_tpu.train.trainer import build_fit_fn

    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = 100
    cfg.TRAIN.BATCH_SIZE_PER_GPU = args.batch
    cfg.TEST.METRIC = "accuracy"
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.USE_PALLAS_ATTENTION = jax.default_backend() == "tpu"

    spec = CLIPSpec.vit_b16() if args.model == "b16" else CLIPSpec.vit_b32()
    clip_params = init_clip_params(jax.random.PRNGKey(0), spec)
    static = TaskStatic.from_config(cfg, spec, PeftConfig(method=args.method))
    task = TrainTask(cfg, static, clip_params)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(1))

    n = args.n_train
    rng = np.random.default_rng(0)
    images = task.prepack(rng.integers(0, 255, (n, 224, 224, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 100, (n,), dtype=np.int64).astype(np.int32))

    fit = jax.jit(build_fit_fn(static, n, args.epochs, task.preproc), donate_argnums=(3,))
    opt_init, _ = make_optimizer("sgd")
    state = (trainable, opt_init(trainable), bn_state, jax.random.PRNGKey(2))
    lr_table = jnp.full((args.epochs,), 0.01, jnp.float32)
    wd = jnp.float32(1e-4)

    state = fit(frozen, images, labels, state, lr_table, wd)
    float(jax.tree.leaves(state[0])[0].ravel()[0])  # real sync

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    jax.profiler.start_trace(args.trace_dir)
    state = fit(frozen, images, labels, state, lr_table, wd)
    float(jax.tree.leaves(state[0])[0].ravel()[0])
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(args.trace_dir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {args.trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # map pid -> name to find the TPU device timeline
    pid_names = {
        e["pid"]: e["args"]["name"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu_pids = {p for p, nm in pid_names.items() if "TPU" in nm.upper() or "device" in nm.lower()}
    # keep only the "XLA Ops" thread: the "Steps"/"XLA Modules" tracks carry
    # whole-program span events (one per dispatch) that would double the
    # total and show up as a giant unnamed row (r3 finding)
    op_tids = {
        (e["pid"], e["tid"])
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and "op" in e["args"]["name"].lower()
    }
    agg = collections.defaultdict(float)
    examples = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        if op_tids and (e["pid"], e.get("tid")) not in op_tids:
            continue
        name = e.get("name", "")
        if name.startswith(("while", "conditional", "jit_", "body")):
            continue
        dur = e.get("dur", 0)
        # category = hlo op base name (strip .N suffixes and fusion numbering)
        base = name.split(".")[0].rstrip("0123456789_")
        agg[base] += dur
        total += dur
        ln = (e.get("args") or {}).get("long_name", "")
        if base not in examples or dur > examples[base][0]:
            examples[base] = (dur, name, ln[:160])
    print(f"pids: { {p: pid_names[p] for p in tpu_pids} }")
    print(f"total device-op time: {total/1e6:.3f} s  ({args.epochs} epochs x {args.n_train} imgs)")
    imgs = args.epochs * args.n_train
    print(f"=> {imgs/ (total/1e6):.0f} img/s of pure device-op time")
    print(f"{'op':<28}{'ms':>10}{'%':>7}   example (biggest instance)")
    for base, us in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        _, nm, ln = examples[base]
        print(f"{base:<28}{us/1e3:>10.2f}{100*us/total:>6.1f}%   {nm} | {ln[:110]}")


if __name__ == "__main__":
    main()
