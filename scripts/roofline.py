#!/usr/bin/env python
"""HBM roofline bound for the training program (VERDICT r2 'prove the ceiling').

The r2 profile work concluded the B/32 fit program is HBM-bound on
mandatory stash/LN traffic (ARCHITECTURE.md perf notes) — this script
QUANTIFIES that claim: it compiles the exact bench fit program, takes
XLA's own post-optimization cost analysis (``compiled.cost_analysis()``:
``bytes accessed`` is summed over the optimized/fused HLO, i.e. a direct
estimate of HBM traffic; ``flops`` likewise), measures wall-clock the same
way bench.py does, and reports

    achieved_bytes_per_s = bytes_accessed_per_run / measured_time
    roofline_fraction    = achieved_bytes_per_s / chip_HBM_bandwidth
    mfu                  = achieved_flops_per_s / chip_peak_flops

A roofline_fraction near 1 proves the program runs at the memory wall —
further kernel work can only help by REMOVING traffic (fusing stashes),
not by scheduling the existing traffic better.

    timeout 580 python scripts/roofline.py [--model b32] [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# (HBM GB/s, peak bf16 TFLOP/s) by device_kind substring; public TPU specs
CHIP_SPECS = {
    "v6e": (1640.0, 918.0),
    "v6": (1640.0, 918.0),
    "v5p": (2765.0, 459.0),
    "v5e": (819.0, 197.0),
    "v5 lite": (819.0, 197.0),
    "v4": (1228.0, 275.0),
    "v3": (900.0, 123.0),
    "v2": (700.0, 46.0),
}


def chip_peaks(kind: str):
    k = kind.lower()
    for sub, peaks in CHIP_SPECS.items():
        if sub in k:
            return peaks
    return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="b32", choices=["b32", "b16"])
    ap.add_argument("--batch", type=int, default=0, help="0 = operating point (b32:128, b16:16)")
    ap.add_argument("--n-train", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--method", default="kadaptation")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--fast-ln", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from pevit_tpu.config import get_default_config
    from pevit_tpu.core import CLIPSpec, init_clip_params
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.train import TaskStatic, TrainTask
    from pevit_tpu.train.optim import make_optimizer
    from pevit_tpu.train.trainer import build_fit_fn

    batch = args.batch or {"b32": 128, "b16": 16}[args.model]
    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = 100
    cfg.TRAIN.BATCH_SIZE_PER_GPU = batch
    cfg.TEST.METRIC = "accuracy"
    cfg.TPU.COMPUTE_DTYPE = args.dtype
    cfg.TPU.FAST_LN = args.fast_ln
    cfg.TPU.USE_PALLAS_ATTENTION = False

    spec = CLIPSpec.vit_b16() if args.model == "b16" else CLIPSpec.vit_b32()
    clip_params = init_clip_params(jax.random.PRNGKey(0), spec)
    static = TaskStatic.from_config(cfg, spec, PeftConfig(method=args.method))
    task = TrainTask(cfg, static, clip_params)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(1))

    n = args.n_train
    rng = np.random.default_rng(0)
    images = task.prepack(rng.integers(0, 255, (n, 224, 224, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 100, (n,), dtype=np.int64).astype(np.int32))

    fit = jax.jit(build_fit_fn(static, n, args.epochs, task.preproc))
    opt_init, _ = make_optimizer("sgd")
    state = (trainable, opt_init(trainable), bn_state, jax.random.PRNGKey(2))
    lr_table = jnp.full((args.epochs,), 0.01, jnp.float32)
    wd = jnp.float32(1e-4)

    fit_args = (frozen, images, labels, state, lr_table, wd)

    # XLA's cost_analysis counts each while-loop BODY once (no trip-count
    # multiplication), so the fused multi-epoch fit under-reports by the
    # step count.  Cost-analyze ONE explicit training step (the streaming
    # step fn: identical math, no loops) and scale by steps/run; the
    # per-dispatch dataset entry copy is excluded (measured separately in
    # ARCHITECTURE.md — ~6% of run time at this shape).
    from pevit_tpu.train.streaming import build_step_fn

    step = jax.jit(build_step_fn(static, task.preproc))
    step_args = (
        frozen, state, images[:batch], labels[:batch],
        jnp.ones((batch,), jnp.float32), jnp.float32(0.01), wd,
    )
    ca = step.lower(*step_args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    step_bytes = float(ca.get("bytes accessed", 0.0))
    step_flops = float(ca.get("flops", 0.0))
    steps_per_epoch = -(-n // batch)
    steps_per_run = args.epochs * steps_per_epoch
    bytes_accessed = step_bytes * steps_per_run
    flops = step_flops * steps_per_run

    # warm-up, then timed run (sync by fetching a value — relay-safe)
    state = fit(*fit_args)
    float(jax.tree.leaves(state[0])[0].ravel()[0])
    t0 = time.perf_counter()
    state = fit(frozen, images, labels, state, lr_table, wd)
    float(jax.tree.leaves(state[0])[0].ravel()[0])
    dt = time.perf_counter() - t0

    kind = jax.devices()[0].device_kind
    hbm_gbs, peak_tflops = chip_peaks(kind)
    achieved_gbs = bytes_accessed / dt / 1e9
    achieved_tflops = flops / dt / 1e12
    out = {
        "model": args.model,
        "batch": batch,
        "images_per_s": round(args.epochs * n / dt, 1),
        "device_kind": kind,
        "step_bytes_accessed_MB": round(step_bytes / 1e6, 1),
        "step_flops_G": round(step_flops / 1e9, 1),
        "steps_per_run": steps_per_run,
        "measured_run_s": round(dt, 4),
        "achieved_GB_per_s": round(achieved_gbs, 1),
        "achieved_TFLOP_per_s": round(achieved_tflops, 2),
        "arithmetic_intensity_flops_per_byte": round(flops / max(bytes_accessed, 1), 1),
        "chip_HBM_GB_per_s": hbm_gbs,
        "chip_peak_bf16_TFLOP_per_s": peak_tflops,
        "hbm_roofline_fraction": round(achieved_gbs / hbm_gbs, 3) if hbm_gbs else None,
        "mfu": round(achieved_tflops / peak_tflops, 3) if peak_tflops else None,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
