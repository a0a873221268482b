#!/usr/bin/env python
"""Roofline + MFU for the training program (r2 'prove the ceiling',
r4-reconciled FLOP ledger).

Compiles the exact bench fit program, measures wall-clock the same way
bench.py does, and reports

    mfu = exact_matmul_flops_per_s / chip_peak_bf16_flops

where the FLOP numerator is the jaxpr 2*MAC ledger
(pevit_tpu/utils/flops.py) — NOT XLA ``cost_analysis()['flops']``, which
under-reports by the trip count of any inner loop (the r3 note's
"single-digit MFU" came from the rolled 12-layer scan body counted once;
on the unrolled default program cost_analysis agrees with the exact
ledger within 2%).

Bytes caveat (r4): ``cost_analysis()['bytes accessed']`` sums LOGICAL
operand accesses over the optimized HLO, counting VMEM-resident reuse —
on the unrolled program it exceeds physical HBM bandwidth (fraction > 1),
so it is an upper bound on HBM traffic, not a measurement.  It is still
reported (``logical_bytes_vs_hbm_roofline``) because fraction << 1 would
prove compute-boundness; fraction >= 1 is uninformative.

    timeout 580 python scripts/roofline.py [--model b32|b16|l14] [--batch N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pevit_tpu.utils.flops import CHIP_SPECS, chip_peaks  # noqa: E402,F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="b32", choices=["b32", "b16", "l14"])
    ap.add_argument("--batch", type=int, default=0, help="0 = operating point (b32:128, b16:16)")
    ap.add_argument("--n-train", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--method", default="kadaptation")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--fast-ln", action="store_true")
    # default = per-model operating point: lean remat for l14 (r4 sweep),
    # none elsewhere; FLOPs stay MODEL flops (remat-free step) either way
    ap.add_argument("--remat", default="",
                    choices=["", "none", "full", "dots", "lean"])
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

    batch = args.batch or {"b32": 128, "b16": 16, "l14": 8}[args.model]
    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = 100
    cfg.TRAIN.BATCH_SIZE_PER_GPU = batch
    cfg.TEST.METRIC = "accuracy"
    cfg.TPU.COMPUTE_DTYPE = args.dtype
    cfg.TPU.FAST_LN = args.fast_ln
    cfg.TPU.REMAT = args.remat or ("lean" if args.model == "l14" else "none")
    cfg.TPU.USE_PALLAS_ATTENTION = False

    spec = {"b16": CLIPSpec.vit_b16, "l14": CLIPSpec.vit_l14}.get(args.model, CLIPSpec.vit_b32)()
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
    #
    # FLOPs come from the exact jaxpr 2*MAC ledger, NOT cost_analysis:
    # the r4 audit (scripts/flops_audit.py) showed XLA's TPU 'flops'
    # under-reports matmul work ~10x (261 vs 2786 GFLOP for the B/32
    # batch-128 step) — it is a post-fusion kernel statistic, not a FLOP
    # count.  'bytes accessed' is still the best available HBM estimate.
    from pevit_tpu.train.streaming import build_step_fn
    from pevit_tpu.utils.flops import step_flops as _exact_flops

    step = jax.jit(build_step_fn(static, task.preproc))
    step_args = (
        frozen, state, images[:batch], labels[:batch],
        jnp.ones((batch,), jnp.float32), jnp.float32(0.01), wd,
    )
    ca = step.lower(*step_args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    step_bytes = float(ca.get("bytes accessed", 0.0))
    import dataclasses as _dc

    # MODEL flops (remat-free step) — bench.py's MFU convention
    step_flops = _exact_flops(
        build_step_fn(_dc.replace(static, remat="none"), task.preproc), *step_args)
    step_flops_xla = float(ca.get("flops", 0.0))
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
        "step_flops_G_xla_cost_analysis": round(step_flops_xla / 1e9, 1),
        "steps_per_run": steps_per_run,
        "measured_run_s": round(dt, 4),
        "logical_GB_per_s": round(achieved_gbs, 1),
        "achieved_TFLOP_per_s": round(achieved_tflops, 2),
        "arithmetic_intensity_flops_per_byte": round(flops / max(bytes_accessed, 1), 1),
        "chip_HBM_GB_per_s": hbm_gbs,
        "chip_peak_bf16_TFLOP_per_s": peak_tflops,
        "logical_bytes_vs_hbm_roofline": round(achieved_gbs / hbm_gbs, 3) if hbm_gbs else None,
        "mfu": round(achieved_tflops / peak_tflops, 3) if peak_tflops else None,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
