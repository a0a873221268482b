#!/usr/bin/env python
"""Benchmark: KAdaptation ViT-B/32 + ViT-B/16 training throughput (img/s/chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "baseline_basis": "...", "b16_value": N, "b16_vs_baseline": N}

``vs_baseline`` is computed against an ESTIMATED baseline (see
``baseline_basis`` in the output): the reference publishes no throughput
numbers (SURVEY.md §6), so the constant below is an engineering estimate of
the reference's torch fp32 KAdaptation train-step rate on its published
hardware (NVIDIA A6000, CUDA 11.4) — the audited B/32 train step is
~21.8 GFLOP/img (fwd ~8.9; exact jaxpr 2*MAC ledger, scripts/flops_audit.py)
plus eager-mode kron/dropout overhead of the custom attention
(model.py:563-584,786-817) puts it in the 600-900 img/s band; we use 800.
``--measure-torch-cpu`` instead times the reference's actual eager module on
this host's CPU (slow; for calibration, not the driver run).

``gflop_per_img`` / ``mfu`` come from the SAME exact ledger traced on the
measured program (pevit_tpu/utils/flops.py) against the chip's public peak
bf16 FLOP/s — the r4 reconciliation of the r3 roofline's contradictory
numbers (XLA cost_analysis under-reports matmul FLOPs ~10x on this
backend; see ARCHITECTURE.md perf notes).

Measures the cached whole-epoch jit (train step only, eval excluded) on
synthetic data — throughput is weight-independent.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

#  b16 ~ 4x FLOPs of b32; l14 ~ 4.5x FLOPs of b16 (80 vs 17.5 GFLOP/img fwd)
A6000_BASELINE_IMGS_PER_SEC = {"b32": 800.0, "b16": 200.0, "l14": 45.0}
BASELINE_BASIS = (
    "estimate: reference publishes no throughput (SURVEY.md §6); baseline is "
    "an A6000 fp32 eager-torch engineering estimate (B/32 800 img/s, B/16 200)"
)


def main():
    try:
        _main()
    except Exception as e:  # the relay TPU occasionally wedges; one retry
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(f"bench attempt failed ({type(e).__name__}); retrying once...", file=sys.stderr)
        time.sleep(30)
        _main()


def _measure(args, model: str) -> float:
    """images/sec for one model size ('b32' | 'b16')."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pevit_tpu.config import get_default_config
    from pevit_tpu.core import CLIPSpec, init_clip_params
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.train import TaskStatic, TrainTask
    from pevit_tpu.train.optim import make_optimizer
    from pevit_tpu.train.trainer import build_fit_fn

    batch = args.batch
    if model == "b16" and batch > 64:
        # best measured operating point for ViT-B/16 (r2 sweep: batch 8 770,
        # 12 864, 16 899, 24 853, 32 835, 48 672 img/s — VMEM cliff past 16)
        batch = 16
    if model == "l14" and batch > 64:
        # ViT-L/14 operating point (r3 sweep: batch 4 168, 8 195.5, 16 172.8,
        # 32 149.7 img/s — peak at 8, same short-step regime as B/16)
        batch = 8

    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = 100
    cfg.TRAIN.BATCH_SIZE_PER_GPU = batch
    cfg.TEST.METRIC = "accuracy"
    cfg.TPU.COMPUTE_DTYPE = args.dtype
    cfg.TPU.REMAT = args.remat if args.remat is not None else (
        "lean" if model == "l14" else "none"
    )
    cfg.TPU.FAST_LN = args.fast_ln
    cfg.TPU.FOLD_LN2 = args.fold_ln2
    cfg.TPU.USE_PALLAS_ATTENTION = not args.no_pallas and jax.default_backend() == "tpu"
    cfg.TPU.FUSED_MLP = args.fused_mlp
    cfg.TPU.STEP_UNROLL = args.step_unroll
    cfg.TPU.KADAPT_CONCAT_DELTA = args.kadapt_concat_delta
    from pevit_tpu.core.clip import set_scan_unroll
    from pevit_tpu.core.layers import set_attn_layout

    set_scan_unroll(args.scan_unroll)  # always: the globals must not leak across cells
    set_attn_layout(args.attn_layout)

    spec = {"b16": CLIPSpec.vit_b16, "l14": CLIPSpec.vit_l14}.get(model, CLIPSpec.vit_b32)()
    clip_params = init_clip_params(jax.random.PRNGKey(0), spec)
    static = TaskStatic.from_config(cfg, spec, PeftConfig(method=args.method))
    task = TrainTask(cfg, static, clip_params)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(1))

    n = args.n_train
    rng = np.random.default_rng(0)
    images = task.prepack(rng.integers(0, 255, (n, 224, 224, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 100, (n,), dtype=np.int64).astype(np.int32))

    # the whole multi-epoch training is ONE dispatch (build_fit_fn)
    fit = jax.jit(build_fit_fn(static, n, args.epochs, task.preproc), donate_argnums=(3,))
    opt_init, _ = make_optimizer("sgd")
    state = (trainable, opt_init(trainable), bn_state, jax.random.PRNGKey(2))
    lr_table = jnp.full((args.epochs,), 0.01, jnp.float32)
    wd = jnp.float32(1e-4)

    # exact per-image FLOPs of this training step (trace only, no compile):
    # the MFU numerator (VERDICT r4 ledger reconciliation).  MODEL flops, not
    # hardware flops: counted on the remat-free step (PaLM MFU convention —
    # recompute work does not inflate utilisation), so remat A/Bs compare on
    # one ledger.
    import dataclasses as _dc

    from pevit_tpu.train.streaming import build_step_fn
    from pevit_tpu.utils.flops import step_flops

    step = build_step_fn(_dc.replace(static, remat="none"), task.preproc)
    gflop_per_img = step_flops(
        step, frozen, state, images[:batch], labels[:batch],
        jnp.ones((batch,), jnp.float32), jnp.float32(0.01), wd,
    ) / batch / 1e9

    # warm-up / compile
    state = fit(frozen, images, labels, state, lr_table, wd)
    float(jax.tree.leaves(state[0])[0].ravel()[0])

    t0 = time.perf_counter()
    state = fit(frozen, images, labels, state, lr_table, wd)
    # force a REAL sync on this relay backend: fetch a value to host
    float(jax.tree.leaves(state[0])[0].ravel()[0])
    dt = time.perf_counter() - t0

    # HBM footprint of the whole-run program (cache-hit recompile, ~free):
    # temp = XLA's peak scratch (activations/stashes), args = resident data
    hbm = {}
    try:
        ms = fit.lower(frozen, images, labels, state, lr_table, wd).compile().memory_analysis()
        hbm = {"hbm_temp_mb": round(ms.temp_size_in_bytes / 1e6, 1),
               "hbm_args_mb": round(ms.argument_size_in_bytes / 1e6, 1)}
    except Exception:
        pass
    return args.epochs * n / dt, batch, gflop_per_img, hbm


def _mfu(rate: float, gflop_per_img: float) -> float:
    import jax

    from pevit_tpu.utils.flops import chip_peaks

    _, peak_tflops = chip_peaks(jax.devices()[0].device_kind)
    if not peak_tflops:
        return 0.0
    return rate * gflop_per_img / 1e3 / peak_tflops


def _measure_torch_cpu(args) -> None:
    """Time the REFERENCE's actual eager KAdaptation module on this CPU.

    Calibration aid only (1 CPU core here; an A6000 is a different beast) —
    gives a measured torch datapoint instead of the estimate.
    """
    import importlib
    import types

    import numpy as np
    import torch

    pkg = types.ModuleType("_ref_eval_bench")
    pkg.__path__ = ["/root/reference/vision_benchmark/evaluation"]
    sys.modules[pkg.__name__] = pkg
    ref = importlib.import_module("_ref_eval_bench.model")
    torch.manual_seed(0)
    vt = ref.VisionTransformer(224, 32, 768, 12, 12, 512)
    head = torch.nn.Linear(512, 100)
    opt = torch.optim.SGD(list(head.parameters()), lr=0.01)
    x = torch.from_numpy(np.random.default_rng(0).standard_normal((8, 3, 224, 224)).astype(np.float32))
    y = torch.randint(0, 100, (8,))
    steps = 3
    t0 = time.perf_counter()
    for _ in range(steps):
        out = head(vt(x))
        loss = torch.nn.functional.cross_entropy(out, y)
        opt.zero_grad(); loss.backward(); opt.step()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "REFERENCE torch eager KAdaptation B/32 train step (this host CPU)",
        "value": round(steps * 8 / dt, 2),
        "unit": "images/sec",
        "baseline_basis": "measured: reference model.py VisionTransformer fwd+bwd, eager fp32, 1-core CPU",
    }))


def _main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n-train", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=8)  # ~3s of device time: averages out relay jitter
    ap.add_argument("--method", type=str, default="kadaptation")
    ap.add_argument("--model", type=str, default="both", choices=["b32", "b16", "l14", "both"])
    # four-state remat knob (TPU.REMAT); bare --remat keeps the old "full"
    # meaning, --remat lean exposes the four-state knob for sweeps.  Default
    # is per-model: none for ViT-B (r2: every flavour loses there), lean for
    # L/14 (r4 sweep: lean 212.1 vs none 201.6 img/s at batch 8 — at N=257
    # x width 1024 the smaller activation stash beats the GELU recompute).
    ap.add_argument("--remat", nargs="?", const="full", default=None,
                    choices=["none", "full", "dots", "lean"],
                    help="rematerialize blocks: none|full|dots|lean "
                         "(bare flag = full; default none, l14 lean)")
    ap.add_argument("--no-pallas", action="store_true")
    # LN stats in activation dtype: +4.8% at B/32 (3362 vs 3208 img/s, r2
    # A/B), -1.5% at B/16; OFF by default because the reference's LayerNorm
    # is an fp32 island (model.py:154-160) and the headline number stays
    # numerics-faithful.
    ap.add_argument("--fast-ln", action="store_true")
    # ln_2 affine folded into the frozen c_fc GEMM (core/layers.py) A/B
    ap.add_argument("--fold-ln2", action="store_true")
    # fused LN2->MLP->residual Pallas kernel (ops/fused_mlp.py) A/B
    ap.add_argument("--fused-mlp", action="store_true")
    ap.add_argument("--kadapt-concat-delta", action="store_true")  # one x@[H_q|H_v] GEMM per layer A/B (peft/kadaptation.py)
    ap.add_argument("--scan-unroll", type=int, default=0)  # layer-loop unroll: 0 full (default), 1 rolled (core/clip.py)
    ap.add_argument("--step-unroll", type=int, default=1)  # step-loop unroll: 1 fori_loop (default), k>1 scan(unroll=k) over steps (trainer.build_epoch_fn)
    ap.add_argument("--attn-layout", type=str, default="auto", choices=["auto", "bnhd", "bhnd"])
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--measure-torch-cpu", action="store_true")
    args = ap.parse_args()

    if args.measure_torch_cpu:
        _measure_torch_cpu(args)
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    primary = args.model if args.model in ("b16", "l14") else "b32"
    rate, batch, gfi, hbm = _measure(args, primary)
    model_name = {"b16": "ViT-B/16", "l14": "ViT-L/14"}.get(primary, "ViT-B/32")
    out = {
        "metric": f"{args.method} {model_name} train throughput (batch {batch}, {args.dtype})",
        "value": round(rate, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(rate / A6000_BASELINE_IMGS_PER_SEC[primary], 3),
        "baseline_basis": BASELINE_BASIS,
        "gflop_per_img": round(gfi, 2),
        "mfu": round(_mfu(rate, gfi), 3),
        **hbm,
    }
    if args.model == "both":
        rate16, _, gfi16, _hbm16 = _measure(args, "b16")
        out["b16_value"] = round(rate16, 1)
        out["b16_vs_baseline"] = round(rate16 / A6000_BASELINE_IMGS_PER_SEC["b16"], 3)
        out["b16_gflop_per_img"] = round(gfi16, 2)
        out["b16_mfu"] = round(_mfu(rate16, gfi16), 3)
        try:  # L/14 rides the default line too; never sink the bench on it
            rate14, batch14, gfi14, _hbm14 = _measure(args, "l14")
            out["l14_value"] = round(rate14, 1)
            out["l14_batch"] = batch14
            out["l14_vs_baseline"] = round(rate14 / A6000_BASELINE_IMGS_PER_SEC["l14"], 3)
            out["l14_gflop_per_img"] = round(gfi14, 2)
            out["l14_mfu"] = round(_mfu(rate14, gfi14), 3)
        except Exception as e:
            print(f"l14 measurement failed ({type(e).__name__}: {e})", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
