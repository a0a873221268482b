#!/usr/bin/env python
"""Measure the cost of ONE full sweep cell and project the campaign.

A "cell" is what the reference runs per (method, dataset, seed): the complete
6-LR x 97-point-WD binary-refined hyperparameter sweep (~90 ten-epoch
trainings — kadaptation_clip.py:188-243,446-466) plus the merged-trainval
final run with EXTRA_FINAL_TRAIN_EPOCH extra epochs (:488-520).  The full
published campaign is 20 datasets x 3 seeds x 6 methods of those cells, run
SERIALLY in shell loops (scripts/run.sh:68-85) — the dominant cost of the
whole framework and the reason the TPU rebuild exists.

This tool times one cell end-to-end through the real CLI main (so config
parsing, data synthesis, text-head init, sweep, final run and artifact dump
are all included), twice:

  cold: first invocation in this process — includes jit tracing + any
        compile-cache misses (on the axon relay also the 100-480s
        first-dispatch tax, which is why cold >> warm here);
  warm: second invocation with every XLA executable cached, on a DIFFERENT
        sampling seed so the sweep trial-score cache cannot short-circuit
        the training work (TPU.SWEEP_CACHE_DIR is also disabled).

Offline it uses synthetic data + random weights at the REAL operating point
(224x224, batch 64, END_EPOCH 10 + EXTRA 40): per-step device cost equals a
real 5-shot ELEVATER cell; only dataset decode differs (measured r2:
~156 ms entry copy, amortised).

Writes docs/campaign_cost.json and prints a projected chip-hours table,
scaling non-measured methods by the measured per-method step-throughput
ratios (bench r3, B/32 batch 128).

Usage:
    python tools/campaign_cost.py                  # kadaptation cell on TPU
    python tools/campaign_cost.py --smoke          # tiny-shape CI check (CPU)
"""

from __future__ import annotations

import argparse
import importlib
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# per-method training throughput relative to kadaptation (r3 per-method bench
# refresh, B/32 batch 128 img/s: kadapt 3722, lora 4172, adapter 5037,
# compacter 4815, linear_probe 10490; full_finetune measured r4 ~0.9x kadapt)
REL_THROUGHPUT = {
    "kadaptation": 1.0,
    "lora": 3722 / 4172,
    "adapter": 3722 / 5037,
    "compacter": 3722 / 4815,
    "full_finetune": 3722 / (3722 * 0.9),
    "linear_probe": 3722 / 10490,
}

COMMANDS = {
    "kadaptation": "pevit_tpu.commands.kronecker_adaptation_clip",
    "lora": "pevit_tpu.commands.lora_clip",
    "adapter": "pevit_tpu.commands.adapter_clip",
    "compacter": "pevit_tpu.commands.compacter_clip",
    "full_finetune": "pevit_tpu.commands.finetune",
    "linear_probe": "pevit_tpu.commands.linear_probe",
}


def run_cell(method: str, dataset: str, seed: int, out_dir: Path, *, smoke: bool) -> float:
    mod = importlib.import_module(COMMANDS[method])
    argv = [
        "--ds", str(REPO / "resources" / "datasets" / f"{dataset}.yaml"),
        "--model", str(REPO / "resources" / "model" / "vitb32_CLIP.yaml"),
        "--no-tuning", "False", "--lr", "0.0", "--l2", "0.0",
        "DATASET.NUM_SAMPLES_PER_CLASS", "5",
        "DATASET.RANDOM_SEED_SAMPLING", str(seed),
        "MODEL.PRETRAINED", "random",
        "DATASET.ALLOW_SYNTHETIC", "True",
        "OUTPUT_DIR", str(out_dir),
        "TPU.SWEEP_CACHE_DIR", "",  # timing run: no trial-score short-circuit
    ]
    if smoke:
        argv += [
            "TRAIN.END_EPOCH", "2", "TRAIN.EXTRA_FINAL_TRAIN_EPOCH", "1",
            "TRAIN.IMAGE_SIZE", "[32,32]", "TEST.IMAGE_SIZE", "[32,32]",
            "TPU.COMPUTE_DTYPE", "float32",
        ]
    t0 = time.time()
    best, _ = mod.main(argv)
    wall = time.time() - t0
    assert best == best, "cell returned NaN score"
    return wall


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--method", default="kadaptation", choices=sorted(COMMANDS))
    ap.add_argument("--dataset", default="cifar10")
    ap.add_argument("--out", default=str(REPO / "docs" / "campaign_cost.json"))
    ap.add_argument("--output-dir", default="/tmp/campaign_cost_out")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny-shape harness check on CPU (CI)")
    ap.add_argument("--skip-cold", action="store_true",
                    help="only measure the warm cell (reuse a live process)")
    args = ap.parse_args(argv)

    if args.smoke:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    out_dir = Path(args.output_dir)
    walls = {}
    if not args.skip_cold:
        walls["cold_s"] = run_cell(args.method, args.dataset, 0, out_dir / "cold", smoke=args.smoke)
        print(f"cold cell ({args.method}/{args.dataset} seed 0): {walls['cold_s']:.1f}s", flush=True)
    # different seed -> different few-shot sample -> no cached selection reuse
    walls["warm_s"] = run_cell(args.method, args.dataset, 1, out_dir / "warm", smoke=args.smoke)
    print(f"warm cell ({args.method}/{args.dataset} seed 1): {walls['warm_s']:.1f}s", flush=True)

    warm = walls["warm_s"]
    projection = {}
    for m, rel in REL_THROUGHPUT.items():
        cell = warm * rel if m != args.method else warm
        projection[m] = {
            "cell_warm_s": round(cell, 1),
            "campaign_60_cells_h": round(cell * 20 * 3 / 3600, 2),
        }
    total_h = sum(v["campaign_60_cells_h"] for v in projection.values())

    report = {
        "measured": {
            "method": args.method,
            "dataset": args.dataset,
            "shots": 5,
            "smoke": bool(args.smoke),
            **{k: round(v, 1) for k, v in walls.items()},
        },
        "projection_basis": "warm cell scaled by r3 per-method step-throughput ratios",
        "per_method": projection,
        "full_campaign_20ds_x_3seed_x_6method_chip_hours": round(total_h, 1),
    }
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
