#!/usr/bin/env python
"""Selection-equality gate for sweep-only FAST_LN (TPU.FAST_LN_SWEEP).

FAST_LN (LayerNorm stats in the activation dtype instead of the reference's
fp32 islands, model.py:154-160) is worth ~+5% throughput at B/32 but is off
by default for parity.  The HP sweep only needs the RELATIVE ordering of
trials, so running the sweep stages fast-LN while the final run keeps fp32
LN banks the win without touching final-run numerics — IF the selected
(lr, wd) never changes.  This tool runs the REAL grid walk
(train/sweep.hyperparameter_sweep_lr) twice per (method, dataset) cell —
FAST_LN_SWEEP off vs on — in bf16 compute on synthetic data, and compares
the selections.

    python tools/fast_ln_gate.py                      # default cell grid
    JAX_PLATFORMS=cpu python tools/fast_ln_gate.py --methods lora --datasets cifar10

Exit 0: all selections identical (gate passes).  Exit 1: any mismatch
(record FAST_LN_SWEEP as a measured dead end).
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

METHODS = {
    "lora": "pevit_tpu.commands.lora_clip",
    "adapter": "pevit_tpu.commands.adapter_clip",
    "compacter": "pevit_tpu.commands.compacter_clip",
    "kadaptation": "pevit_tpu.commands.kronecker_adaptation_clip",
    "linear_probe": "pevit_tpu.commands.linear_probe",
}


def run_cell(method: str, dataset: str, seed: int, fast: bool, out_dir: str):
    mod = importlib.import_module(METHODS[method])
    argv = [
        "--ds", str(REPO / "resources" / "datasets" / f"{dataset}.yaml"),
        "--model", str(REPO / "resources" / "model" / "vitb32_CLIP.yaml"),
        "--no-tuning", "False",
        "--fix_seed", str(seed),
        "DATASET.NUM_SAMPLES_PER_CLASS", "5",
        "DATASET.RANDOM_SEED_SAMPLING", str(seed),
        "DATASET.ALLOW_SYNTHETIC", "True",
        "DATASET.ROOT", f"{out_dir}/no-data",
        "MODEL.PRETRAINED", "random",
        "OUTPUT_DIR", f"{out_dir}/{method}-{'fast' if fast else 'ref'}",
        "TRAIN.END_EPOCH", "2", "TRAIN.EXTRA_FINAL_TRAIN_EPOCH", "0",
        "TRAIN.IMAGE_SIZE", "[32,32]", "TEST.IMAGE_SIZE", "[32,32]",
        "TPU.COMPUTE_DTYPE", "bfloat16",
        "TPU.FAST_LN_SWEEP", str(fast),
    ]
    best, info = mod.main(argv)
    return float(best), (info["best_lr"], info["best_l2_lambda"])


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--methods", default="lora,adapter,compacter,kadaptation")
    ap.add_argument("--datasets", default="cifar10,caltech101,dtd")
    ap.add_argument("--seeds", default="0")
    ap.add_argument("--out", default="/tmp/fast_ln_gate")
    ap.add_argument("--report", default="/tmp/fast_ln_gate/report.json")
    args = ap.parse_args(argv)

    cells, mismatches = [], []
    for method in args.methods.split(","):
        for dataset in args.datasets.split(","):
            for seed in (int(s) for s in args.seeds.split(",")):
                t0 = time.time()
                _, sel_ref = run_cell(method, dataset, seed, False, args.out)
                _, sel_fast = run_cell(method, dataset, seed, True, args.out)
                ok = sel_ref == sel_fast
                cell = {
                    "method": method, "dataset": dataset, "seed": seed,
                    "selected_ref": sel_ref, "selected_fast": sel_fast,
                    "match": ok, "secs": round(time.time() - t0, 1),
                }
                cells.append(cell)
                if not ok:
                    mismatches.append(cell)
                print(json.dumps(cell), flush=True)

    report = {"n_cells": len(cells), "n_mismatch": len(mismatches), "cells": cells}
    Path(args.report).parent.mkdir(parents=True, exist_ok=True)
    Path(args.report).write_text(json.dumps(report, indent=2))
    print(f"fast_ln_gate: {len(cells) - len(mismatches)}/{len(cells)} selections identical")
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
