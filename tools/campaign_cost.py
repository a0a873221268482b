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
    # a prior run's completed-job artifact in out_dir would REPLAY the result
    # (commands/_common.py job resume) instead of training — fatal for timing
    import shutil

    if out_dir.exists():
        shutil.rmtree(out_dir)
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
    ap.add_argument("--method", default="kadaptation",
                    help="comma-separated subset of %s, or 'all': later methods "
                         "in one process skip the first-dispatch tax, so every "
                         "warm cell is measured, not scaled" % sorted(COMMANDS))
    ap.add_argument("--dataset", default="cifar10")
    ap.add_argument("--out", default=str(REPO / "docs" / "campaign_cost.json"))
    ap.add_argument("--output-dir", default="/tmp/campaign_cost_out")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny-shape harness check on CPU (CI)")
    ap.add_argument("--skip-cold", action="store_true",
                    help="only measure the warm cell (reuse a live process)")
    ap.add_argument("--merge", action="store_true",
                    help="fold this run's per-method cells into an existing --out "
                         "JSON (measure methods across separate processes)")
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
    methods = sorted(COMMANDS) if args.method == "all" else [m.strip() for m in args.method.split(",")]
    for m in methods:
        assert m in COMMANDS, f"unknown method {m!r} (choices: {sorted(COMMANDS)})"

    if len(methods) > 1 and not args.smoke:
        # One process per method: the relay chip exhausts HBM when several
        # methods' program sets run in one process even with ZERO live client
        # arrays and jax.clear_caches() between them (r5 probe: live_arrays()
        # == 0 after a cell, yet the 5th method's first dispatch dies
        # RESOURCE_EXHAUSTED) — server-side retention.  Each subprocess pays
        # its own first-dispatch tax in the seed-0 (cold) cell; warm stays
        # clean, and --merge folds every method into one --out artifact.
        import subprocess

        for m in methods:
            cmd = [sys.executable, __file__, "--method", m,
                   "--dataset", args.dataset, "--out", args.out,
                   "--output-dir", args.output_dir, "--merge"]
            if args.skip_cold:
                cmd.append("--skip-cold")
            r = subprocess.run(cmd)
            assert r.returncode == 0, f"{m} cell failed (exit {r.returncode})"
        report = json.loads(Path(args.out).read_text())
        print(json.dumps(report, indent=2))
        return report
    measured = {}
    for i, m in enumerate(methods):
        walls = {}
        # seed-0 cell: for the FIRST method this is the true cold number
        # (compiles + the relay's first-dispatch tax); for later methods in
        # the same process it is compile-only — record it as compile_s.
        if not args.skip_cold:
            key = "cold_s" if i == 0 else "compile_s"
            walls[key] = run_cell(m, args.dataset, 0, out_dir / m / "cold", smoke=args.smoke)
            print(f"{key[:-2]} cell ({m}/{args.dataset} seed 0): {walls[key]:.1f}s", flush=True)
        # different seed -> different few-shot sample -> no cached selection reuse
        walls["warm_s"] = run_cell(m, args.dataset, 1, out_dir / m / "warm", smoke=args.smoke)
        print(f"warm cell ({m}/{args.dataset} seed 1): {walls['warm_s']:.1f}s", flush=True)
        measured[m] = {k: round(v, 1) for k, v in walls.items()}
        # drop this method's compiled executables before the next one: on the
        # 16 GB relay chip, 4+ accumulated per-method program sets exhausted
        # HBM (RESOURCE_EXHAUSTED in the 5th method's compile, r5 measured)
        import gc

        import jax

        jax.clear_caches()
        gc.collect()

    if args.merge and Path(args.out).exists():
        prior = json.loads(Path(args.out).read_text())
        prior_pm = prior.get("measured", {}).get("per_method", {})
        if not prior_pm and "method" in prior.get("measured", {}):  # pre-r5 shape
            prior_pm = {prior["measured"]["method"]:
                        {k: v for k, v in prior["measured"].items()
                         if k in ("cold_s", "warm_s")}}
        measured = {**prior_pm, **measured}

    # anchor scaled projections on kadaptation when measured (REL_THROUGHPUT
    # is relative to it), else on the first measured method
    anchor_m = "kadaptation" if "kadaptation" in measured else next(iter(measured))
    anchor = measured[anchor_m]["warm_s"]
    projection = {}
    for m, rel in REL_THROUGHPUT.items():
        if m in measured:
            cell, basis = measured[m]["warm_s"], "measured"
        else:
            cell, basis = anchor * rel / REL_THROUGHPUT[anchor_m], "scaled"
        projection[m] = {
            "cell_warm_s": round(cell, 1),
            "basis": basis,
            "campaign_60_cells_h": round(cell * 20 * 3 / 3600, 2),
        }
    total_h = sum(v["campaign_60_cells_h"] for v in projection.values())

    report = {
        "measured": {
            "dataset": args.dataset,
            "shots": 5,
            "smoke": bool(args.smoke),
            "per_method": measured,
        },
        "projection_basis": "measured warm cells where available; otherwise the "
                            "first method's warm cell scaled by r3 per-method "
                            "step-throughput ratios",
        "per_method": projection,
        "full_campaign_20ds_x_3seed_x_6method_chip_hours": round(total_h, 1),
    }
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
