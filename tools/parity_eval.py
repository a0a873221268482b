#!/usr/bin/env python
"""Accuracy-parity harness: the reference's 20-dataset ELEVATER grid.

Runs method x dataset x seed through the same CLI mains the launch scripts
use and reports per-dataset top-1 plus the 20-dataset average against the
reference's published numbers (BASELINE.md <- reference README.md:84-89).

This environment has no network egress, so REAL parity needs a connected
machine with (1) the OpenAI CLIP checkpoint (--weights ViT-B-32.pt) and
(2) ELEVATER datasets laid out under --data-root/<dataset>/ in any format
pevit_tpu/data/sources.py reads (npz cache / ImageFolder / manifest — see
tools/prepare_dataset.py for the one-time decode).  ``--smoke`` exercises
the full harness offline on synthetic data + random weights.

Usage (connected):
    python tools/parity_eval.py --methods kadaptation --seeds 0,1,2 \\
        --data-root /data/elevater --weights ~/.cache/clip/ViT-B-32.pt
Usage (offline check of the harness itself):
    python tools/parity_eval.py --smoke
"""

from __future__ import annotations

import argparse
import importlib
import json
import logging
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# method -> (command module, published 5-shot 20-dataset average top-1,
#            published trainable params) — reference README.md:84-89
METHODS = {
    "kadaptation": ("pevit_tpu.commands.kronecker_adaptation_clip", 68.92, 79_699),
    "adapter": ("pevit_tpu.commands.adapter_clip", 65.08, 1_237_587),
    "lora": ("pevit_tpu.commands.lora_clip", 61.48, 176_979),
    "compacter": ("pevit_tpu.commands.compacter_clip", 62.79, 77_907),
    "full_finetune": ("pevit_tpu.commands.finetune", 65.49, 87_878_739),
    "linear_probe": ("pevit_tpu.commands.linear_probe", 66.32, 29_523),
    # zeroshot: eval-only arm (reference scripts/run.sh zeroshot mode,
    # commands/zeroshot.py) — no published 20-dataset average in README.md
    "zeroshot": ("pevit_tpu.commands.zeroshot", None, 0),
}

ALL_DATASETS = [
    "caltech101", "cifar10", "cifar100", "country211", "dtd", "eurosat-clip",
    "fer2013", "fgvc-aircraft-2013b", "flower102", "food101", "gtsrb",
    "hateful-memes", "kitti-distance", "mnist", "oxford-iiit-pets",
    "patchcamelyon", "rendered-sst2", "resisc45-clip", "stanfordcar",
    "voc2007classification",
]


def run_one(method: str, dataset: str, seed: int, args) -> tuple:
    mod = importlib.import_module(METHODS[method][0])
    ds_yaml = REPO / "resources" / "datasets" / f"{dataset}.yaml"
    model_yaml = REPO / "resources" / "model" / f"{args.model}.yaml"
    argv = ["--ds", str(ds_yaml), "--model", str(model_yaml)]
    if method != "zeroshot":  # eval-only: no trainer flags (zeroshot.py:19-27)
        argv += ["--no-tuning", str(args.no_tuning), "--lr", str(args.lr), "--l2", str(args.l2)]
    argv += [
        "DATASET.NUM_SAMPLES_PER_CLASS", str(args.shots),
        "DATASET.RANDOM_SEED_SAMPLING", str(seed),
        "OUTPUT_DIR", str(Path(args.output_dir) / method),
    ]
    if args.data_root:
        argv += ["DATASET.ROOT", str(Path(args.data_root) / dataset)]
    if args.weights:
        argv += ["MODEL.PRETRAINED", args.weights]
    if args.smoke:
        argv += [
            "MODEL.PRETRAINED", "random",
            "DATASET.ALLOW_SYNTHETIC", "True",
            "TRAIN.END_EPOCH", "2", "TRAIN.EXTRA_FINAL_TRAIN_EPOCH", "0",
            "TRAIN.IMAGE_SIZE", "[32,32]", "TEST.IMAGE_SIZE", "[32,32]",
            "TPU.COMPUTE_DTYPE", "float32",
        ]
    out = mod.main(argv)
    if method == "zeroshot":  # returns the metric alone (zeroshot.py:95)
        return float(out), {}
    best, model_info = out
    return float(best), model_info


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--methods", default="kadaptation")
    ap.add_argument("--datasets", default=",".join(ALL_DATASETS))
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--shots", type=int, default=5)
    ap.add_argument("--model", default="vitb32_CLIP")
    ap.add_argument("--data-root", default="", help="ELEVATER root: <root>/<dataset>/{train,test}...")
    ap.add_argument("--weights", default="", help="OpenAI CLIP .pt checkpoint path")
    ap.add_argument("--no-tuning", default="False", help="False = full reference HP sweep")
    ap.add_argument("--lr", type=float, default=0.0)
    ap.add_argument("--l2", type=float, default=0.0)
    ap.add_argument("--output-dir", default="parity_out")
    ap.add_argument("--report", default="parity_report.json")
    ap.add_argument("--merge", action="store_true",
                    help="update --report in place: keep methods already recorded "
                         "there, overwrite/add the ones run now (lets the full "
                         "6-method + zeroshot grid accumulate into ONE artifact)")
    ap.add_argument("--tolerance", type=float, default=0.3, help="per-average acceptance band (pts)")
    ap.add_argument("--smoke", action="store_true",
                    help="offline harness check: synthetic data, random weights, tiny epochs")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    if args.smoke:
        args.no_tuning, args.lr, args.l2 = "True", 0.01, 1e-4
        # The smoke grid is a harness/CLI check, not a perf run: keep it off
        # the (single, shared) TPU chip.  BOTH knobs are required: the env
        # var keeps the axon PJRT plugin from dialing its (sometimes wedged)
        # relay during plugin discovery, and the config update wins over the
        # sitecustomize that overwrites jax_platforms at interpreter start
        # (measured r3: config-only hung on a wedged relay with 0 CPU).
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    methods = [m.strip() for m in args.methods.split(",")]
    datasets = [d.strip() for d in args.datasets.split(",")]
    seeds = [int(s) for s in args.seeds.split(",")]

    report = {"config": {"shots": args.shots, "model": args.model, "seeds": seeds,
                         "smoke": bool(args.smoke)}, "methods": {}}
    if args.merge and Path(args.report).exists():
        prior = json.loads(Path(args.report).read_text())
        assert prior.get("config", {}).get("shots") == args.shots, \
            "--merge across different shot counts would mix incomparable grids"
        report["methods"].update(prior.get("methods", {}))
    for method in methods:
        assert method in METHODS, f"unknown method {method!r} (choices: {list(METHODS)})"
        per_ds = {}
        t0 = time.time()
        for ds in datasets:
            scores = []
            for seed in seeds:
                best, info = run_one(method, ds, seed, args)
                scores.append(best)
                logging.info("%s/%s seed %d: %.3f", method, ds, seed, best)
            per_ds[ds] = {"per_seed": scores, "mean": sum(scores) / len(scores)}
        avg = sum(v["mean"] for v in per_ds.values()) / len(per_ds)
        published = METHODS[method][1]
        report["methods"][method] = {
            "per_dataset": per_ds,
            "average_top1": avg,
            "published_average_top1": published,
            "delta": None if published is None else avg - published,
            "within_tolerance": None if published is None else abs(avg - published) <= args.tolerance,
            "wall_s": time.time() - t0,
        }
        if published is None:
            logging.info("%s: avg %.2f (no published reference average)", method, avg)
        else:
            logging.info("%s: avg %.2f vs published %.2f (delta %+.2f)%s",
                         method, avg, published, avg - published,
                         "" if not args.smoke else "  [SMOKE: synthetic data — delta not meaningful]")
        # write after every method: a killed grid keeps its finished arms
        # (the job/sweep caches make the rerun of the live arm cheap)
        Path(args.report).write_text(json.dumps(report, indent=2))
        # drop this method's compiled executables: 4+ accumulated per-method
        # program sets exhaust the 16 GB chip (r5, tools/campaign_cost.py)
        import gc

        import jax

        jax.clear_caches()
        gc.collect()
    logging.info("report -> %s", args.report)
    return report


if __name__ == "__main__":
    main()
