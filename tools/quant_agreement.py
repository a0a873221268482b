#!/usr/bin/env python
"""Measure int8-vs-fp32 top-1 prediction agreement for serving artifacts.

The deployment claim for --quantize ("throughput-neutral, 4x smaller",
docs/serving.md) needs an accuracy column, not just a logit-error bound: a
small relative logit error can still flip near-tie predictions.  This tool
runs the SAME images through the fp and the weight-only-int8 serving forward
(pevit_tpu.serve.make_serving_fn, the exact path export_classifier traces)
and reports:

  * top-1 prediction agreement (fraction of images with identical argmax),
  * max |logit_q - logit_fp| relative to the fp logit scale,
  * the top-2 margin distribution (context: how much headroom predictions
    have over the quantization noise).

Offline this uses random-init weights + synthetic images — agreement is a
property of quant noise vs logit margins, measurable without real data; on a
connected machine pass --weights/--images for the real number.

Usage:
    python tools/quant_agreement.py --models b32,l14 --n 512 \
        --out docs/quant_agreement.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def measure(model: str, n: int, batch: int, weights: str | None) -> dict:
    import jax
    import jax.numpy as jnp

    from pevit_tpu.config import get_default_config
    from pevit_tpu.core import CLIPSpec, init_clip_params
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.serve import make_serving_fn
    from pevit_tpu.train import TaskStatic, TrainTask

    spec = {"b32": CLIPSpec.vit_b32, "b16": CLIPSpec.vit_b16, "l14": CLIPSpec.vit_l14}[model]()
    cfg = get_default_config()
    cfg.defrost()
    cfg.DATASET.NUM_CLASSES = 100
    cfg.TRAIN.IMAGE_SIZE = [spec.vision.input_resolution] * 2
    cfg.freeze()
    if weights:
        from pevit_tpu.ckpt import load_clip

        clip_params, spec = load_clip(
            {"b32": "ViT-B/32", "b16": "ViT-B/16", "l14": "ViT-L/14"}[model],
            checkpoint_path=weights, spec_hint=spec,
        )
    else:
        clip_params = init_clip_params(jax.random.PRNGKey(0), spec)
    static = TaskStatic.from_config(cfg, spec, PeftConfig(method="kadaptation"))
    task = TrainTask(cfg, static, clip_params)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(1))

    f_fp = make_serving_fn(static, trainable, frozen, bn_state, task.preproc)
    f_q = make_serving_fn(static, trainable, frozen, bn_state, task.preproc, quantize=True)

    res = spec.vision.input_resolution
    rng = np.random.default_rng(3)
    agree = 0
    max_rel = 0.0
    margins = []
    t0 = time.time()
    for i in range(0, n, batch):
        m = min(batch, n - i)
        x = jnp.asarray(rng.integers(0, 255, (m, res, res, 3), dtype=np.uint8))
        lf = np.asarray(f_fp(x))
        lq = np.asarray(f_q(x))
        agree += int((lf.argmax(1) == lq.argmax(1)).sum())
        max_rel = max(max_rel, float(np.abs(lq - lf).max() / max(np.abs(lf).max(), 1e-6)))
        s = np.sort(lf, axis=1)
        margins.append(s[:, -1] - s[:, -2])
    margins = np.concatenate(margins)
    return {
        "n_images": n,
        "num_classes": 100,
        "weights": "random-init" if not weights else weights,
        "top1_agreement": agree / n,
        "max_rel_logit_err": round(max_rel, 5),
        "median_top2_margin": round(float(np.median(margins)), 5),
        "p5_top2_margin": round(float(np.percentile(margins, 5)), 5),
        "wall_s": round(time.time() - t0, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--models", default="b32,l14")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--weights", default="", help="OpenAI CLIP .pt (connected machines)")
    ap.add_argument("--out", default=str(REPO / "docs" / "quant_agreement.json"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    report = {"backend": jax.default_backend()}
    for model in [m.strip() for m in args.models.split(",")]:
        report[model] = measure(model, args.n, args.batch, args.weights or None)
        print(model, json.dumps(report[model]), flush=True)
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    print("report ->", args.out)
    return report


if __name__ == "__main__":
    main()
