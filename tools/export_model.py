#!/usr/bin/env python
"""Export a (trained) pevit_tpu classifier to a StableHLO serving artifact.

Builds the model exactly like the training commands do (same YAML configs +
KEY VALUE override grammar), optionally restores the trained PEFT state from
an Orbax checkpoint dir (TPU.CHECKPOINT_DIR / --ckpt-dir), and serializes
the eval forward via pevit_tpu.serve (jax.export, symbolic batch dim).

    python tools/export_model.py \
        --model resources/model/vitb32_CLIP.yaml \
        --ds resources/datasets/cifar10.yaml \
        --method kadaptation --ckpt-dir /ckpts/cifar10 \
        --out cifar10_kadapt.stablehlo \
        MODEL.PRETRAINED /weights/ViT-B-32.pt

The artifact replays with no Python model code:

    from pevit_tpu.serve import load_exported
    logits = load_exported("cifar10_kadapt.stablehlo").call(images_u8)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--model", required=True, help="model YAML (resources/model/*.yaml)")
    ap.add_argument("--ds", default="", help="dataset YAML (sets NUM_CLASSES for the head)")
    ap.add_argument("--method", default="kadaptation",
                    help="kadaptation | lora | adapter | compacter | linear_probe | full_finetune")
    ap.add_argument("--ckpt-dir", default="", help="Orbax dir with the trained state "
                    "(default: config TPU.CHECKPOINT_DIR; empty = fresh init)")
    ap.add_argument("--out", default="classifier.stablehlo")
    ap.add_argument("--static-batch", action="store_true",
                    help="export with a fixed batch of 1 instead of a symbolic batch dim")
    ap.add_argument("--weights-as-args", action="store_true",
                    help="program-only artifact (~1 MB); weights ship separately and the "
                    "artifact is called as exp.call(serving_weights(...), images). "
                    "Required on compile services with request-size limits")
    ap.add_argument("--quantize", action="store_true",
                    help="weight-only per-channel int8 (pevit_tpu/quant.py): ~4x smaller "
                    "artifact / weight bundle, dequant fused into the GEMMs at compile time. "
                    "With --weights-as-args, call with serving_weights(..., quantize=True)")
    ap.add_argument("--platforms", default="",
                    help="comma-separated lowering platforms, e.g. 'cpu,tpu' (default: current)")
    ap.add_argument("--mesh", type=int, default=0, metavar="N",
                    help="export a DATA-PARALLEL GSPMD artifact over an N-device mesh "
                    "(batch sharded on the 'data' axis, weights replicated; "
                    "Exported.nr_devices records N).  Needs N visible devices at "
                    "export time — use JAX_PLATFORMS=cpu + "
                    "XLA_FLAGS=--xla_force_host_platform_device_count=N to author "
                    "an artifact for an N-chip serving pod from a 1-chip host")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("opts", nargs=argparse.REMAINDER, help="KEY VALUE config overrides")
    args = ap.parse_args(argv)

    from pevit_tpu.utils.platform import ensure_platform

    ensure_platform()
    import jax

    from pevit_tpu.ckpt import load_clip, restore_trainable
    from pevit_tpu.config import get_default_config, update_config
    from pevit_tpu.core.clip import CLIPSpec
    from pevit_tpu.core.resnet import RN_SPECS
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.serve import export_classifier, save_exported
    from pevit_tpu.train import TaskStatic, TrainTask

    config = get_default_config()
    for cfg_file in (args.ds, args.model):
        if cfg_file:
            args.cfg = cfg_file
            update_config(config, args)

    name = config.MODEL.NAME
    is_clip = name.startswith(("ViT-B", "ViT-L", "RN"))
    if is_clip:
        ckpt = config.TEST.MODEL_FILE or config.MODEL.PRETRAINED or None
        clip_params, spec = load_clip(
            name,
            checkpoint_path=ckpt,
            seed=args.seed,
            spec_hint=None if name in RN_SPECS else CLIPSpec.from_config(config),
        )
        backbone, feat_dim = None, 0
    else:
        # auxiliary backbones via the same factory the CLI uses
        from pevit_tpu.models import get_model

        if args.method not in ("linear_probe", "full_finetune"):
            raise SystemExit(f"PEFT method {args.method!r} requires a CLIP backbone")
        backbone = get_model(config)
        clip_params, spec = backbone.params, CLIPSpec.from_config(config)
        feat_dim = backbone.feat_dim
    # TRAIN.INIT_HEAD_WITH_TEXT_ENCODER True exports a text-initialised head:
    # with no --ckpt-dir this is a ZERO-SHOT classifier artifact in one
    # command — the serving twin of the reference's linear_probe
    # --emulate-zeroshot path (linear_probe.py:88-101).
    text_weights = None
    if config.TRAIN.INIT_HEAD_WITH_TEXT_ENCODER:
        if is_clip:
            from pevit_tpu.evaluation.text_features import extract_text_features

            text_weights = extract_text_features(config, clip_params, spec)
        else:
            print("WARNING: text head init for factory backbones is only wired "
                  "through the training CLI; exporting a random-init head")
    static = TaskStatic.from_config(config, spec, PeftConfig(method=args.method), feat_dim=feat_dim)
    task = TrainTask(config, static, clip_params, backbone=backbone,
                     text_init_weights=text_weights)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(args.seed))

    ckpt_dir = args.ckpt_dir or config.TPU.CHECKPOINT_DIR
    if ckpt_dir:
        trainable = restore_trainable(ckpt_dir, trainable)
        print(f"restored trained state from {ckpt_dir}")
    else:
        print("NO checkpoint dir given: exporting the fresh-init model")

    mesh = None
    if args.mesh:
        import numpy as np
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < args.mesh:
            raise SystemExit(
                f"--mesh {args.mesh} needs {args.mesh} visible devices, have "
                f"{len(devs)} (hint: JAX_PLATFORMS=cpu XLA_FLAGS="
                f"--xla_force_host_platform_device_count={args.mesh})"
            )
        mesh = Mesh(np.array(devs[: args.mesh]), ("data",))

    exported = export_classifier(
        static, trainable, frozen, bn_state, task.preproc,
        image_size=config.TRAIN.IMAGE_SIZE[0],
        dynamic_batch=not args.static_batch,
        bake_weights=not args.weights_as_args,
        platforms=[p for p in args.platforms.split(",") if p] or None,
        mesh=mesh,
        forward_fn=getattr(task, "_forward_fn", None),
        quantize=args.quantize,
    )
    save_exported(exported, args.out)
    size_mb = Path(args.out).stat().st_size / 1e6
    print(f"exported {args.out}: {size_mb:.1f} MB, "
          f"in={[str(a) for a in exported.in_avals]}, "
          f"out={[str(a) for a in exported.out_avals]}, "
          f"platforms={exported.platforms}, nr_devices={exported.nr_devices}")
    return exported


if __name__ == "__main__":
    main()
