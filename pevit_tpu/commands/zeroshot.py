"""CLI: zero-shot CLIP evaluation.

Reference command surface: vision_benchmark/commands/zeroshot.py, including
the .npy feature cache (:31-53) and the prediction JSON artifact.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from ..utils import create_logger, dist as comm, log_config
from ._common import dump_artifacts, setup_config


def add_zeroshot_args(parser):
    parser.add_argument("--ds", required=False, type=str)
    parser.add_argument("--model", required=True, type=str)
    parser.add_argument("--submit-predictions", default=False, action="store_true")
    parser.add_argument("--submit-by", type=str)
    parser.add_argument("--fix_seed", default=0, type=int)
    parser.add_argument("--save-feature", default=True, type=lambda x: str(x).lower() == "true")
    parser.add_argument("--save-predictions", default=True, action="store_true")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)


def load_or_extract_features(config, clip_params, spec, test_images):
    """Cache image/text features as .npy (zeroshot.py:31-53 behaviour)."""
    from ..evaluation import extract_image_features, extract_text_features

    feature_folder = os.path.join(config.OUTPUT_DIR, "features")
    os.makedirs(feature_folder, exist_ok=True)
    model_tag = config.MODEL.NAME.replace("/", "_")
    img_f = os.path.join(feature_folder, f"{config.DATASET.DATASET}_{model_tag}_image.npy")
    txt_f = os.path.join(feature_folder, f"{config.DATASET.DATASET}_{model_tag}_text.npy")

    if os.path.exists(img_f):
        image_features = np.load(img_f)
        logging.info("loaded cached image features %s", img_f)
    else:
        image_features = extract_image_features(config, clip_params, spec, test_images)
        np.save(img_f, image_features)
    if os.path.exists(txt_f):
        text_features = np.load(txt_f)
    else:
        text_features = extract_text_features(config, clip_params, spec)
        np.save(txt_f, text_features)
    return image_features, text_features


def main(argv=None):
    from ..utils.platform import ensure_platform

    ensure_platform()
    parser = argparse.ArgumentParser(description="Zero-shot evaluation script.")
    add_zeroshot_args(parser)
    args = parser.parse_args(argv)
    args.no_tuning = False
    args.submit_predictions = getattr(args, "submit_predictions", False)
    config = setup_config(args)

    # reference naming (commands/zeroshot.py:89)
    exp_name = (
        "zeroshot_eval_"
        f"wiki_{config.KNOWLEDGE.WIKITIONARY.USE_DEFINITION}"
        f"_wnh_{config.KNOWLEDGE.WORDNET.USE_HIERARCHY}"
        f"_wnd_{config.KNOWLEDGE.WORDNET.USE_DEFINITION}"
        f"_gpt3_{config.KNOWLEDGE.GPT3.USE_GPT3}"
    )
    create_logger(config, exp_name)
    if comm.is_main_process():
        log_config(config, args)

    from ..ckpt import load_clip
    from ..data.sources import build_splits
    from ..evaluation import clip_zeroshot_evaluator

    from ..core.clip import CLIPSpec

    _, _, test = build_splits(config, test_split_only=True)
    ckpt = config.TEST.MODEL_FILE or config.MODEL.PRETRAINED or None
    clip_params, spec = load_clip(
        config.MODEL.NAME,
        checkpoint_path=ckpt,
        seed=args.fix_seed,
        spec_hint=CLIPSpec.from_config(config),
    )

    image_features, text_features = load_or_extract_features(config, clip_params, spec, test.images)
    result, logits, metric_name = clip_zeroshot_evaluator(
        image_features, text_features, test.labels, config
    )
    logging.info("=> TEST: %s %.3f", metric_name, result)

    if args.save_predictions:
        z = logits - logits.max(axis=-1, keepdims=True)
        probs = np.exp(z)
        probs /= probs.sum(axis=-1, keepdims=True)
        model_info = {"best_logits": probs}
        dump_artifacts(config, exp_name, result, model_info, txt=False)
    return result


if __name__ == "__main__":
    main()
