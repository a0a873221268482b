"""Resolve a serving callable from an artifact or a (config, checkpoint) pair.

Shared by the serving entry points (tools/serve_bench.py, tools/
serve_daemon.py): one place that knows how to turn "what the operator has"
— a StableHLO artifact, an Orbax checkpoint, or just YAMLs — into an
``f(images_u8) -> logits`` callable with weights already on device.

The reference has no serving stack (SURVEY.md §5.4); this is part of the
beyond-reference deployment layer (docs/serving.md).
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Tuple

__all__ = ["load_serving_callable"]


def _build_task(config, method: str, seed: int):
    import jax

    from .ckpt import load_clip
    from .core.clip import CLIPSpec
    from .core.resnet import RN_SPECS
    from .peft import PeftConfig
    from .train import TaskStatic, TrainTask

    if int(config.DATASET.NUM_CLASSES) <= 0:
        raise ValueError(
            "DATASET.NUM_CLASSES is 0: pass the dataset YAML (--ds) the head "
            "was trained for, or override DATASET.NUM_CLASSES N — a serving "
            "classifier cannot be built without a class count")
    name = config.MODEL.NAME
    ckpt = config.TEST.MODEL_FILE or config.MODEL.PRETRAINED or None
    clip_params, spec = load_clip(
        name, checkpoint_path=ckpt, seed=seed,
        spec_hint=None if name in RN_SPECS else CLIPSpec.from_config(config),
    )
    # honour the text-initialised (zero-shot) head exactly like the export
    # tool and the training CLI do — a program-only artifact's weight
    # bundle must be rebuilt with the SAME head init it was exported with
    text_weights = None
    if config.TRAIN.INIT_HEAD_WITH_TEXT_ENCODER:
        from .evaluation.text_features import extract_text_features

        text_weights = extract_text_features(config, clip_params, spec)
    static = TaskStatic.from_config(config, spec, PeftConfig(method=method))
    task = TrainTask(config, static, clip_params, text_init_weights=text_weights)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(seed))
    return task, static, trainable, frozen, bn_state


def load_serving_callable(
    *,
    artifact: str = "",
    config=None,
    method: str = "kadaptation",
    weights_from: str = "",
    quantize: bool = False,
    seed: int = 0,
    verbose: bool = True,
) -> Tuple[Callable, int]:
    """Returns ``(call_fn, image_size)``; ``call_fn(images_u8) -> logits``.

    Two modes:
      * ``artifact`` given — deserialize it.  A baked artifact is
        self-contained; a program-only one additionally needs ``config``
        (+ ``weights_from`` for trained state) to rebuild its weight
        bundle exactly like the export did.
      * no artifact — trace + export fresh from ``config`` (program-only
        mode), restoring ``weights_from`` if given.  This is what a
        serving host does when it deploys from a checkpoint directly.
    """
    import jax

    from .ckpt import restore_trainable
    from .serve import (
        export_classifier, load_exported, serving_weights,
    )

    if artifact:
        exp = load_exported(artifact)
        image_size = int(exp.in_avals[-1].shape[1])
        if len(exp.in_avals) == 1:  # baked weights: self-contained
            return exp.call, image_size
        if config is None:
            raise ValueError(
                "program-only artifact: pass the export-time config "
                "(--model/--ds/--method) so the weight bundle can be rebuilt")
        task, static, trainable, frozen, bn_state = _build_task(config, method, seed)
        if weights_from:
            trainable = restore_trainable(weights_from, trainable)
        weights = jax.device_put(
            serving_weights(trainable, frozen, bn_state, quantize=quantize))
        return (lambda x: exp.call(weights, x)), image_size

    if config is None:
        raise ValueError("need an artifact or a config")
    task, static, trainable, frozen, bn_state = _build_task(config, method, seed)
    if weights_from:
        trainable = restore_trainable(weights_from, trainable)
    t0 = time.time()
    exp = export_classifier(
        static, trainable, frozen, bn_state, task.preproc,
        image_size=config.TRAIN.IMAGE_SIZE[0], bake_weights=False,
        quantize=quantize,
    )
    weights = jax.device_put(
        serving_weights(trainable, frozen, bn_state, quantize=quantize))
    if verbose:
        print(f"# export {time.time() - t0:.1f}s", flush=True)
    return (lambda x: exp.call(weights, x)), config.TRAIN.IMAGE_SIZE[0]
