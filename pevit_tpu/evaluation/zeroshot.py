"""Zero-shot CLIP evaluation.

Reference: clip_zeroshot_evaluator.py:9-22 — logits are
``100 * normalize(image_features) @ text_weights``, softmaxed, then scored
with the dataset metric.  Image features extract in jitted chunks.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..core.clip import CLIPSpec, encode_image
from .metrics import get_metric


def extract_image_features(
    config, clip_params: dict, spec: CLIPSpec, images_u8: np.ndarray, *, chunk: int = 256
) -> np.ndarray:
    mean = jnp.asarray(config.INPUT.MEAN, jnp.float32)
    std = jnp.asarray(config.INPUT.STD, jnp.float32)

    @jax.jit
    def enc(p, imgs):
        x = imgs.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        return encode_image(p, x, spec=spec)

    feats = []
    n = len(images_u8)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        batch = np.asarray(images_u8[s:e])
        if e - s < chunk:
            # padding is SAFE here (unlike the PEFT eval paths): the plain
            # CLIP tower has no raw-reshape scramble, so rows are exactly
            # independent — a padded row cannot perturb real rows' features
            batch = np.concatenate([batch, np.zeros((chunk - (e - s), *batch.shape[1:]), batch.dtype)])
        out = np.asarray(enc(clip_params, jnp.asarray(batch)), np.float32)
        feats.append(out[: e - s])
    return np.concatenate(feats)


def clip_zeroshot_evaluator(image_features, text_features, image_labels, config):
    """Reference-parity scoring (clip_zeroshot_evaluator.py:9-22)."""
    image_features = np.asarray(image_features, np.float32)
    image_features /= np.linalg.norm(image_features, axis=-1, keepdims=True) + 1e-12
    logits = 100.0 * image_features @ np.asarray(text_features, np.float32)
    z = logits - logits.max(axis=-1, keepdims=True)
    probs = np.exp(z)
    probs /= probs.sum(axis=-1, keepdims=True)
    metric = get_metric(config.TEST.METRIC or "accuracy")
    try:
        result = 100.0 * metric(np.asarray(image_labels), probs)
    except Exception:
        result = 0.0
    logging.info("=> Zero-shot %s: %.3f", getattr(metric, "__name__", "metric"), result)
    return result, logits, getattr(metric, "__name__", "accuracy")
