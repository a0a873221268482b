"""Classification head: affine-free BatchNorm1d + linear, text-encoder init.

Reference: the ``Classifier`` wrapper (kadaptation_clip.py:88-185):
* ``channel_bn`` = BatchNorm1d(embed_dim, affine=False) (:128-131), disabled
  when TRAIN.USE_CHANNEL_BN is False,
* linear head initialised from zero-shot text-encoder class embeddings with
  zeroed bias when TRAIN.INIT_HEAD_WITH_TEXT_ENCODER (:134-144),
* optional merge of the visual projection into the head (:146-158),
* ``logit_scale`` with 4 init modes, default 0 => exp()=1 (:160-169); only
  the finetune/linear-probe forward multiplies by exp(logit_scale)
  (full_model_finetune.py:156) — the PEFT classifiers don't (:176-185).

BatchNorm follows torch semantics exactly (momentum 0.1, eps 1e-5, biased
variance for normalisation, unbiased for the running update).  The masked
variant supports padded device batches; on a sharded mesh the batch statistics
are computed over the GLOBAL batch automatically (jnp reductions under pjit
span the sharded axis), which matches single-device semantics.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

BN_MOMENTUM = 0.1
BN_EPS = 1e-5


def init_bn_state(dim: int) -> dict:
    return {"mean": jnp.zeros((dim,), jnp.float32), "var": jnp.ones((dim,), jnp.float32)}


def batch_norm(
    x: jax.Array,
    state: dict,
    *,
    train: bool,
    mask: Optional[jax.Array] = None,
):
    """torch BatchNorm1d(affine=False). x: (B, D); mask: (B,) validity."""
    x32 = x.astype(jnp.float32)
    if not train:
        y = (x32 - state["mean"]) * jax.lax.rsqrt(state["var"] + BN_EPS)
        return y.astype(x.dtype), state

    if mask is None:
        count = jnp.asarray(x.shape[0], jnp.float32)
        mean = jnp.mean(x32, axis=0)
        var = jnp.mean((x32 - mean) ** 2, axis=0)
    else:
        m = mask.astype(jnp.float32)[:, None]
        count = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(x32 * m, axis=0) / count
        var = jnp.sum(((x32 - mean) ** 2) * m, axis=0) / count

    y = (x32 - mean) * jax.lax.rsqrt(var + BN_EPS)
    unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
    new_state = {
        "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
        "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
    }
    if mask is not None:
        y = y * m.astype(y.dtype)
    return y.astype(x.dtype), new_state


def init_head(
    rng: jax.Array,
    embed_dim: int,
    num_classes: int,
    *,
    text_init_weights: Optional[np.ndarray] = None,
    logit_scale_init: str = "none",
    backbone_logit_scale: Optional[float] = None,
) -> dict:
    """Head params.  ``text_init_weights``: (embed_dim, num_classes) zero-shot
    class embeddings (kernel convention: logits = feats @ kernel + bias)."""
    if text_init_weights is not None:
        kernel = jnp.asarray(text_init_weights, jnp.float32)
        bias = jnp.zeros((num_classes,), jnp.float32)
    else:
        # torch Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
        bound = 1.0 / math.sqrt(embed_dim)
        k1, k2 = jax.random.split(rng)
        kernel = jax.random.uniform(k1, (embed_dim, num_classes), jnp.float32, -bound, bound)
        bias = jax.random.uniform(k2, (num_classes,), jnp.float32, -bound, bound)

    if logit_scale_init == "pretrained":
        ls = float(backbone_logit_scale if backbone_logit_scale is not None else math.log(1 / 0.07))
    elif logit_scale_init == "ln_cls":
        ls = math.log(math.log(max(num_classes, 3)))
    elif logit_scale_init == "clip":
        ls = math.log(1 / 0.07)
    else:
        ls = 0.0

    return {
        "linear": {"kernel": kernel, "bias": bias},
        "logit_scale": jnp.asarray(ls, jnp.float32),
    }


def head_forward(
    head: dict,
    bn_state: dict,
    feats: jax.Array,
    *,
    train: bool,
    mask: Optional[jax.Array] = None,
    use_bn: bool = True,
    normalize_feature: bool = False,
    apply_logit_scale: bool = False,
):
    """Classifier.forward minus the backbone (kadaptation_clip.py:176-185 /
    full_model_finetune.py:144-156)."""
    x = feats.astype(jnp.float32)
    if use_bn:
        x, bn_state = batch_norm(x, bn_state, train=train, mask=mask)
    if normalize_feature:
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    logits = x @ head["linear"]["kernel"] + head["linear"]["bias"]
    if apply_logit_scale:
        logits = jnp.exp(head["logit_scale"]) * logits
    return logits, bn_state
