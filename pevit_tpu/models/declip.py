"""DeCLIP model family: CLIP / DeCLIP / SLIP / FILIP / DeFILIP.

Reference: models/declip.py (get_model dispatch) + models/declip_model/
(clip.py, declip.py, slip.py, filip.py, defilip.py + image_encoder/ +
text_encoder/, ~2.3K LoC).  Inside the benchmark these are frozen feature
extractors (feature.py:262-281):

* ``declip_*`` / ``slip_*`` / ``clip_yfcc_*`` -> ``encode_image`` /
  ``encode_text`` (pooled embed_dim features),
* ``filip_*`` / ``defilip_*`` -> ``encode_image_dense`` /
  ``encode_text_dense`` (per-token features through the FILIP mapping heads;
  extract_feature flattens them to (N, -1) — feature.py:352).

Architecture (verified against declip_model sources):

* visual tower (image_encoder/visual_transformer.py:6-84) is EXACTLY the
  OpenAI-CLIP ViT layout — conv1 patch embed (no bias), class/positional
  embeddings, ln_pre, resblocks, ln_post on CLS only, bias-free ``proj`` —
  so it shares ``core.clip.encode_image`` and the stacked-block param tree.
  Dense features are the post-blocks stream minus CLS, PRE-ln_post and
  unprojected (visual_transformer.py:66).
* text tower (text_encoder/text_transformer.py:10-44,184-204) differs from
  OpenAI CLIP in ONE structural way: ``text_projection`` is an nn.Linear
  (kernel + bias) instead of a bare matrix.  Tokenisation happens inside the
  reference model; here tokens come from data.tokenizer (parity-tested).
* FILIP/DeFILIP (filip.py:36-61, defilip.py:174-179) add Linear mapping
  heads image_mapping (width -> dense_embed_dim) and text_mapping
  (text_width -> dense_embed_dim) + a ``logit_scale_dense``; the dense text
  features are the full ln_final'd sequence BEFORE text_projection.
* pretraining extras (SimSiam projector/predictor MLPs — declip.py:27-124,
  slip.py:22-78 predictor_sim, NNCLR memory banks, EDA text augmentation,
  text_label_predictor) are outside the eval surface; their checkpoint keys
  are deliberately ignored (the reference loads with strict=False —
  models/declip.py:31).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.clip import CLIPSpec, TextSpec, VisionSpec, init_clip_params
from ..core.clip import encode_image as _clip_encode_image
from ..core.layers import causal_mask, layer_norm, linear
from ..core.clip import _run_blocks  # stacked-block scan (shared with core CLIP)


@dataclasses.dataclass(frozen=True)
class DeclipSpec:
    """One spec for the whole family; ``variant`` picks the eval surface."""

    variant: str = "declip"  # declip | clip_yfcc | slip | filip | defilip
    embed_dim: int = 512
    vision: VisionSpec = dataclasses.field(default_factory=VisionSpec)
    text: TextSpec = dataclasses.field(default_factory=TextSpec)
    dense_embed_dim: int = 256  # FILIP mapping head width (filip.py:27)
    # text_transformer.py:189 gates the positional embedding add
    positional_embedding_flag: bool = True

    @property
    def dense_eval(self) -> bool:
        return self.variant in ("filip", "defilip")

    @property
    def clip(self) -> CLIPSpec:
        return CLIPSpec(embed_dim=self.embed_dim, vision=self.vision, text=self.text)

    @staticmethod
    def from_config(config) -> "DeclipSpec":
        """Build from MODEL.SPEC (resources/model/vitb32_DeCLIP.yaml etc.).

        ``SPEC.DECLIP.image_encode.embed_dim`` / ``text_encode.embed_dim``
        carry the projection width; the towers themselves are the fixed
        visual_transformer_B32/B16 + text_transformers defaults
        (visual_transformer.py:86-120, text_transformer.py:276-288).
        """
        spec = config.MODEL.SPEC
        name = str(config.MODEL.NAME).lower()
        declip_node = spec.get("DECLIP", {}) or {}
        image_encode = declip_node.get("image_encode", {}) or {}
        embed = image_encode.get("embed_dim", spec.get("EMBED_DIM", 512))
        patch = 16 if "b16" in name else 32
        variant = name.split("_")[0]
        if name.startswith(("clip_yfcc", "declip_yfcc")):
            variant = "clip_yfcc"
        text_node = spec.get("TEXT", {}) or {}
        res = config.TRAIN.IMAGE_SIZE[0]
        vocab = text_node.get("VOCAB_SIZE", 49408)
        if vocab == 49408:
            # The family's tokenizer inserts <|mask|> (simple_tokenizer.py:73)
            # and the torch model sizes token_embedding from
            # len(tokenizer.encoder) (text_transformer.py:38-39) = 49409; the
            # YAML's VOCAB_SIZE: 49408 is stale metadata.
            vocab = 49409
        if res == 224:
            vision = VisionSpec(
                input_resolution=res,
                patch_size=patch,
                width=768,
                layers=12,
                heads=12,
                output_dim=embed,
            )
        else:  # tiny-config path for tests
            vnode = spec.get("VISION", {}) or {}
            vwidth = vnode.get("WIDTH", 768)
            vision = VisionSpec(
                input_resolution=res,
                patch_size=vnode.get("PATCH_SIZE", patch),
                width=vwidth,
                layers=vnode.get("LAYERS", 12),
                heads=max(1, vwidth // 64),
                output_dim=embed,
            )
        return DeclipSpec(
            variant=variant,
            embed_dim=embed,
            vision=vision,
            text=TextSpec(
                context_length=text_node.get("CONTEXT_LENGTH", 77),
                vocab_size=vocab,
                width=text_node.get("WIDTH", 512),
                heads=text_node.get("HEADS", 8),
                layers=text_node.get("LAYERS", 12),
                output_dim=embed,
            ),
        )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_declip_params(rng: jax.Array, spec: DeclipSpec) -> dict:
    """Random init with the reference's distributions (visual_transformer.py:
    28-38, text_transformer.py:117-130).  Real runs load checkpoints."""
    kc, km1, km2, kd = jax.random.split(rng, 4)
    params = init_clip_params(kc, spec.clip)
    t = spec.text
    # text_projection is nn.Linear (text_transformer.py:42): weight
    # re-initialised to normal(std=width**-0.5) (:130), bias left at the
    # nn.Linear default — zeros here (bias init is irrelevant to parity,
    # checkpoints carry it).
    params["text"]["text_projection"] = {
        "kernel": (t.width ** -0.5)
        * jax.random.normal(km1, (t.width, spec.embed_dim), jnp.float32),
        "bias": jnp.zeros((spec.embed_dim,), jnp.float32),
    }
    if spec.dense_eval:
        v = spec.vision
        d = spec.dense_embed_dim
        k1, k2 = jax.random.split(kd)
        # nn.Linear default init (filip.py:36-37): kaiming-uniform; exact
        # distribution only matters for random-init tests, so plain scaled
        # uniform is used.
        lim_i = (1.0 / v.width) ** 0.5
        lim_t = (1.0 / t.width) ** 0.5
        params["image_mapping"] = {
            "kernel": jax.random.uniform(k1, (v.width, d), jnp.float32, -lim_i, lim_i),
            "bias": jnp.zeros((d,), jnp.float32),
        }
        params["text_mapping"] = {
            "kernel": jax.random.uniform(k2, (t.width, d), jnp.float32, -lim_t, lim_t),
            "bias": jnp.zeros((d,), jnp.float32),
        }
        params["logit_scale_dense"] = jnp.asarray(np.log(1 / 0.07), jnp.float32)
    return params


# ---------------------------------------------------------------------------
# Forward passes (frozen eval surface)
# ---------------------------------------------------------------------------

def encode_image(params, x, *, spec: DeclipSpec, compute_dtype: Any = jnp.float32):
    """Pooled image features: ln_post(CLS) @ proj (visual_transformer.py:53-79)."""
    return _clip_encode_image(params, x, spec=spec.clip, compute_dtype=compute_dtype)


def encode_image_dense(params, x, *, spec: DeclipSpec, compute_dtype: Any = jnp.float32):
    """FILIP dense image features: image_mapping(tokens[1:]) — pre-ln_post,
    unprojected patch tokens (filip.py:58-61)."""
    tokens = _clip_encode_image(
        params, x, spec=spec.clip, compute_dtype=compute_dtype, return_all_tokens=True
    )
    dense = tokens[:, 1:, :]
    return linear(dense.astype(jnp.float32), params["image_mapping"])


def _text_trunk(params, tokens, *, spec: DeclipSpec, compute_dtype):
    """Shared text trunk -> full ln_final'd sequence (text_transformer.py:184-194)."""
    t = spec.text
    tp = params["text"]
    x = tp["token_embedding"][tokens].astype(compute_dtype)
    if spec.positional_embedding_flag:
        x = x + tp["positional_embedding"].astype(compute_dtype)
    mask = causal_mask(t.context_length)
    x = _run_blocks(tp["blocks"], x, n_head=t.heads, mask=mask, n_layers=t.layers)
    return layer_norm(x, tp["ln_final"]["scale"], tp["ln_final"]["bias"])


def encode_text(params, tokens, *, spec: DeclipSpec, compute_dtype: Any = jnp.float32):
    """Pooled text features: Linear text_projection of the EOT position
    (text_transformer.py:203 — argmax pooling, same as OpenAI CLIP)."""
    x = _text_trunk(params, tokens, spec=spec, compute_dtype=compute_dtype)
    eot = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0, :]
    return linear(pooled.astype(jnp.float32), params["text"]["text_projection"])


def encode_text_dense(params, tokens, *, spec: DeclipSpec, compute_dtype: Any = jnp.float32):
    """FILIP dense text features: text_mapping(word_features) where
    word_features is the full ln_final'd sequence BEFORE text_projection
    (filip.py:53-56 <- text_transformer.py:199-204 return_dense)."""
    x = _text_trunk(params, tokens, spec=spec, compute_dtype=compute_dtype)
    return linear(x.astype(jnp.float32), params["text_mapping"])


# ---------------------------------------------------------------------------
# Checkpoint conversion
# ---------------------------------------------------------------------------

# pretraining-only subtrees, present in published checkpoints but outside the
# eval surface (loaded strict=False by the reference — models/declip.py:31)
_IGNORED_PREFIXES = (
    "projector",        # SimSiam projection_MLP  (declip.py:132)
    "predictor",        # SimSiam prediction_MLP  (declip.py:134) + predictor_sim (slip.py:184)
    "nn_replacer",      # NNCLR memory banks      (declip.py:168-169)
    "text_label_predictor",  # MLM head           (declip.py:165)
    "caption_module",   # captioning head         (filip.py:46)
    "sample_capture",
)


def normalize_declip_state_dict(obj: dict) -> dict:
    """Unwrap {'model': ...}/{'state_dict': ...} nesting and strip 'module.'
    prefixes (reference models/declip.py:24-29)."""
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


def declip_state_dict_to_params(sd: dict, *, input_resolution: int = 224) -> tuple:
    """Torch DeCLIP-family state_dict -> (params, DeclipSpec).

    Key layout (declip_model/clip.py:48-57, slip.py:81-87):
    * ``visual.*`` — OpenAI-CLIP ViT keys (conv1, class_embedding, ...),
    * text tower under ``encode_text.*`` (CLIP/DeCLIP/FILIP/DeFILIP — the
      module is assigned to attribute ``encode_text``) or ``text_encoder.*``
      (SLIP), with ``text_projection.{weight,bias}`` as an nn.Linear,
    * ``logit_scale`` shape (1,),
    * FILIP/DeFILIP: ``image_mapping.*`` / ``text_mapping.*`` /
      ``logit_scale_dense``.
    """
    from ..ckpt.torch_loader import _ln, _stack_blocks

    sd = {k: np.asarray(v, np.float32) for k, v in sd.items() if hasattr(v, "shape")}

    text_prefix = "encode_text" if any(k.startswith("encode_text.") for k in sd) else "text_encoder"
    tsub = {k[len(text_prefix) + 1:]: v for k, v in sd.items() if k.startswith(text_prefix + ".")}

    conv = sd["visual.conv1.weight"]  # (width, 3, p, p)
    width, _, p, _ = conv.shape
    n_vis_layers = len({k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")})
    twidth = tsub["token_embedding.weight"].shape[1]
    n_txt_layers = len({k.split(".")[2] for k in tsub if k.startswith("transformer.resblocks.")})
    embed_dim = sd["visual.proj"].shape[1]
    dense = "image_mapping.weight" in sd
    variant = "filip" if dense else "declip"

    spec = DeclipSpec(
        variant=variant,
        embed_dim=embed_dim,
        vision=VisionSpec(
            input_resolution=input_resolution,
            patch_size=p,
            width=width,
            layers=n_vis_layers,
            heads=max(1, width // 64),
            output_dim=embed_dim,
        ),
        text=TextSpec(
            context_length=tsub["positional_embedding"].shape[0],
            vocab_size=tsub["token_embedding.weight"].shape[0],
            width=twidth,
            heads=max(1, twidth // 64),
            layers=n_txt_layers,
            output_dim=embed_dim,
        ),
        dense_embed_dim=sd["image_mapping.weight"].shape[0] if dense else 256,
    )

    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(p * p * 3, width)
    params = {
        "visual": {
            "patch_embed": {"kernel": jnp.asarray(patch_kernel)},
            "class_embedding": jnp.asarray(sd["visual.class_embedding"]),
            "positional_embedding": jnp.asarray(sd["visual.positional_embedding"]),
            "ln_pre": _ln(sd, "visual.ln_pre"),
            "blocks": _stack_blocks(sd, "visual.transformer.resblocks", n_vis_layers),
            "ln_post": _ln(sd, "visual.ln_post"),
            "proj": jnp.asarray(sd["visual.proj"]),
        },
        "text": {
            "token_embedding": jnp.asarray(tsub["token_embedding.weight"]),
            "positional_embedding": jnp.asarray(tsub["positional_embedding"]),
            "blocks": _stack_blocks(tsub, "transformer.resblocks", n_txt_layers),
            "ln_final": _ln(tsub, "ln_final"),
            "text_projection": {
                "kernel": jnp.asarray(tsub["text_projection.weight"].T),
                "bias": jnp.asarray(tsub["text_projection.bias"]),
            },
        },
        "logit_scale": jnp.asarray(sd["logit_scale"].reshape(())),
    }
    if dense:
        params["image_mapping"] = {
            "kernel": jnp.asarray(sd["image_mapping.weight"].T),
            "bias": jnp.asarray(sd["image_mapping.bias"]),
        }
        params["text_mapping"] = {
            "kernel": jnp.asarray(sd["text_mapping.weight"].T),
            "bias": jnp.asarray(sd["text_mapping.bias"]),
        }
        params["logit_scale_dense"] = jnp.asarray(sd["logit_scale_dense"].reshape(()))

    handled = {"visual.", text_prefix + ".", "logit_scale", "image_mapping.", "text_mapping."}
    leftovers = [
        k for k in sd
        if not any(k.startswith(h) for h in handled)
        and not any(k.startswith(i) for i in _IGNORED_PREFIXES)
    ]
    if leftovers:
        logging.warning("declip ckpt: %d unmapped keys (e.g. %s)", len(leftovers), leftovers[:5])
    return params, spec


def gathered_contrastive_logits(image_features, text_features, logit_scale, axis_name: str):
    """Cross-replica contrastive logits.

    TPU-native equivalent of the reference's gradient-preserving AllGather
    autograd function (declip_model/clip.py:20-44): under ``shard_map``/pjit,
    ``jax.lax.all_gather`` over the data axis is differentiable, so each
    shard scores its local images against the GLOBAL text batch.
    """
    all_text = jax.lax.all_gather(text_features, axis_name, tiled=True)
    imf = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
    txf = all_text / jnp.linalg.norm(all_text, axis=-1, keepdims=True)
    return jnp.exp(logit_scale) * imf @ txf.T
