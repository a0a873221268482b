"""TPU-native CLIP: one PEFT-agnostic implementation.

The reference vendors four full copies of OpenAI CLIP (model.py,
adapter_model.py, lora_model.py, compacter_model.py — ~3.7K LoC of clones)
and mutates each copy surgically.  Here there is exactly ONE model; PEFT
methods inject parameters and forward hooks (see pevit_tpu/peft/) without
touching this file.

Design notes (TPU-first, not a translation):
* Activations are (B, N, C) batch-first; transformer blocks are parameter-
  stacked (leading layer axis L) and executed with ``lax.scan`` for compact
  HLO and fast compiles, with optional ``jax.checkpoint`` rematerialisation.
* Patchify is expressed as a single reshape+matmul (stride==kernel conv has
  no overlap), which lowers to one large MXU GEMM instead of a convolution.
* Everything is shape-static; per-dataset class counts live in the head, not
  here.

Reference architecture being matched: evaluation/model.py:947-1183
(ResidualAttentionBlock / Transformer / VisionTransformer / CLIP).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .layers import causal_mask, layer_norm, residual_attention_block


# Trace-time layer-loop unroll factor for the block scan: 0 = FULL unroll
# (default), 1 = rolled loop, k = partial.  lax.scan compiles ONE loop body;
# every layer boundary is a scheduling barrier, so XLA cannot overlap the
# tail of layer i with the head of layer i+1 — exactly the op-granularity
# bound the r3 roofline identified (ARCHITECTURE.md).  Measured on-chip
# (kadaptation bf16 train step, interleaved A/B after pinning baseline
# stability to +-2 img/s): full unroll 3227->3560 img/s B/32 batch 128
# (+10.4%), 902->1121 B/16 batch 16 (+24.3%).  PARTIAL unroll is a measured
# dead end (B/32: unroll=3 2276, unroll=4 2158 — a bigger loop body without
# removing the barrier loses the icache/scheduling trade both ways).
_SCAN_UNROLL = 0


def set_scan_unroll(n: int) -> None:
    global _SCAN_UNROLL
    n = int(n)
    assert n >= 0, n
    _SCAN_UNROLL = n


# ---------------------------------------------------------------------------
# Specs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VisionSpec:
    input_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512

    @property
    def grid(self) -> int:
        return self.input_resolution // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1


@dataclasses.dataclass(frozen=True)
class TextSpec:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    output_dim: int = 512


@dataclasses.dataclass(frozen=True)
class CLIPSpec:
    embed_dim: int = 512
    vision: VisionSpec = dataclasses.field(default_factory=VisionSpec)
    text: TextSpec = dataclasses.field(default_factory=TextSpec)
    # Set for RN checkpoints (ModifiedResNet visual tower — model.py:1213-1222);
    # when present the visual tower is the ResNet and ``vision`` is unused.
    vision_rn: Optional["ResNetSpec"] = None  # noqa: F821 (resnet.py)

    @staticmethod
    def vit_b32() -> "CLIPSpec":
        return CLIPSpec()

    @staticmethod
    def vit_b16() -> "CLIPSpec":
        return CLIPSpec(vision=VisionSpec(patch_size=16))

    @staticmethod
    def vit_l14() -> "CLIPSpec":
        """OpenAI CLIP ViT-L/14 (model.py state-dict geometry: vision width
        1024 x 24 layers x 16 heads, patch 14 -> N=257; text width 768,
        embed_dim 768).  Real L/14 checkpoints already load via
        ckpt.infer_spec_from_state_dict; this preset serves random-init
        benchmarks/tests at the production model size."""
        return CLIPSpec(
            embed_dim=768,
            vision=VisionSpec(patch_size=14, width=1024, layers=24, heads=16,
                              output_dim=768),
            text=TextSpec(width=768, heads=12, layers=12, output_dim=768),
        )

    @staticmethod
    def from_config(config) -> "CLIPSpec":
        """Build from a MODEL.SPEC config node (resources/model/*.yaml).

        Only consulted for random-init models (tests/benchmarks); real
        checkpoints carry their architecture (ckpt.infer_spec_from_state_dict,
        mirroring reference model.py:1210-1233).  ``input_resolution`` follows
        TRAIN.IMAGE_SIZE so tiny test images produce tiny towers.
        """
        spec = config.MODEL.SPEC
        name = config.MODEL.NAME
        patch = 16 if "16" in str(name) else 32
        vision = spec.get("VISION", {}) or {}
        text = spec.get("TEXT", {}) or {}
        embed = spec.get("EMBED_DIM", 512)
        vwidth = vision.get("WIDTH", 768)
        return CLIPSpec(
            embed_dim=embed,
            vision=VisionSpec(
                input_resolution=config.TRAIN.IMAGE_SIZE[0],
                patch_size=vision.get("PATCH_SIZE", patch),
                width=vwidth,
                layers=vision.get("LAYERS", 12),
                heads=max(1, vwidth // 64),
                output_dim=embed,
            ),
            text=TextSpec(
                context_length=text.get("CONTEXT_LENGTH", 77),
                vocab_size=text.get("VOCAB_SIZE", 49408),
                width=text.get("WIDTH", 512),
                heads=text.get("HEADS", 8),
                layers=text.get("LAYERS", 12),
                output_dim=embed,
            ),
        )


# ---------------------------------------------------------------------------
# Hook protocol (implemented by pevit_tpu/peft/base.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BlockHooks:
    """Per-layer PEFT callbacks threaded through the scanned block.

    ``attn_delta(shared, layer_params, x, rng) -> (q_delta, v_delta)`` with
    (B, H, N, hd) outputs; ``mlp_post(shared, layer_params, m, rng) -> m'``.
    Either may be None.  ``layer_params`` is the per-layer slice of the PEFT
    tree; ``shared`` is the cross-layer shared subtree.
    """

    attn_delta: Optional[Callable] = None
    mlp_post: Optional[Callable] = None


# ---------------------------------------------------------------------------
# Initialisation (distributional parity with reference CLIP.initialize_parameters,
# model.py:1110-1137; used for tests/bench — real runs load OpenAI weights)
# ---------------------------------------------------------------------------

def _ln_init(width: int) -> dict:
    return {"scale": jnp.ones((width,), jnp.float32), "bias": jnp.zeros((width,), jnp.float32)}


def _init_blocks(rng: jax.Array, n_layers: int, width: int) -> dict:
    proj_std = (width ** -0.5) * ((2 * n_layers) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5
    ks = jax.random.split(rng, 4)

    def stack(key, shape, std):
        return jax.random.normal(key, (n_layers, *shape), jnp.float32) * std

    return {
        "attn": {
            "in_proj": {
                "kernel": stack(ks[0], (width, 3 * width), attn_std),
                "bias": jnp.zeros((n_layers, 3 * width), jnp.float32),
            },
            "out_proj": {
                "kernel": stack(ks[1], (width, width), proj_std),
                "bias": jnp.zeros((n_layers, width), jnp.float32),
            },
        },
        "mlp": {
            "c_fc": {
                "kernel": stack(ks[2], (width, 4 * width), fc_std),
                "bias": jnp.zeros((n_layers, 4 * width), jnp.float32),
            },
            "c_proj": {
                "kernel": stack(ks[3], (4 * width, width), proj_std),
                "bias": jnp.zeros((n_layers, width), jnp.float32),
            },
        },
        "ln_1": {
            "scale": jnp.ones((n_layers, width), jnp.float32),
            "bias": jnp.zeros((n_layers, width), jnp.float32),
        },
        "ln_2": {
            "scale": jnp.ones((n_layers, width), jnp.float32),
            "bias": jnp.zeros((n_layers, width), jnp.float32),
        },
    }


def init_clip_params(rng: jax.Array, spec: CLIPSpec) -> dict:
    kv, kt, k1, k2, k3, k4, k5 = jax.random.split(rng, 7)
    v, t = spec.vision, spec.text
    if spec.vision_rn is not None:
        from .resnet import init_resnet_params

        visual = init_resnet_params(kv, spec.vision_rn)
        text = init_clip_params(
            rng, dataclasses.replace(spec, vision_rn=None)
        )["text"]
        return {
            "visual": visual,
            "text": text,
            "logit_scale": jnp.asarray(math.log(1.0 / 0.07), jnp.float32),
        }
    scale = v.width ** -0.5
    params = {
        "visual": {
            "patch_embed": {
                "kernel": jax.random.normal(k1, (v.patch_size * v.patch_size * 3, v.width), jnp.float32)
                * (3 * v.patch_size * v.patch_size) ** -0.5,
            },
            "class_embedding": scale * jax.random.normal(k2, (v.width,), jnp.float32),
            "positional_embedding": scale
            * jax.random.normal(k3, (v.seq_len, v.width), jnp.float32),
            "ln_pre": _ln_init(v.width),
            "blocks": _init_blocks(kv, v.layers, v.width),
            "ln_post": _ln_init(v.width),
            "proj": scale * jax.random.normal(k4, (v.width, v.output_dim), jnp.float32),
        },
        "text": {
            "token_embedding": 0.02 * jax.random.normal(k5, (t.vocab_size, t.width), jnp.float32),
            "positional_embedding": 0.01
            * jax.random.normal(k1, (t.context_length, t.width), jnp.float32),
            "blocks": _init_blocks(kt, t.layers, t.width),
            "ln_final": _ln_init(t.width),
            "text_projection": (t.width ** -0.5)
            * jax.random.normal(k2, (t.width, t.output_dim), jnp.float32),
        },
        "logit_scale": jnp.asarray(math.log(1.0 / 0.07), jnp.float32),
    }
    return params


def fold_ln2_params(params: dict) -> dict:
    """Fold each block's ln_2 affine into its (frozen) c_fc GEMM, ONCE.

    ln2(x) @ W + c == norm(x) @ (g[:,None]*W) + (b@W + c) — exact algebra.
    Applied at params-prep time (NOT per step: an in-step refold
    rematerialises the [W,4W] folded weight every layer every step and
    measured -1.6%/-2.3% b32/b16 on chip, r4).  After folding, ln_2 is
    reset to the identity affine, which makes the transform IDEMPOTENT and
    keeps the standard (unfolded) block path numerically correct on folded
    params: norm(x)*1+0 == norm(x).  The TPU.FOLD_LN2 trace-time switch
    (core/layers.py) then merely skips the dead affine ops.

    Works on any CLIP params dict; towers without stacked ViT ``blocks``
    (ModifiedResNet visual) pass through untouched.  No trainable leaf is
    modified: every PEFT method leaves mlp.c_fc and ln_2 frozen.
    """
    def fold_tower(tower):
        if not isinstance(tower, dict) or "blocks" not in tower:
            return tower
        blocks = dict(tower["blocks"])
        g = jnp.asarray(blocks["ln_2"]["scale"], jnp.float32)  # (L, W)
        b = jnp.asarray(blocks["ln_2"]["bias"], jnp.float32)
        k = jnp.asarray(blocks["mlp"]["c_fc"]["kernel"], jnp.float32)  # (L, W, 4W)
        c = jnp.asarray(blocks["mlp"]["c_fc"]["bias"], jnp.float32)
        mlp = dict(blocks["mlp"])
        mlp["c_fc"] = {
            "kernel": g[:, :, None] * k,
            "bias": c + jnp.einsum("lw,lwf->lf", b, k),
        }
        blocks["mlp"] = mlp
        blocks["ln_2"] = {"scale": jnp.ones_like(g), "bias": jnp.zeros_like(b)}
        return {**tower, "blocks": blocks}

    out = dict(params)
    for name in ("visual", "text"):
        if name in out:
            out[name] = fold_tower(out[name])
    return out


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------

def _run_blocks(
    blocks: dict,
    x: jax.Array,
    *,
    n_head: int,
    mask: Optional[jax.Array],
    peft: Optional[dict] = None,
    hooks: Optional[BlockHooks] = None,
    rng: Optional[jax.Array] = None,
    n_layers: int,
    remat=False,
    use_pallas: bool = False,
    use_fused_mlp: bool = False,
    ln_eps: float = 1e-5,
) -> jax.Array:
    """Scan the stacked transformer blocks over the residual stream.

    ``remat``: False/"none" saves all block intermediates for backward
    (more HBM traffic, no recompute); True/"full" rematerialises whole
    blocks; "dots" saves only matmul outputs (``checkpoint_dots`` policy) —
    elementwise/softmax/LN intermediates recompute in backward, cutting the
    per-layer activation stash without re-running the GEMMs.
    """
    shared = (peft or {}).get("shared")
    layer_tree = (peft or {}).get("layers")
    rngs = (
        jax.random.split(rng, n_layers)
        if rng is not None
        else jnp.zeros((n_layers, 2), jnp.uint32)
    )

    def block_fn(x, sliced):
        block_p, layer_p, layer_rng = sliced
        qv_delta_fn = None
        mlp_post_fn = None
        if hooks is not None and hooks.attn_delta is not None:
            qv_delta_fn = partial(hooks.attn_delta, shared, layer_p, layer_rng)
        if hooks is not None and hooks.mlp_post is not None:
            mlp_post_fn = partial(hooks.mlp_post, shared, layer_p, layer_rng)
        y = residual_attention_block(
            block_p,
            x,
            n_head=n_head,
            mask=mask,
            qv_delta_fn=qv_delta_fn,
            mlp_post_fn=mlp_post_fn,
            use_pallas=use_pallas,
            use_fused_mlp=use_fused_mlp,
            ln_eps=ln_eps,
        )
        return y, None

    if remat in (True, "full"):
        scan_fn = jax.checkpoint(block_fn)
    elif remat == "dots":
        scan_fn = jax.checkpoint(block_fn, policy=jax.checkpoint_policies.checkpoint_dots)
    elif remat == "lean":
        # autodiff-equivalent residuals EXCEPT checkpoint-named tensors
        # (the MLP activation output) which recompute in backward — one
        # elementwise GELU re-pass instead of a (L,B,N,4C) stash per step
        scan_fn = jax.checkpoint(
            block_fn,
            policy=jax.checkpoint_policies.save_anything_except_these_names("mlp_act"),
        )
    else:
        scan_fn = block_fn
    u = min(_SCAN_UNROLL or n_layers, n_layers)
    unroll = u if n_layers % u == 0 else 1  # partial unroll only on exact tiling
    x, _ = jax.lax.scan(scan_fn, x, (blocks, layer_tree, rngs), unroll=unroll)
    return x


def patchify_images(x: jax.Array, patch_size: int) -> jax.Array:
    """(N, H, W, 3) -> (N, (H/p)*(W/p), p*p*3), dtype-preserving byte shuffle.

    Applied ONCE per dataset (device-side, uint8) so the training loop's
    per-batch gather feeds the patch-embedding GEMM directly — the layout
    matches what XLA wants for the (B·G², p²·3)x(p²·3, width) matmul, killing
    the whole-dataset layout copy + per-step 6D patchify transpose that
    otherwise dominate input-path time on TPU."""
    n, h, w_, c = x.shape
    p = patch_size
    g, gw = h // p, w_ // p
    return x.reshape(n, g, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5).reshape(n, g * gw, p * p * c)


def encode_image(
    params: dict,
    x: jax.Array,
    *,
    spec: CLIPSpec,
    peft: Optional[dict] = None,
    hooks: Optional[BlockHooks] = None,
    rng: Optional[jax.Array] = None,
    compute_dtype: Any = jnp.float32,
    remat: bool = False,
    use_pallas: bool = False,
    use_fused_mlp: bool = False,
    apply_proj: bool = True,
    patch_fold: Optional[tuple] = None,
    return_all_tokens: bool = False,
) -> jax.Array:
    """Visual tower forward (reference model.py:1034-1051).

    ``x``: (B, H, W, 3) normalised float images, or — fast input path —
    (B, G*G, p*p*3) pre-patchified RAW uint8 patches (see ``patchify_images``)
    with ``patch_fold=(mean, std)``: per-channel CLIP normalisation then folds
    into the patch-embedding GEMM (W' = W·s, b' = t@W with s=1/(255σ),
    t=-μ/σ), so the image tensor makes exactly ONE trip through the MXU with
    no standalone normalise/patchify passes over HBM (profiled ~25% of the
    B/32 train step).  Returns (B, embed_dim), or (B, width) when
    ``apply_proj`` is False (TRAIN.MERGE_ENCODER_AND_HEAD_PROJ folds the
    projection into the classifier head — kadaptation_clip.py:146-158).
    """
    if spec.vision_rn is not None:
        # ModifiedResNet tower: never carries PEFT hooks (the reference's RN
        # branch has no kattention — model.py:1076-1084) and has no separate
        # visual projection (c_proj lives inside attnpool).
        if hooks is not None and (hooks.attn_delta is not None or hooks.mlp_post is not None):
            raise ValueError("PEFT hooks are ViT-only; RN towers load frozen (reference parity)")
        from .resnet import encode_image_rn

        return encode_image_rn(params, x, spec=spec.vision_rn, compute_dtype=compute_dtype)

    v = spec.vision
    vp = params["visual"]
    B = x.shape[0]
    p, g = v.patch_size, v.grid

    if x.ndim == 3:
        if patch_fold is None:
            raise ValueError("pre-patchified input requires patch_fold=(mean, std)")
        mean, std = patch_fold
        kernel32 = vp["patch_embed"]["kernel"].astype(jnp.float32)  # (p*p*3, width)
        s = jnp.tile(1.0 / (255.0 * std.astype(jnp.float32)), p * p)
        t = jnp.tile(-mean.astype(jnp.float32) / std.astype(jnp.float32), p * p)
        w = (kernel32 * s[:, None]).astype(compute_dtype)
        b = (t @ kernel32).astype(compute_dtype)
        x = x.astype(compute_dtype) @ w + b
    else:
        x = x.astype(compute_dtype)
        # patchify == non-overlapping conv == one GEMM
        x = x.reshape(B, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, p * p * 3)
        x = x @ vp["patch_embed"]["kernel"].astype(compute_dtype)

    cls = jnp.broadcast_to(vp["class_embedding"].astype(compute_dtype), (B, 1, v.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vp["positional_embedding"].astype(compute_dtype)
    x = layer_norm(x, vp["ln_pre"]["scale"], vp["ln_pre"]["bias"])

    x = _run_blocks(
        vp["blocks"],
        x,
        n_head=v.heads,
        mask=None,
        peft=peft,
        hooks=hooks,
        rng=rng,
        n_layers=v.layers,
        remat=remat,
        use_pallas=use_pallas,
        use_fused_mlp=use_fused_mlp,
    )

    if return_all_tokens:
        # Full post-blocks residual stream, pre-ln_post — the DeCLIP family's
        # ``dense_feat`` (declip_model/image_encoder/visual_transformer.py:66).
        return x

    x = layer_norm(x[:, 0, :], vp["ln_post"]["scale"], vp["ln_post"]["bias"])
    if not apply_proj:
        return x
    return x @ vp["proj"].astype(x.dtype)


def encode_text(
    params: dict,
    tokens: jax.Array,
    *,
    spec: CLIPSpec,
    compute_dtype: Any = jnp.float32,
    remat: bool = False,
    ln_eps: float = 1e-5,
) -> jax.Array:
    """Text tower forward (reference model.py:1154-1167).

    ``tokens``: (B, context_length) int32.  The text tower never carries PEFT
    parameters (reference model.py:956 — stock attention via kattention=None).
    ``ln_eps``: 1e-5 for OpenAI CLIP; clip_swin's text tower uses the
    TF-style 1e-12 (clip_swin.py:24-39) — models/factory.py passes it.
    """
    t = spec.text
    tp = params["text"]
    x = tp["token_embedding"][tokens].astype(compute_dtype)
    x = x + tp["positional_embedding"].astype(compute_dtype)
    mask = causal_mask(t.context_length)

    x = _run_blocks(
        tp["blocks"], x, n_head=t.heads, mask=mask, n_layers=t.layers, remat=remat,
        ln_eps=ln_eps,
    )

    x = layer_norm(x, tp["ln_final"]["scale"], tp["ln_final"]["bias"], eps=ln_eps)
    # features from the EOT embedding (highest token id per sequence)
    eot = jnp.argmax(tokens, axis=-1)
    x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0, :]
    return x @ tp["text_projection"].astype(x.dtype)


def clip_similarity(params: dict, image_features: jax.Array, text_features: jax.Array):
    """Contrastive logits (reference model.py:1169-1183)."""
    imf = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
    txf = text_features / jnp.linalg.norm(text_features, axis=-1, keepdims=True)
    logit_scale = jnp.exp(params["logit_scale"])
    logits_per_image = logit_scale * imf @ txf.T
    return logits_per_image, logits_per_image.T
