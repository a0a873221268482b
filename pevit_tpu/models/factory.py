"""Backbone factory: the ``get_model(config, feature_type)`` surface.

Reference: evaluation/feature.py:241-317, which dispatches MODEL.NAME over
CLIP checkpoints, timm/deit ViTs, MAE, MoCo-v3, Swin classifiers, CLIP-Swin
and the DeCLIP family.  Returns a ``Backbone`` facade exposing
``forward_features(images_float) -> (B, feat_dim)`` (and
``encode_text(tokens)`` for dual-tower models), plus the parameter tree —
the plugin contract the reference documents in models/cls_example.py /
clip_example.py.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import declip as _declip
from . import swin as _swin
from . import vit as _vit


@dataclasses.dataclass
class Backbone:
    """Uniform facade over the heterogeneous backbone family."""

    name: str
    params: dict
    feat_dim: int
    forward_features: Callable  # (params, images_float) -> (B, feat_dim)
    encode_text: Optional[Callable] = None  # (params, tokens) -> (B, feat_dim)
    # tokenizer matching the text tower's vocabulary; None -> OpenAI CLIP
    # tokenize.  The DeCLIP family ships a shifted vocab (<|mask|> inserted) —
    # declip_model/utils/text_utils/simple_tokenizer.py:61-79.
    tokenize: Optional[Callable] = None
    # Train-mode forward for backbones with train-time stochasticity
    # (Swin stochastic depth — reference cls_swin.py:209,280-281):
    # (params, images_float, rng) -> (B, feat_dim).  None -> train == eval.
    forward_features_train: Optional[Callable] = None


def _swin_spec_from_cfg(mspec, default_spec: _swin.SwinSpec) -> _swin.SwinSpec:
    """Consume the Swin architecture keys the reference reads from the model
    spec (cls_swin.py:690-704 top-level; clip_swin.py:175-194 under VISION)
    instead of silently ignoring them on random init."""
    in_chans = int(mspec.get("IN_CHANS", 3))
    if in_chans != 3:
        raise ValueError(f"IN_CHANS={in_chans} unsupported (RGB only)")
    qk_scale = mspec.get("QK_SCALE", None)
    return dataclasses.replace(
        default_spec,
        patch_size=int(mspec.get("PATCH_SIZE", default_spec.patch_size)),
        embed_dim=int(mspec.get("EMBED_DIM", default_spec.embed_dim)),
        depths=tuple(mspec.get("DEPTHS", default_spec.depths)),
        num_heads=tuple(mspec.get("NUM_HEADS", default_spec.num_heads)),
        window_size=int(mspec.get("WINDOW_SIZE", default_spec.window_size)),
        mlp_ratio=float(mspec.get("MLP_RATIO", default_spec.mlp_ratio)),
        drop_rate=float(mspec.get("DROP_RATE", default_spec.drop_rate)),
        ape=bool(mspec.get("APE", default_spec.ape)),
        patch_norm=bool(mspec.get("PATCH_NORM", default_spec.patch_norm)),
        qkv_bias=bool(mspec.get("QKV_BIAS", default_spec.qkv_bias)),
        # cls_swin.py:697 / clip_swin.py:187: QK_SCALE overrides hd**-0.5
        qk_scale=None if qk_scale is None else float(qk_scale),
        # clip_swin.py:193 reads LAYER_SCALE from SPEC.VISION too
        layer_scale=bool(mspec.get("LAYER_SCALE", default_spec.layer_scale)),
    )


def _vit_spec_from_name(name: str, num_classes: int = 0) -> _vit.ViTSpec:
    patch = 16 if "16" in name else 32
    return _vit.ViTSpec(patch_size=patch, num_classes=num_classes,
                        global_pool=False, sincos_pos=name.startswith("mocov3"))


def _vit_spec_from_cfg(mspec, default_spec: _vit.ViTSpec) -> _vit.ViTSpec:
    """Consume the ViT architecture keys the reference's MAE/MoCo-v3 builders
    read from MODEL.SPEC (mae.py:82-86, mocov3.py:145-147) instead of
    silently ignoring them on random init."""
    mlp_ratio = float(mspec.get("MLP_RATIO", 4.0))
    if mlp_ratio != 4.0:
        raise ValueError(
            f"MODEL.SPEC.MLP_RATIO={mlp_ratio} unsupported (the ViT tower is "
            "built with the 4x MLP every shipped checkpoint uses)")
    if not bool(mspec.get("QKV_BIAS", True)):
        raise ValueError(
            "MODEL.SPEC.QKV_BIAS=False unsupported (qkv bias is always "
            "materialised; every reference MAE/MoCo config sets True)")
    return dataclasses.replace(
        default_spec,
        patch_size=int(mspec.get("PATCH_SIZE", default_spec.patch_size)),
        width=int(mspec.get("EMBED_DIM", default_spec.width)),
        layers=int(mspec.get("DEPTH", default_spec.layers)),
        heads=int(mspec.get("NUM_HEADS", default_spec.heads)),
    )


def get_model(config, feature_type: str = "image") -> Backbone:
    """Build a backbone from MODEL.NAME (+ TEST.MODEL_FILE checkpoint)."""
    name = config.MODEL.NAME
    ckpt_file = config.TEST.MODEL_FILE or None
    rng = jax.random.PRNGKey(0)

    # --- plugin stubs (models/cls_example.py / clip_example.py; the
    # reference dispatches by eval(MODEL.NAME + '.get_cls_model')) ----------
    if name == "cls_example":
        from .examples import get_cls_example

        return get_cls_example(config)
    if name == "clip_example":
        from .examples import get_clip_example

        return get_clip_example(config)

    # --- OpenAI CLIP -------------------------------------------------------
    if name.startswith("ViT-B") or name.startswith("ViT-L") or name.startswith("RN"):
        from ..ckpt import load_clip
        from ..core.clip import CLIPSpec, encode_image, encode_text

        params, spec = load_clip(
            name, checkpoint_path=config.MODEL.PRETRAINED or ckpt_file,
            spec_hint=CLIPSpec.from_config(config),
        )
        return Backbone(
            name=name,
            params=params,
            feat_dim=spec.embed_dim,
            forward_features=lambda p, x: encode_image(p, x, spec=spec),
            encode_text=lambda p, t: encode_text(p, t, spec=spec),
        )

    # --- timm-style / MAE / MoCo-v3 ViTs (feature.py:262-305, models/mae.py,
    # models/mocov3.py) ------------------------------------------------------
    if name.startswith(("vit_", "deit_", "mae_", "mocov3_")):
        global_pool = bool(config.MODEL.SPEC.get("GLOBAL_POOL", False))
        if ckpt_file:
            from ..ckpt.torch_loader import read_torch_state_dict

            raw = read_torch_state_dict(ckpt_file)
            sd = _vit.normalize_vit_state_dict(raw)
            params, spec = _vit.timm_state_dict_to_params(sd, global_pool=global_pool)
        else:
            spec = dataclasses.replace(_vit_spec_from_name(name), global_pool=global_pool)
            spec = _vit_spec_from_cfg(config.MODEL.SPEC, spec)
            # input resolution follows TRAIN.IMAGE_SIZE (the reference's timm
            # ViT is built at a fixed img_size and asserts on mismatch,
            # mocov3.py:101-102); without this, random init was pinned to
            # the 224 default like the clip_swin branch was.
            spec = dataclasses.replace(spec, input_resolution=config.TRAIN.IMAGE_SIZE[0])
            params = _vit.init_vit_params(rng, spec)
            logging.warning("=> %s: RANDOM init (no TEST.MODEL_FILE)", name)
        return Backbone(
            name=name,
            params=params,
            feat_dim=spec.width,
            forward_features=lambda p, x: _vit.vit_forward_features(p, x, spec=spec),
        )

    # --- Swin classifiers (models/cls_swin.py:683-713) ----------------------
    if name.startswith(("cls_swin", "swin")):
        # training-mode knobs consumed by the reference's get_cls_model
        # (cls_swin.py:699: DROP_PATH_RATE; :704: LAYER_SCALE)
        mspec = config.MODEL.SPEC if "SPEC" in config.MODEL else {}
        drop_path = float(mspec.get("DROP_PATH_RATE", 0.0))
        layer_scale = bool(mspec.get("LAYER_SCALE", False))
        if not config.MODEL.INIT_WEIGHTS:
            # reference cls_swin.py:706 skips its trunc-normal init_weights()
            # when False, keeping torch's module-default init — JAX params
            # are created WITH their init, so that state is unreachable here
            raise ValueError(
                "MODEL.INIT_WEIGHTS=False is not supported: params are "
                "created with the trunc-normal init (cls_swin.py:706 "
                "semantics); load a checkpoint instead of disabling init")
        if ckpt_file:
            from ..ckpt.torch_loader import read_torch_state_dict

            raw = read_torch_state_dict(ckpt_file)
            if "model" in raw and isinstance(raw["model"], dict):
                raw = raw["model"]
            params, spec = _swin.swin_state_dict_to_params(raw)
            # input resolution is a config property, not a weight shape; same
            # for QK_SCALE (cls_swin.py:697 reads it regardless of checkpoint)
            qk = mspec.get("QK_SCALE", None)
            spec = dataclasses.replace(
                spec, img_size=config.TRAIN.IMAGE_SIZE[0], drop_path_rate=drop_path,
                qk_scale=None if qk is None else float(qk),
            )
            if layer_scale and not spec.layer_scale:
                raise ValueError(
                    "MODEL.SPEC.LAYER_SCALE=True but checkpoint has no gamma params"
                )
        else:
            spec = _swin.swin_base() if "base" in name else _swin.swin_tiny()
            spec = _swin_spec_from_cfg(mspec, spec)
            spec = dataclasses.replace(
                spec,
                img_size=config.TRAIN.IMAGE_SIZE[0],
                drop_path_rate=drop_path,
                layer_scale=layer_scale,
            )
            params = _swin.init_swin_params(rng, spec)
            logging.warning("=> %s: RANDOM init (no TEST.MODEL_FILE)", name)
        return Backbone(
            name=name,
            params=params,
            feat_dim=spec.stage_dim(spec.num_stages - 1),
            forward_features=lambda p, x: _swin.swin_forward_features(p, x, spec=spec),
            forward_features_train=(
                (lambda p, x, rng: _swin.swin_forward_features(p, x, spec=spec, train=True, rng=rng))
                if (spec.drop_path_rate > 0.0 or spec.drop_rate > 0.0)
                else None
            ),
        )

    # --- CLIP with Swin visual tower (models/clip_swin.py:253-284) ----------
    # NOTE: clip_swin's encode_image/encode_text L2-normalise by default
    # (clip_swin.py:246-260 norm=True) — features leave this factory already
    # normalised, matching what the reference's linear probe sees.
    if name.startswith("clip_swin"):
        from ..core.clip import CLIPSpec, encode_text as core_encode_text, init_clip_params

        embed = config.MODEL.SPEC.get("EMBED_DIM", 512)
        # the reference supports ONLY the clip tokenizer here (clip_swin.py:158)
        tok_style = (config.MODEL.SPEC.get("TEXT", {}) or {}).get("TOKENIZER", "clip")
        if tok_style != "clip":
            raise ValueError(
                f"clip_swin supports only TOKENIZER 'clip', got {tok_style!r} "
                "(reference clip_swin.py:158 asserts the same)"
            )
        cspec = CLIPSpec.from_config(config)
        if ckpt_file:
            from ..ckpt.torch_loader import read_torch_state_dict

            raw = read_torch_state_dict(ckpt_file)
            params, sspec, cspec = _swin.clip_swin_state_dict_to_params(raw)
            # QK_SCALE is a config property even with a checkpoint
            # (clip_swin.py:187 reads it from SPEC.VISION unconditionally)
            qk = (config.MODEL.SPEC.get("VISION", {}) or {}).get("QK_SCALE", None)
            sspec = dataclasses.replace(
                sspec, img_size=config.TRAIN.IMAGE_SIZE[0],
                qk_scale=None if qk is None else float(qk),
            )
            # head count is not recoverable from a state_dict; the YAML's
            # MODEL.SPEC.TEXT.HEADS is authoritative (clip_swin.py:164)
            heads = (config.MODEL.SPEC.get("TEXT", {}) or {}).get("HEADS", cspec.text.heads)
            cspec = dataclasses.replace(
                cspec, text=dataclasses.replace(cspec.text, heads=heads)
            )
            embed = cspec.embed_dim
        else:
            sspec = _swin.swin_base() if "base" in name else _swin.swin_tiny()
            sspec = _swin_spec_from_cfg(config.MODEL.SPEC.get("VISION", {}) or {}, sspec)
            # img_size comes from TRAIN.IMAGE_SIZE like every other tower
            # (clip_swin.py:176 img_size=config TRAIN IMAGE_SIZE) — the
            # checkpoint branch above replaces it too; without this, random
            # init was pinned to swin_tiny's 224 default and any other
            # resolution crashed at the patch reshape.
            sspec = dataclasses.replace(sspec, img_size=config.TRAIN.IMAGE_SIZE[0])
            core = init_clip_params(rng, cspec)
            k = jax.random.split(rng)[0]
            params = {
                "visual": _swin.init_swin_params(k, sspec),
                "vision_projection": 0.02
                * jax.random.normal(k, (sspec.stage_dim(sspec.num_stages - 1), embed), jnp.float32),
                "text": core["text"],
                "text_projection": core["text"].pop("text_projection"),
                "logit_scale": core["logit_scale"],
            }
            logging.warning("=> %s: RANDOM init (no TEST.MODEL_FILE)", name)

        def fwd(p, x):
            feats = _swin.swin_forward_features(p["visual"], x, spec=sspec)
            feats = feats.astype(jnp.float32) @ p["vision_projection"]
            return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

        def txt(p, t):
            # clip_swin's text tower keeps the projection OUTSIDE the tower
            # (clip_swin.py:171-173,255-260) and uses the TF-style LayerNorm
            # eps=1e-12 throughout (clip_swin.py:24-39)
            x = core_encode_text(
                {"text": dict(p["text"], text_projection=p["text_projection"])},
                t, spec=cspec, ln_eps=1e-12,
            )
            return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

        return Backbone(
            name=name, params=params, feat_dim=embed,
            forward_features=fwd,
            encode_text=txt,
        )

    # --- DeCLIP family (models/declip.py:8-38, feature.py:262-281) ----------
    if name.lower().startswith(("declip", "slip", "filip", "defilip", "clip_yfcc")):
        variant = name.split("_")[0].lower()
        if name.lower().startswith(("clip_yfcc", "declip_yfcc")):
            variant = "clip_yfcc"
        if ckpt_file:
            from ..ckpt.torch_loader import read_torch_state_dict

            raw = read_torch_state_dict(ckpt_file)
            sd = _declip.normalize_declip_state_dict(raw)
            params, dspec = _declip.declip_state_dict_to_params(
                sd, input_resolution=config.TRAIN.IMAGE_SIZE[0]
            )
            dspec = dataclasses.replace(dspec, variant=variant)
        else:
            dspec = dataclasses.replace(
                _declip.DeclipSpec.from_config(config), variant=variant
            )
            params = _declip.init_declip_params(rng, dspec)
            logging.warning("=> %s: RANDOM init (no TEST.MODEL_FILE)", name)

        from ..data.tokenizer import declip_tokenize

        if dspec.dense_eval:
            # filip_/defilip_ eval via the dense mapping heads; the reference
            # flattens (B, N, dense_dim) -> (B, N*dense_dim) downstream
            # (feature.py:352 np.reshape(features, (N, -1)))
            n_img_tokens = dspec.vision.seq_len - 1
            return Backbone(
                name=name,
                params=params,
                feat_dim=n_img_tokens * dspec.dense_embed_dim,
                forward_features=lambda p, x: _declip.encode_image_dense(
                    p, x, spec=dspec
                ).reshape(x.shape[0], -1),
                encode_text=lambda p, t: _declip.encode_text_dense(
                    p, t, spec=dspec
                ).reshape(t.shape[0], -1),
                tokenize=declip_tokenize,
            )
        return Backbone(
            name=name,
            params=params,
            feat_dim=dspec.embed_dim,
            forward_features=lambda p, x: _declip.encode_image(p, x, spec=dspec),
            encode_text=lambda p, t: _declip.encode_text(p, t, spec=dspec),
            tokenize=declip_tokenize,
        )

    raise ValueError(f"Unknown MODEL.NAME: {name!r} (feature.py get_model surface)")
