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
import numpy as np

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


def _vit_spec_from_name(name: str, num_classes: int = 0) -> _vit.ViTSpec:
    patch = 16 if "16" in name else 32
    return _vit.ViTSpec(patch_size=patch, num_classes=num_classes,
                        global_pool=False, sincos_pos=name.startswith("mocov3"))


def get_model(config, feature_type: str = "image") -> Backbone:
    """Build a backbone from MODEL.NAME (+ TEST.MODEL_FILE checkpoint)."""
    name = config.MODEL.NAME
    ckpt_file = config.TEST.MODEL_FILE or None
    rng = jax.random.PRNGKey(0)

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
        if ckpt_file:
            from ..ckpt.torch_loader import read_torch_state_dict

            raw = read_torch_state_dict(ckpt_file)
            if "model" in raw and isinstance(raw["model"], dict):
                raw = raw["model"]
            params, spec = _swin.swin_state_dict_to_params(raw)
        else:
            spec = _swin.swin_base() if "base" in name else _swin.swin_tiny()
            params = _swin.init_swin_params(rng, spec)
            logging.warning("=> %s: RANDOM init (no TEST.MODEL_FILE)", name)
        return Backbone(
            name=name,
            params=params,
            feat_dim=spec.stage_dim(spec.num_stages - 1),
            forward_features=lambda p, x: _swin.swin_forward_features(p, x, spec=spec),
        )

    # --- CLIP with Swin visual tower (models/clip_swin.py:274-284) ----------
    if name.startswith("clip_swin"):
        from ..core.clip import CLIPSpec, encode_text as core_encode_text, init_clip_params

        sspec = _swin.swin_base() if "base" in name else _swin.swin_tiny()
        embed = config.MODEL.SPEC.get("EMBED_DIM", 512)
        # text tower dims come from MODEL.SPEC.TEXT (clip_swin.py builds the
        # text transformer from the config dict)
        cspec = CLIPSpec.from_config(config)
        core = init_clip_params(rng, cspec)
        k = jax.random.split(rng)[0]
        params = {
            "visual": _swin.init_swin_params(k, sspec),
            "visual_proj": 0.02 * jax.random.normal(k, (sspec.stage_dim(sspec.num_stages - 1), embed), jnp.float32),
            "text": core["text"],
            "logit_scale": core["logit_scale"],
        }

        def fwd(p, x):
            feats = _swin.swin_forward_features(p["visual"], x, spec=sspec)
            return feats.astype(jnp.float32) @ p["visual_proj"]

        return Backbone(
            name=name, params=params, feat_dim=embed,
            forward_features=fwd,
            encode_text=lambda p, t: core_encode_text({"text": p["text"]} | {"logit_scale": p["logit_scale"]}, t, spec=cspec),
        )

    # --- DeCLIP family (models/declip.py:8-38) -------------------------------
    if name.lower().startswith(("declip", "slip", "filip", "defilip", "clip_yfcc")):
        variant = name.split("_")[0].lower()
        dspec = _declip.DeclipSpec(
            variant=variant,
            embed_dim=config.MODEL.SPEC.get("EMBED_DIM", 512),
            dense_eval=bool(config.MODEL.SPEC.get("DENSE_EVAL", False)),
        )
        params = _declip.init_declip_params(rng, dspec)
        if ckpt_file:
            logging.warning("DeCLIP checkpoint loading not yet wired; using random init")
        return Backbone(
            name=name,
            params=params,
            feat_dim=dspec.embed_dim,
            forward_features=lambda p, x: _declip.encode_image(p, x, spec=dspec),
            encode_text=lambda p, t: _declip.encode_text(p, t, spec=dspec),
        )

    raise ValueError(f"Unknown MODEL.NAME: {name!r} (feature.py get_model surface)")
