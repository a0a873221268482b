"""OpenAI CLIP checkpoint -> JAX pytree converter.

Reference flow: clip_load.py:95-137 downloads a TorchScript archive
(sha256-verified), reads its state_dict, and ``build_model``
(model.py:1210-1251) infers the architecture from key shapes before a
non-strict weight merge.  Here the torch (CPU) runtime reads the archive and
everything converts once into our kernel-convention pytree:

* torch Linear weights (out, in) transpose to (in, out) kernels,
* the patchify conv (width, 3, p, p) flattens to a (p*p*3, width) GEMM
  kernel matching core.clip's reshape-based patchify,
* per-layer block tensors stack along a leading layer axis for lax.scan.

Download URLs/sha256 are intentionally NOT fetched here (no network egress in
CI); ``load_clip`` takes a local path.  ``MODEL.PRETRAINED='random'`` (or a
missing file with allow_random) falls back to distribution-matched random
init — useful for benchmarks where throughput is weight-independent.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.clip import CLIPSpec, TextSpec, VisionSpec, init_clip_params

# canonical OpenAI checkpoint names accepted by MODEL.NAME (clip_load.py:30-41)
MODEL_CKPT_NAMES = {
    "ViT-B/32": "ViT-B-32.pt",
    "ViT-B/16": "ViT-B-16.pt",
}


def infer_spec_from_state_dict(sd: dict) -> CLIPSpec:
    """Architecture inference from checkpoint key shapes (model.py:1210-1233)."""
    if "visual.proj" not in sd:
        raise NotImplementedError("Only ViT visual towers are supported (no ModifiedResNet)")
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_layers = len(
        [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
    )
    vision_patch_size = sd["visual.conv1.weight"].shape[-1]
    grid_size = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
    image_resolution = vision_patch_size * grid_size

    embed_dim = sd["text_projection"].shape[1]
    context_length = sd["positional_embedding"].shape[0]
    vocab_size = sd["token_embedding.weight"].shape[0]
    transformer_width = sd["ln_final.weight"].shape[0]
    transformer_heads = max(1, transformer_width // 64)
    transformer_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
    )
    return CLIPSpec(
        embed_dim=embed_dim,
        vision=VisionSpec(
            input_resolution=image_resolution,
            patch_size=vision_patch_size,
            width=vision_width,
            layers=vision_layers,
            heads=max(1, vision_width // 64),
            output_dim=embed_dim,
        ),
        text=TextSpec(
            context_length=context_length,
            vocab_size=vocab_size,
            width=transformer_width,
            heads=transformer_heads,
            layers=transformer_layers,
            output_dim=embed_dim,
        ),
    )


def _ln(sd, prefix):
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _stack_blocks(sd: dict, prefix: str, n_layers: int) -> dict:
    def stacked(key, transpose=False):
        arrs = [np.asarray(sd[f"{prefix}.{i}.{key}"]) for i in range(n_layers)]
        out = np.stack([a.T if transpose else a for a in arrs])
        return jnp.asarray(out)

    return {
        "attn": {
            "in_proj": {
                "kernel": stacked("attn.in_proj_weight", transpose=True),
                "bias": stacked("attn.in_proj_bias"),
            },
            "out_proj": {
                "kernel": stacked("attn.out_proj.weight", transpose=True),
                "bias": stacked("attn.out_proj.bias"),
            },
        },
        "mlp": {
            "c_fc": {
                "kernel": stacked("mlp.c_fc.weight", transpose=True),
                "bias": stacked("mlp.c_fc.bias"),
            },
            "c_proj": {
                "kernel": stacked("mlp.c_proj.weight", transpose=True),
                "bias": stacked("mlp.c_proj.bias"),
            },
        },
        "ln_1": {
            "scale": stacked("ln_1.weight"),
            "bias": stacked("ln_1.bias"),
        },
        "ln_2": {
            "scale": stacked("ln_2.weight"),
            "bias": stacked("ln_2.bias"),
        },
    }


def state_dict_to_params(sd: dict) -> tuple:
    """Convert a torch state_dict (numpy-valued ok) to (params, spec)."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items() if hasattr(v, "shape") or np.isscalar(v)}
    spec = infer_spec_from_state_dict(sd)
    v = spec.vision
    conv = sd["visual.conv1.weight"]  # (width, 3, p, p)
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(v.patch_size * v.patch_size * 3, v.width)

    params = {
        "visual": {
            "patch_embed": {"kernel": jnp.asarray(patch_kernel)},
            "class_embedding": jnp.asarray(sd["visual.class_embedding"]),
            "positional_embedding": jnp.asarray(sd["visual.positional_embedding"]),
            "ln_pre": _ln(sd, "visual.ln_pre"),
            "blocks": _stack_blocks(sd, "visual.transformer.resblocks", v.layers),
            "ln_post": _ln(sd, "visual.ln_post"),
            "proj": jnp.asarray(sd["visual.proj"]),
        },
        "text": {
            "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
            "positional_embedding": jnp.asarray(sd["positional_embedding"]),
            "blocks": _stack_blocks(sd, "transformer.resblocks", spec.text.layers),
            "ln_final": _ln(sd, "ln_final"),
            "text_projection": jnp.asarray(sd["text_projection"]),
        },
        "logit_scale": jnp.asarray(sd["logit_scale"].reshape(())),
    }
    return params, spec


def read_torch_state_dict(path: str) -> dict:
    """Read a .pt file (TorchScript archive or plain pickle) into numpy."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def load_clip(
    model_name: str = "ViT-B/32",
    *,
    checkpoint_path: Optional[str] = None,
    cache_dir: str = "~/.cache/clip",
    allow_random: bool = True,
    seed: int = 0,
    spec_hint: Optional[CLIPSpec] = None,
) -> tuple:
    """Resolve weights for ``model_name``; returns (params, spec).

    Resolution order: explicit ``checkpoint_path`` -> the torch cache dir
    (where the reference's downloader saves archives, clip_load.py:44-73) ->
    random init (when ``allow_random``; logged loudly).  ``spec_hint``
    overrides the architecture for random-init models (tiny test towers).
    """
    def _random():
        logging.warning(
            "=> NO pretrained weights for %s; RANDOM-init CLIP (benchmarks/tests only)",
            model_name,
        )
        spec = spec_hint or (CLIPSpec.vit_b16() if "16" in model_name else CLIPSpec.vit_b32())
        return init_clip_params(jax.random.PRNGKey(seed), spec), spec

    if checkpoint_path == "random":
        return _random()
    path = checkpoint_path or None
    if path is None:
        fname = MODEL_CKPT_NAMES.get(model_name)
        if fname:
            cand = os.path.expanduser(os.path.join(cache_dir, fname))
            if os.path.exists(cand):
                path = cand
    if path and os.path.exists(path):
        logging.info("=> loading CLIP weights from %s", path)
        sd = read_torch_state_dict(path)
        return state_dict_to_params(sd)
    if not allow_random:
        raise FileNotFoundError(
            f"No checkpoint for {model_name!r} (tried {path!r}); downloads are disabled"
        )
    return _random()
