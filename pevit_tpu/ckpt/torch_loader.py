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
from ..core.resnet import RN_SPECS, ResNetSpec

# canonical OpenAI checkpoint names accepted by MODEL.NAME (clip_load.py:30-41)
MODEL_CKPT_NAMES = {
    "ViT-B/32": "ViT-B-32.pt",
    "ViT-B/16": "ViT-B-16.pt",
    "ViT-L/14": "ViT-L-14.pt",
    "RN50": "RN50.pt",
    "RN101": "RN101.pt",
    "RN50x4": "RN50x4.pt",
    "RN50x16": "RN50x16.pt",
    "RN50x64": "RN50x64.pt",
}


def _text_spec_from_state_dict(sd: dict) -> TextSpec:
    transformer_width = sd["ln_final.weight"].shape[0]
    return TextSpec(
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        width=transformer_width,
        heads=max(1, transformer_width // 64),
        layers=len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}),
        output_dim=sd["text_projection"].shape[1],
    )


def infer_spec_from_state_dict(sd: dict) -> CLIPSpec:
    """Architecture inference from checkpoint key shapes (model.py:1210-1233)."""
    if "visual.proj" not in sd:
        # RN branch (model.py:1221-1227): layer counts from block indices
        counts = tuple(
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}.")})
            for b in (1, 2, 3, 4)
        )
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        output_width = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        assert output_width ** 2 + 1 == sd["visual.attnpool.positional_embedding"].shape[0]
        text = _text_spec_from_state_dict(sd)
        return CLIPSpec(
            embed_dim=text.output_dim,
            text=text,
            vision_rn=ResNetSpec(
                input_resolution=output_width * 32,
                width=vision_width,
                layers=counts,
                output_dim=sd["visual.attnpool.c_proj.weight"].shape[0],
            ),
        )
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_layers = len(
        [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
    )
    vision_patch_size = sd["visual.conv1.weight"].shape[-1]
    grid_size = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
    image_resolution = vision_patch_size * grid_size

    text = _text_spec_from_state_dict(sd)
    return CLIPSpec(
        embed_dim=text.output_dim,
        vision=VisionSpec(
            input_resolution=image_resolution,
            patch_size=vision_patch_size,
            width=vision_width,
            layers=vision_layers,
            heads=max(1, vision_width // 64),
            output_dim=text.output_dim,
        ),
        text=text,
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


def _rn_bn(sd: dict, prefix: str) -> dict:
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
        "var": jnp.asarray(sd[f"{prefix}.running_var"]),
    }


def _rn_conv(sd: dict, key: str) -> jax.Array:
    # torch OIHW -> HWIO
    return jnp.asarray(np.asarray(sd[key]).transpose(2, 3, 1, 0))


def _rn_visual_params(sd: dict, rn: ResNetSpec) -> dict:
    """Map a ModifiedResNet state_dict (model.py:94-125 layout) onto our tree."""
    tree = {
        "stem": {
            "conv1": _rn_conv(sd, "visual.conv1.weight"), "bn1": _rn_bn(sd, "visual.bn1"),
            "conv2": _rn_conv(sd, "visual.conv2.weight"), "bn2": _rn_bn(sd, "visual.bn2"),
            "conv3": _rn_conv(sd, "visual.conv3.weight"), "bn3": _rn_bn(sd, "visual.bn3"),
        }
    }
    for li, n_blocks in enumerate(rn.layers, start=1):
        layer = {}
        for bi in range(n_blocks):
            p = f"visual.layer{li}.{bi}"
            block = {
                "conv1": _rn_conv(sd, f"{p}.conv1.weight"), "bn1": _rn_bn(sd, f"{p}.bn1"),
                "conv2": _rn_conv(sd, f"{p}.conv2.weight"), "bn2": _rn_bn(sd, f"{p}.bn2"),
                "conv3": _rn_conv(sd, f"{p}.conv3.weight"), "bn3": _rn_bn(sd, f"{p}.bn3"),
            }
            # downsample Sequential: "-1" avgpool, "0" conv, "1" bn (model.py:33-39)
            if f"{p}.downsample.0.weight" in sd:
                block["downsample"] = {
                    "conv": _rn_conv(sd, f"{p}.downsample.0.weight"),
                    "bn": _rn_bn(sd, f"{p}.downsample.1"),
                }
            layer[str(bi)] = block
        tree[f"layer{li}"] = layer

    def lin(prefix):
        return {
            "kernel": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T),
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    tree["attnpool"] = {
        "positional_embedding": jnp.asarray(sd["visual.attnpool.positional_embedding"]),
        "q_proj": lin("visual.attnpool.q_proj"),
        "k_proj": lin("visual.attnpool.k_proj"),
        "v_proj": lin("visual.attnpool.v_proj"),
        "c_proj": lin("visual.attnpool.c_proj"),
    }
    return tree


def state_dict_to_params(sd: dict) -> tuple:
    """Convert a torch state_dict (numpy-valued ok) to (params, spec)."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items() if hasattr(v, "shape") or np.isscalar(v)}
    spec = infer_spec_from_state_dict(sd)
    if spec.vision_rn is not None:
        params = {
            "visual": _rn_visual_params(sd, spec.vision_rn),
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
        # common wrappers: {'state_dict': ...} (mocov3/swin), {'model': ...}
        # (mae/declip — models/declip.py:25, mae.py)
        for wrap in ("state_dict", "model"):
            if isinstance(sd, dict) and wrap in sd and isinstance(sd[wrap], dict):
                sd = sd[wrap]
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
        if spec_hint is not None:
            spec = spec_hint
        elif model_name in RN_SPECS:
            rn = RN_SPECS[model_name]
            spec = CLIPSpec(embed_dim=rn.output_dim, vision_rn=rn)
        else:
            spec = CLIPSpec.vit_b16() if "16" in model_name else CLIPSpec.vit_b32()
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
