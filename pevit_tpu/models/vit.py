"""Generic (timm-style) ViT classifier backbone.

Covers the reference's auxiliary ViT family reachable through
``get_model`` (feature.py:241-317):

* supervised ``vit_base_patch{16,32}_224`` / ``deit_base_patch16_224``,
* **MAE** ViTs (models/mae.py — timm ViT subclass with a ``global_pool``
  option: mean over patch tokens + fc_norm instead of the CLS token; the
  linear-probe command forces GLOBAL_POOL False, linear_probe.py:88-91),
* **MoCo-v3** ViTs (models/mocov3.py — fixed 2D sin-cos positional
  embeddings; checkpoint keys carry ``module.base_encoder.`` prefixes).

Standard pre-LN ViT with exact-erf GELU (timm default), parameter-stacked
blocks under lax.scan like the core CLIP tower.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from ..core.layers import gelu_exact, layer_norm, residual_attention_block


@dataclasses.dataclass(frozen=True)
class ViTSpec:
    input_resolution: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    num_classes: int = 0
    global_pool: bool = False  # MAE-style mean-pool + fc_norm
    sincos_pos: bool = False   # MoCo-v3 fixed 2D sin-cos positional embedding

    @property
    def grid(self) -> int:
        return self.input_resolution // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1


def sincos_pos_embed_2d(width: int, grid: int, cls_token: bool = True) -> np.ndarray:
    """Fixed 2D sine-cosine positional embedding (MoCo-v3 / MAE scheme)."""
    assert width % 4 == 0
    dim_q = width // 4
    omega = 1.0 / (10000 ** (np.arange(dim_q, dtype=np.float64) / dim_q))
    coords = np.arange(grid, dtype=np.float64)
    gy, gx = np.meshgrid(coords, coords, indexing="ij")
    out = []
    for g in (gy, gx):
        ang = g.reshape(-1, 1) * omega[None, :]
        out.extend([np.sin(ang), np.cos(ang)])
    pos = np.concatenate(out, axis=1)  # (grid*grid, width)
    if cls_token:
        pos = np.concatenate([np.zeros((1, width)), pos], axis=0)
    return pos.astype(np.float32)


def init_vit_params(rng: jax.Array, spec: ViTSpec) -> dict:
    ks = jax.random.split(rng, 8)
    w = spec.width
    trunc = lambda k, shape, std=0.02: std * jax.random.truncated_normal(k, -2, 2, shape, jnp.float32)
    L = spec.layers

    if spec.sincos_pos:
        pos = jnp.asarray(sincos_pos_embed_2d(w, spec.grid))
    else:
        pos = trunc(ks[0], (spec.seq_len, w))

    blocks = {
        "attn": {
            "in_proj": {
                "kernel": trunc(ks[1], (L, w, 3 * w)),
                "bias": jnp.zeros((L, 3 * w), jnp.float32),
            },
            "out_proj": {
                "kernel": trunc(ks[2], (L, w, w)),
                "bias": jnp.zeros((L, w), jnp.float32),
            },
        },
        "mlp": {
            "c_fc": {"kernel": trunc(ks[3], (L, w, 4 * w)), "bias": jnp.zeros((L, 4 * w), jnp.float32)},
            "c_proj": {"kernel": trunc(ks[4], (L, 4 * w, w)), "bias": jnp.zeros((L, w), jnp.float32)},
        },
        "ln_1": {"scale": jnp.ones((L, w), jnp.float32), "bias": jnp.zeros((L, w), jnp.float32)},
        "ln_2": {"scale": jnp.ones((L, w), jnp.float32), "bias": jnp.zeros((L, w), jnp.float32)},
    }
    params = {
        "patch_embed": {
            "kernel": trunc(ks[5], (spec.patch_size * spec.patch_size * 3, w)),
            "bias": jnp.zeros((w,), jnp.float32),
        },
        "cls_token": trunc(ks[6], (w,)),
        "pos_embed": pos,
        "blocks": blocks,
        "norm": {"scale": jnp.ones((w,), jnp.float32), "bias": jnp.zeros((w,), jnp.float32)},
    }
    if spec.num_classes:
        params["head"] = {
            "kernel": trunc(ks[7], (w, spec.num_classes)),
            "bias": jnp.zeros((spec.num_classes,), jnp.float32),
        }
    return params


def vit_forward_features(
    params: dict,
    x: jax.Array,
    *,
    spec: ViTSpec,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    """(B, H, W, 3) float -> (B, width) pooled features."""
    B = x.shape[0]
    p, g = spec.patch_size, spec.grid
    x = x.astype(compute_dtype)
    x = x.reshape(B, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, p * p * 3)
    x = x @ params["patch_embed"]["kernel"].astype(compute_dtype) + params["patch_embed"]["bias"].astype(compute_dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(compute_dtype), (B, 1, spec.width))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(compute_dtype)

    def block_fn(x, block_p):
        return (
            residual_attention_block(block_p, x, n_head=spec.heads, act=gelu_exact),
            None,
        )

    fn = jax.checkpoint(block_fn) if remat else block_fn
    x, _ = jax.lax.scan(fn, x, params["blocks"])

    if spec.global_pool:
        # MAE global-pool: mean over patch tokens, then (fc_)norm (mae.py:30-38)
        feats = jnp.mean(x[:, 1:, :], axis=1)
        return layer_norm(feats, params["norm"]["scale"], params["norm"]["bias"])
    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"])
    return x[:, 0]


def vit_forward(params, x, *, spec: ViTSpec, compute_dtype=jnp.float32, remat: bool = False):
    feats = vit_forward_features(params, x, spec=spec, compute_dtype=compute_dtype, remat=remat)
    if "head" in params:
        return feats @ params["head"]["kernel"].astype(feats.dtype) + params["head"]["bias"].astype(feats.dtype)
    return feats


# ---------------------------------------------------------------------------
# checkpoint adapters
# ---------------------------------------------------------------------------

def _stack_timm_blocks(sd: dict, n_layers: int) -> dict:
    def stacked(key, transpose=False):
        arrs = [np.asarray(sd[f"blocks.{i}.{key}"], np.float32) for i in range(n_layers)]
        return jnp.asarray(np.stack([a.T if transpose else a for a in arrs]))

    return {
        "attn": {
            "in_proj": {"kernel": stacked("attn.qkv.weight", True), "bias": stacked("attn.qkv.bias")},
            "out_proj": {"kernel": stacked("attn.proj.weight", True), "bias": stacked("attn.proj.bias")},
        },
        "mlp": {
            "c_fc": {"kernel": stacked("mlp.fc1.weight", True), "bias": stacked("mlp.fc1.bias")},
            "c_proj": {"kernel": stacked("mlp.fc2.weight", True), "bias": stacked("mlp.fc2.bias")},
        },
        "ln_1": {"scale": stacked("norm1.weight"), "bias": stacked("norm1.bias")},
        "ln_2": {"scale": stacked("norm2.weight"), "bias": stacked("norm2.bias")},
    }


def timm_state_dict_to_params(sd: dict, *, global_pool: bool = False) -> tuple:
    """timm ViT state dict -> (params, spec).

    Handles MAE checkpoints (nested under 'model'; mae.py:88-98) and MoCo-v3
    (nested under 'state_dict' with module.base_encoder. prefixes renamed;
    mocov3.py:141-167) when callers pre-strip those wrappers via
    ``normalize_vit_state_dict``.
    """
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    n_layers = len({k.split(".")[1] for k in sd if k.startswith("blocks.")})
    conv = sd["patch_embed.proj.weight"]  # (w, 3, p, p)
    w, _, p, _ = conv.shape
    n_pos = sd["pos_embed"].shape[-2]
    grid = int(round((n_pos - 1) ** 0.5))
    norm_key = "fc_norm" if "fc_norm.weight" in sd else "norm"
    spec = ViTSpec(
        input_resolution=p * grid,
        patch_size=p,
        width=w,
        layers=n_layers,
        heads=w // 64,
        num_classes=sd["head.weight"].shape[0] if "head.weight" in sd else 0,
        global_pool=global_pool or norm_key == "fc_norm",
    )
    params = {
        "patch_embed": {
            "kernel": jnp.asarray(conv.transpose(2, 3, 1, 0).reshape(p * p * 3, w)),
            "bias": jnp.asarray(sd.get("patch_embed.proj.bias", np.zeros(w, np.float32))),
        },
        "cls_token": jnp.asarray(sd["cls_token"].reshape(-1)),
        "pos_embed": jnp.asarray(sd["pos_embed"].reshape(n_pos, w)),
        "blocks": _stack_timm_blocks(sd, n_layers),
        "norm": {
            "scale": jnp.asarray(sd[f"{norm_key}.weight"]),
            "bias": jnp.asarray(sd[f"{norm_key}.bias"]),
        },
    }
    if "head.weight" in sd:
        params["head"] = {
            "kernel": jnp.asarray(sd["head.weight"].T),
            "bias": jnp.asarray(sd.get("head.bias", np.zeros(spec.num_classes, np.float32))),
        }
    return params, spec


def normalize_vit_state_dict(obj: dict) -> dict:
    """Unwrap MAE 'model' / MoCo-v3 'state_dict' + module.base_encoder keys."""
    sd = obj
    if "model" in sd and isinstance(sd["model"], dict):  # MAE (mae.py:90)
        sd = sd["model"]
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):  # MoCo-v3
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        # MoCo-v3 key renaming (mocov3.py:148-160)
        for prefix in ("module.base_encoder.", "module.momentum_encoder.", "base_encoder.", "module."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        if k.startswith("head."):  # MoCo's contrastive head is dropped
            if not (k == "head.weight" or k == "head.bias"):
                continue
        out[k] = v
    return out
