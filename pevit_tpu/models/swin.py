"""Swin Transformer classifier + CLIP-with-Swin visual tower.

Reference: models/cls_swin.py (full Swin classifier — windows, shifted
attention with masking, relative position bias, patch merging) reachable via
``get_cls_model`` (cls_swin.py:683-713), and models/clip_swin.py
(``get_zeroshot_model``, clip_swin.py:274-284) which pairs a Swin visual
tower with a CLIP text transformer.

TPU-native layout: NHWC throughout; window partition/shift are reshapes +
jnp.roll; the shifted-window attention mask is computed statically per stage
with NumPy at build time (static shapes, no data-dependent control flow).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.layers import gelu_exact, layer_norm


@dataclasses.dataclass(frozen=True)
class SwinSpec:
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    num_classes: int = 0
    # Stochastic depth (reference cls_swin.py:209,280-281): DropPath on both
    # residual branches, per-block rate linearly increasing from 0 to
    # ``drop_path_rate`` across sum(depths) blocks (cls_swin.py:533).
    drop_path_rate: float = 0.0
    # Layer-scale (reference cls_swin.py:237-240): learnable per-dim gamma
    # (init 1e-4) multiplying both branch outputs before DropPath/residual.
    layer_scale: bool = False
    # Plain dropout rate (reference cls_swin.py:698 DROP_RATE): pos_drop
    # after patch embed, proj_drop after attention out-proj, two drops in
    # the MLP (cls_swin.py:33-43,168-171,530).
    drop_rate: float = 0.0
    # Learnable absolute position embedding (cls_swin.py:524-528 APE).
    ape: bool = False
    # LayerNorm after patch embedding (cls_swin.py:437-440 PATCH_NORM).
    patch_norm: bool = True
    # Bias on the qkv projection (cls_swin.py:125 QKV_BIAS).
    qkv_bias: bool = True
    # Attention-scale override (cls_swin.py:92,697 QK_SCALE; clip_swin.py:187):
    # None -> head_dim ** -0.5.
    qk_scale: float | None = None

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    def stage_dim(self, i: int) -> int:
        return self.embed_dim * (2 ** i)

    def stage_res(self, i: int) -> int:
        return self.img_size // self.patch_size // (2 ** i)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _trunc(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2, 2, shape, jnp.float32)


def _linear_init(key, d_in, d_out, bias=True):
    p = {"kernel": _trunc(key, (d_in, d_out))}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _relative_index(window: int) -> np.ndarray:
    """(win^2, win^2) indices into the (2w-1)^2 relative-position-bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, n, n)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


def _attn_mask(res: int, window: int, shift: int) -> np.ndarray:
    """Additive mask (nW, win^2, win^2) for shifted windows (cls_swin scheme)."""
    if shift == 0:
        n_w = (res // window) ** 2
        return np.zeros((n_w, window * window, window * window), np.float32)
    # Region map built directly in the ROLLED frame (cls_swin.py:216-232):
    # after x rolls by (-shift, -shift), the wrapped rows/cols live in the
    # trailing slices.  The reference does NOT roll this map — it partitions
    # it as-is.
    img = np.zeros((res, res), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = (
        img.reshape(res // window, window, res // window, window)
        .transpose(0, 2, 1, 3)
        .reshape(-1, window * window)
    )
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def init_swin_params(rng: jax.Array, spec: SwinSpec) -> dict:
    keys = iter(jax.random.split(rng, 512))
    p = spec.patch_size
    params = {
        "patch_embed": {
            "kernel": _trunc(next(keys), (p * p * 3, spec.embed_dim)),
            "bias": jnp.zeros((spec.embed_dim,), jnp.float32),
        },
        "stages": [],
    }
    if spec.patch_norm:
        params["patch_norm"] = {
            "scale": jnp.ones((spec.embed_dim,)),
            "bias": jnp.zeros((spec.embed_dim,)),
        }
    if spec.ape:
        g = spec.img_size // p
        params["absolute_pos_embed"] = _trunc(next(keys), (1, g * g, spec.embed_dim))
    for s in range(spec.num_stages):
        # WindowAttention is built with the CLAMPED window (cls_swin.py:198-201,
        # 204-206), so clamped stages carry a smaller rel-bias table.
        w_eff = min(spec.window_size, spec.stage_res(s))
        w2 = (2 * w_eff - 1) ** 2
        dim = spec.stage_dim(s)
        blocks = []
        for b in range(spec.depths[s]):
            blocks.append(
                {
                    "norm1": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
                    "qkv": _linear_init(next(keys), dim, 3 * dim, bias=spec.qkv_bias),
                    "proj": _linear_init(next(keys), dim, dim),
                    "rel_bias": _trunc(next(keys), (w2, spec.num_heads[s])),
                    "norm2": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
                    "fc1": _linear_init(next(keys), dim, int(dim * spec.mlp_ratio)),
                    "fc2": _linear_init(next(keys), int(dim * spec.mlp_ratio), dim),
                }
            )
            if spec.layer_scale:
                blocks[-1]["gamma"] = 1e-4 * jnp.ones((dim,), jnp.float32)
        stage = {"blocks": blocks}
        if s < spec.num_stages - 1:
            stage["downsample"] = {
                "norm": {"scale": jnp.ones((4 * dim,)), "bias": jnp.zeros((4 * dim,))},
                "reduction": _linear_init(next(keys), 4 * dim, 2 * dim, bias=False),
            }
        params["stages"].append(stage)
    final = spec.stage_dim(spec.num_stages - 1)
    params["norm"] = {"scale": jnp.ones((final,)), "bias": jnp.zeros((final,))}
    if spec.num_classes:
        params["head"] = _linear_init(next(keys), final, spec.num_classes)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _drop_path(h: jax.Array, p: float, rng: jax.Array) -> jax.Array:
    """Per-sample stochastic depth (reference cls_swin.py:87-104): keep each
    sample's branch with prob 1-p, rescale kept ones by 1/(1-p)."""
    if p <= 0.0:
        return h
    keep = 1.0 - p
    mask = jax.random.bernoulli(rng, keep, (h.shape[0],) + (1,) * (h.ndim - 1))
    return h * mask.astype(h.dtype) / jnp.asarray(keep, h.dtype)


def _dropout(h: jax.Array, p: float, rng: jax.Array) -> jax.Array:
    """Elementwise inverted dropout (reference DROP_RATE consumers)."""
    if p <= 0.0:
        return h
    keep = 1.0 - p
    mask = jax.random.bernoulli(rng, keep, h.shape)
    return h * mask.astype(h.dtype) / jnp.asarray(keep, h.dtype)


def _window_attention(bp: dict, x: jax.Array, *, res: int, window: int, shift: int, n_head: int, mask: jax.Array,
                      drop_rate: float = 0.0, drop_rng: jax.Array | None = None,
                      qk_scale: float | None = None):
    """x: (B, res, res, C) -> attention BRANCH output (caller adds residual)."""
    B, _, _, C = x.shape
    hd = C // n_head
    h = layer_norm(x, bp["norm1"]["scale"], bp["norm1"]["bias"])
    if shift:
        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
    nw = res // window
    # partition into windows: (B*nW, win*win, C)
    h = (
        h.reshape(B, nw, window, nw, window, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B * nw * nw, window * window, C)
    )
    qkv = h @ bp["qkv"]["kernel"].astype(h.dtype)
    if "bias" in bp["qkv"]:
        qkv = qkv + bp["qkv"]["bias"].astype(h.dtype)
    q, k, v = jnp.split(qkv.reshape(-1, window * window, 3, n_head, hd).transpose(2, 0, 3, 1, 4), 3, axis=0)
    q, k, v = q[0], k[0], v[0]  # (B*nW, H, n, hd)
    # cls_swin.py:92: self.scale = qk_scale or head_dim ** -0.5
    q = q * (hd ** -0.5 if qk_scale is None else qk_scale)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    rel = bp["rel_bias"][_REL_INDEX_CACHE[window].reshape(-1)].reshape(
        window * window, window * window, n_head
    )
    logits = logits + rel.transpose(2, 0, 1)[None]
    logits = logits + jnp.tile(mask[None], (B, 1, 1, 1)).reshape(-1, 1, window * window, window * window)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(-1, window * window, C)
    out = out @ bp["proj"]["kernel"].astype(out.dtype) + bp["proj"]["bias"].astype(out.dtype)
    if drop_rate > 0.0:
        out = _dropout(out, drop_rate, drop_rng)  # proj_drop (cls_swin.py:170)
    out = (
        out.reshape(B, nw, nw, window, window, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, res, res, C)
    )
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    return out


_REL_INDEX_CACHE: dict = {}
_MASK_CACHE: dict = {}


def swin_forward_features(
    params: dict,
    x: jax.Array,
    *,
    spec: SwinSpec,
    compute_dtype=jnp.float32,
    train: bool = False,
    rng: jax.Array | None = None,
):
    """(B, H, W, 3) -> (B, final_dim) pooled features.

    ``train=True`` enables stochastic depth when ``spec.drop_path_rate > 0``
    (requires ``rng``); eval mode and rate 0.0 are exactly the r2 behaviour.
    """
    use_dp = train and spec.drop_path_rate > 0.0
    use_do = train and spec.drop_rate > 0.0
    if (use_dp or use_do) and rng is None:
        raise ValueError(
            f"DROP_PATH_RATE={spec.drop_path_rate}/DROP_RATE={spec.drop_rate} "
            "in train mode requires an rng"
        )
    do_rate = spec.drop_rate if use_do else 0.0
    # independent rng streams for drop-path vs dropout
    rng_do = jax.random.fold_in(rng, 0x5EED) if use_do else None
    do_ctr = 0

    def next_do_rng():
        nonlocal do_ctr
        do_ctr += 1
        return jax.random.fold_in(rng_do, do_ctr)
    # torch.linspace(0, rate, sum(depths)) — reference cls_swin.py:533
    dpr = np.linspace(0.0, spec.drop_path_rate, sum(spec.depths))
    blk_idx = 0
    B = x.shape[0]
    p = spec.patch_size
    g = spec.img_size // p
    x = x.astype(compute_dtype)
    x = x.reshape(B, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, p * p * 3)
    x = x @ params["patch_embed"]["kernel"].astype(compute_dtype) + params["patch_embed"]["bias"].astype(compute_dtype)
    if "patch_norm" in params:
        x = layer_norm(x, params["patch_norm"]["scale"], params["patch_norm"]["bias"])
    if "absolute_pos_embed" in params:
        x = x + params["absolute_pos_embed"].astype(x.dtype)
    if do_rate > 0.0:
        x = _dropout(x, do_rate, next_do_rng())  # pos_drop (cls_swin.py:530)
    x = x.reshape(B, g, g, spec.embed_dim)

    # cache plain numpy (NOT jnp) arrays: a jnp.asarray created while tracing
    # is a tracer and leaks across jit calls if stored in a module global
    win = spec.window_size

    for s, stage in enumerate(params["stages"]):
        res = spec.stage_res(s)
        # Reference clamp (cls_swin.py:198-201): when the stage resolution is
        # <= the window, the whole stage is ONE window — no shift, window
        # shrunk to the resolution.  This hits the LAST stage of every
        # standard Swin (res 7 == window 7), where the reference runs
        # full unshifted attention on both blocks.
        eff_win = min(win, res)
        if eff_win not in _REL_INDEX_CACHE:
            _REL_INDEX_CACHE[eff_win] = _relative_index(eff_win)
        for b, bp in enumerate(stage["blocks"]):
            shift = 0 if (b % 2 == 0 or res <= win) else win // 2
            key = (res, eff_win, shift)
            if key not in _MASK_CACHE:
                _MASK_CACHE[key] = _attn_mask(res, eff_win, shift)
            attn_out = _window_attention(
                bp, x, res=res, window=eff_win, shift=shift, n_head=spec.num_heads[s], mask=_MASK_CACHE[key],
                drop_rate=do_rate, drop_rng=next_do_rng() if do_rate > 0.0 else None,
                qk_scale=spec.qk_scale,
            )
            gamma = bp.get("gamma")
            if gamma is not None:
                attn_out = attn_out * gamma.astype(attn_out.dtype)
            p_blk = float(dpr[blk_idx]) if use_dp else 0.0
            if p_blk > 0.0:
                attn_out = _drop_path(attn_out, p_blk, jax.random.fold_in(rng, 2 * blk_idx))
            x = x + attn_out
            h = layer_norm(x, bp["norm2"]["scale"], bp["norm2"]["bias"])
            h = gelu_exact(h @ bp["fc1"]["kernel"].astype(h.dtype) + bp["fc1"]["bias"].astype(h.dtype))
            if do_rate > 0.0:
                h = _dropout(h, do_rate, next_do_rng())  # Mlp drop 1 (cls_swin.py:39)
            h = h @ bp["fc2"]["kernel"].astype(h.dtype) + bp["fc2"]["bias"].astype(h.dtype)
            if do_rate > 0.0:
                h = _dropout(h, do_rate, next_do_rng())  # Mlp drop 2 (cls_swin.py:42)
            if gamma is not None:
                h = h * gamma.astype(h.dtype)
            if p_blk > 0.0:
                h = _drop_path(h, p_blk, jax.random.fold_in(rng, 2 * blk_idx + 1))
            x = x + h
            blk_idx += 1
        if "downsample" in stage:
            # patch merging: 2x2 neighbourhood concat -> norm -> linear 4C->2C.
            # channel order matches official Swin's [x0,x1,x2,x3] =
            # [r-even/c-even, r-odd/c-even, r-even/c-odd, r-odd/c-odd]:
            # transpose puts (c2, r2) outer-to-inner => c0r0,c0r1,c1r0,c1r1.
            Bc, H, W, C = x.shape
            x = x.reshape(Bc, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 4, 2, 5)
            x = x.reshape(Bc, H // 2, W // 2, 4 * C)
            x = layer_norm(x, stage["downsample"]["norm"]["scale"], stage["downsample"]["norm"]["bias"])
            x = x @ stage["downsample"]["reduction"]["kernel"].astype(x.dtype)

    x = x.reshape(B, -1, x.shape[-1])
    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"])
    return jnp.mean(x, axis=1)


def swin_forward(params, x, *, spec: SwinSpec, compute_dtype=jnp.float32, train=False, rng=None):
    feats = swin_forward_features(params, x, spec=spec, compute_dtype=compute_dtype, train=train, rng=rng)
    if "head" in params:
        return feats @ params["head"]["kernel"].astype(feats.dtype) + params["head"]["bias"].astype(feats.dtype)
    return feats


def swin_state_dict_to_params(sd: dict) -> tuple:
    """Official Swin checkpoint (microsoft/Swin-Transformer key layout) ->
    (params, spec).  Covers cls_swin's loading surface (cls_swin.py:683-713)."""
    import numpy as np

    sd = {k: np.asarray(v, np.float32) for k, v in sd.items() if hasattr(v, "shape")}
    conv = sd["patch_embed.proj.weight"]  # (C, 3, p, p)
    embed_dim, _, p, _ = conv.shape
    n_stages = len({k.split(".")[1] for k in sd if k.startswith("layers.")})
    depths, heads = [], []
    for s in range(n_stages):
        blocks = {int(k.split(".")[3]) for k in sd if k.startswith(f"layers.{s}.blocks.")}
        depths.append(len(blocks))
        heads.append(sd[f"layers.{s}.blocks.0.attn.relative_position_bias_table"].shape[1])
    table = sd["layers.0.blocks.0.attn.relative_position_bias_table"]
    window = (int(round(table.shape[0] ** 0.5)) + 1) // 2
    spec = SwinSpec(
        patch_size=p,
        embed_dim=embed_dim,
        depths=tuple(depths),
        num_heads=tuple(heads),
        window_size=window,
        num_classes=sd["head.weight"].shape[0] if "head.weight" in sd else 0,
        layer_scale="layers.0.blocks.0.gamma" in sd,
        ape="absolute_pos_embed" in sd,
        patch_norm="patch_embed.norm.weight" in sd,
        qkv_bias="layers.0.blocks.0.attn.qkv.bias" in sd,
    )

    def lin(prefix, bias=True):
        out = {"kernel": jnp.asarray(sd[f"{prefix}.weight"].T)}
        if bias and f"{prefix}.bias" in sd:
            out["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return out

    def ln(prefix):
        return {"scale": jnp.asarray(sd[f"{prefix}.weight"]), "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    params = {
        "patch_embed": {
            "kernel": jnp.asarray(conv.transpose(2, 3, 1, 0).reshape(p * p * 3, embed_dim)),
            "bias": jnp.asarray(sd["patch_embed.proj.bias"]),
        },
        "stages": [],
        "norm": ln("norm"),
    }
    if spec.patch_norm:
        params["patch_norm"] = ln("patch_embed.norm")
    if spec.ape:
        ape_w = sd["absolute_pos_embed"]  # (1, L, C)
        params["absolute_pos_embed"] = jnp.asarray(ape_w.reshape(1, -1, embed_dim))
    for s in range(n_stages):
        blocks = []
        for b in range(depths[s]):
            pre = f"layers.{s}.blocks.{b}"
            blocks.append(
                {
                    "norm1": ln(f"{pre}.norm1"),
                    "qkv": lin(f"{pre}.attn.qkv"),
                    "proj": lin(f"{pre}.attn.proj"),
                    "rel_bias": jnp.asarray(sd[f"{pre}.attn.relative_position_bias_table"]),
                    "norm2": ln(f"{pre}.norm2"),
                    "fc1": lin(f"{pre}.mlp.fc1"),
                    "fc2": lin(f"{pre}.mlp.fc2"),
                }
            )
            # layer-scale gamma if the checkpoint was trained with it
            # (reference cls_swin.py:237-240)
            if f"{pre}.gamma" in sd:
                blocks[-1]["gamma"] = jnp.asarray(sd[f"{pre}.gamma"])
        stage = {"blocks": blocks}
        if f"layers.{s}.downsample.reduction.weight" in sd:
            stage["downsample"] = {
                "norm": ln(f"layers.{s}.downsample.norm"),
                "reduction": lin(f"layers.{s}.downsample.reduction", bias=False),
            }
        params["stages"].append(stage)
    if "head.weight" in sd:
        params["head"] = lin("head")
    return params, spec


def clip_swin_state_dict_to_params(sd: dict) -> tuple:
    """CLIP-Swin checkpoint (clip_swin.py:153-260 layout) ->
    (params, SwinSpec, CLIPSpec).

    Keys: ``visual.*`` (official Swin layout — reuses
    ``swin_state_dict_to_params``), ``text.token_embedding.weight`` /
    ``text.positional_embedding`` / ``text.resblocks.N.*`` /
    ``text.ln_final.*`` (clip_swin.py:77-146), plus bare ``text_projection``
    and ``vision_projection`` matrices and ``logit_scale``
    (clip_swin.py:170-202).  Loaded strict=False by the reference
    (feature.py:236) — unknown keys are ignored here too.
    """
    import numpy as np

    from ..ckpt.torch_loader import _ln, _stack_blocks
    from ..core.clip import CLIPSpec, TextSpec

    sd = {k: np.asarray(v, np.float32) for k, v in sd.items() if hasattr(v, "shape")}
    visual_sd = {k[len("visual."):]: v for k, v in sd.items() if k.startswith("visual.")}
    visual_params, sspec = swin_state_dict_to_params(visual_sd)

    tsub = {k[len("text."):]: v for k, v in sd.items() if k.startswith("text.")}
    n_layers = len({k.split(".")[1] for k in tsub if k.startswith("resblocks.")})
    twidth = tsub["token_embedding.weight"].shape[1]
    embed_dim = sd["text_projection"].shape[1]
    cspec = CLIPSpec(
        embed_dim=embed_dim,
        text=TextSpec(
            context_length=tsub["positional_embedding"].shape[0],
            vocab_size=tsub["token_embedding.weight"].shape[0],
            width=twidth,
            heads=max(1, twidth // 64),
            layers=n_layers,
            output_dim=embed_dim,
        ),
    )
    params = {
        "visual": visual_params,
        "vision_projection": jnp.asarray(sd["vision_projection"]),
        "text": {
            "token_embedding": jnp.asarray(tsub["token_embedding.weight"]),
            "positional_embedding": jnp.asarray(tsub["positional_embedding"]),
            "blocks": _stack_blocks(tsub, "resblocks", n_layers),
            "ln_final": _ln(tsub, "ln_final"),
        },
        "text_projection": jnp.asarray(sd["text_projection"]),
        "logit_scale": jnp.asarray(sd["logit_scale"].reshape(())),
    }
    return params, sspec, cspec


def swin_tiny(num_classes: int = 0, img_size: int = 224) -> SwinSpec:
    return SwinSpec(img_size=img_size, num_classes=num_classes)


def swin_base(num_classes: int = 0, img_size: int = 224) -> SwinSpec:
    return SwinSpec(
        img_size=img_size,
        embed_dim=128,
        depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32),
        num_classes=num_classes,
    )
