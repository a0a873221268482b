"""Auxiliary backbone tests: ViT (MAE/MoCo variants), Swin, DeCLIP, factory."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from pevit_tpu.models import (
    DeclipSpec,
    SwinSpec,
    ViTSpec,
    get_model,
    init_declip_params,
    init_swin_params,
    init_vit_params,
    normalize_vit_state_dict,
    sincos_pos_embed_2d,
    swin_forward_features,
    timm_state_dict_to_params,
    vit_forward_features,
)

TINY_VIT = ViTSpec(input_resolution=32, patch_size=16, width=64, layers=2, heads=2)


def test_vit_forward_shapes_and_pooling():
    params = init_vit_params(jax.random.PRNGKey(0), TINY_VIT)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    cls_feats = vit_forward_features(params, x, spec=TINY_VIT)
    assert cls_feats.shape == (2, 64)

    gp = dataclasses.replace(TINY_VIT, global_pool=True)
    gp_feats = vit_forward_features(params, x, spec=gp)
    assert gp_feats.shape == (2, 64)
    assert not np.allclose(np.asarray(cls_feats), np.asarray(gp_feats))


def test_sincos_pos_embed_properties():
    pos = sincos_pos_embed_2d(64, 4)
    assert pos.shape == (17, 64)
    np.testing.assert_allclose(pos[0], 0.0)  # cls row zero
    assert np.abs(pos[1:]).max() <= 1.0


def test_vit_parity_vs_torch_roundtrip():
    """timm-layout state dict -> our params -> forward must match a minimal
    torch pre-LN ViT built from the same weights."""
    torch.manual_seed(0)
    W, L, H, P, RES = 128, 2, 2, 16, 32

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = torch.nn.LayerNorm(W)
            self.attn_qkv = torch.nn.Linear(W, 3 * W)
            self.attn_proj = torch.nn.Linear(W, W)
            self.norm2 = torch.nn.LayerNorm(W)
            self.fc1 = torch.nn.Linear(W, 4 * W)
            self.fc2 = torch.nn.Linear(4 * W, W)

        def forward(self, x):
            B, N, _ = x.shape
            h = self.norm1(x)
            qkv = self.attn_qkv(h).reshape(B, N, 3, H, W // H).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = torch.softmax(q @ k.transpose(-2, -1) / (W // H) ** 0.5, dim=-1)
            o = (a @ v).transpose(1, 2).reshape(B, N, W)
            x = x + self.attn_proj(o)
            return x + self.fc2(torch.nn.functional.gelu(self.fc1(self.norm2(x))))

    class TorchViT(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.patch = torch.nn.Conv2d(3, W, P, P)
            self.cls = torch.nn.Parameter(torch.randn(1, 1, W) * 0.02)
            self.pos = torch.nn.Parameter(torch.randn(1, (RES // P) ** 2 + 1, W) * 0.02)
            self.blocks = torch.nn.ModuleList([Block() for _ in range(L)])
            self.norm = torch.nn.LayerNorm(W)

        def forward(self, x):
            x = self.patch(x).flatten(2).transpose(1, 2)
            x = torch.cat([self.cls.expand(x.shape[0], -1, -1), x], dim=1) + self.pos
            for b in self.blocks:
                x = b(x)
            return self.norm(x)[:, 0]

    tm = TorchViT().eval()
    sd = {}
    for k, v in tm.state_dict().items():
        k = (
            k.replace("patch.", "patch_embed.proj.")
            .replace("attn_qkv", "attn.qkv")
            .replace("attn_proj", "attn.proj")
            .replace("fc1", "mlp.fc1")
            .replace("fc2", "mlp.fc2")
            .replace("cls", "cls_token")
            .replace("pos", "pos_embed")
        )
        sd[k] = v.numpy()
    params, spec = timm_state_dict_to_params(sd)
    assert spec.width == W and spec.layers == L and spec.heads == H

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, RES, RES, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(vit_forward_features(params, jnp.asarray(x), spec=spec))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_normalize_vit_state_dict_unwraps_mae_and_moco():
    sd = {"model": {"cls_token": np.zeros((1, 1, 4))}}
    assert "cls_token" in normalize_vit_state_dict(sd)
    sd = {"state_dict": {"module.base_encoder.cls_token": np.zeros((1, 1, 4))}}
    assert "cls_token" in normalize_vit_state_dict(sd)


def test_swin_forward_shapes():
    spec = SwinSpec(img_size=56, patch_size=4, embed_dim=32, depths=(2, 2), num_heads=(2, 4), window_size=7)
    params = init_swin_params(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    feats = swin_forward_features(params, x, spec=spec)
    assert feats.shape == (2, 64)
    assert np.all(np.isfinite(np.asarray(feats)))
    # shifted windows actually change the computation (depth>=2 covers shift)
    spec1 = SwinSpec(img_size=56, patch_size=4, embed_dim=32, depths=(1, 1), num_heads=(2, 4), window_size=7)
    params1 = {
        "patch_embed": params["patch_embed"],
        "patch_norm": params["patch_norm"],
        "stages": [
            {"blocks": params["stages"][0]["blocks"][:1], "downsample": params["stages"][0]["downsample"]},
            {"blocks": params["stages"][1]["blocks"][:1]},
        ],
        "norm": params["norm"],
    }
    feats1 = swin_forward_features(params1, x, spec=spec1)
    assert not np.allclose(np.asarray(feats), np.asarray(feats1))


def test_declip_towers():
    from pevit_tpu.core.clip import TextSpec, VisionSpec

    spec = DeclipSpec(
        variant="filip",
        embed_dim=32,
        vision=VisionSpec(input_resolution=32, patch_size=16, width=64, layers=2, heads=2, output_dim=32),
        text=TextSpec(context_length=12, vocab_size=64, width=32, heads=2, layers=2, output_dim=32),
        dense_embed_dim=16,
    )
    params = init_declip_params(jax.random.PRNGKey(0), spec)
    from pevit_tpu.models import declip

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    img = declip.encode_image(params, x, spec=spec)
    assert img.shape == (2, 32)
    toks = jnp.zeros((2, 12), jnp.int32).at[:, 4].set(63)
    txt = declip.encode_text(params, toks, spec=spec)
    assert txt.shape == (2, 32)
    # FILIP dense surfaces: per-token features through the mapping heads
    dense_t = declip.encode_text_dense(params, toks, spec=spec)
    assert dense_t.shape == (2, 12, 16)
    dense_i = declip.encode_image_dense(params, x, spec=spec)
    assert dense_i.shape == (2, 4, 16)


def test_factory_dispatch():
    from pevit_tpu.config import get_default_config

    cfg = get_default_config()
    cfg.TRAIN.IMAGE_SIZE = [32, 32]
    cfg.MODEL.SPEC.EMBED_DIM = 32
    cfg.MODEL.SPEC.VISION = {"PATCH_SIZE": 16, "WIDTH": 64, "LAYERS": 2}
    cfg.MODEL.SPEC.TEXT.update({"WIDTH": 32, "HEADS": 2, "LAYERS": 2, "VOCAB_SIZE": 64, "CONTEXT_LENGTH": 12})

    cfg.MODEL.NAME = "ViT-B/32"
    cfg.MODEL.PRETRAINED = "random"
    bb = get_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    assert bb.forward_features(bb.params, x).shape == (2, 32)
    assert bb.encode_text is not None

    # mocov3/mae consume the SPEC shape keys (mocov3.py:145-147) — use a
    # fresh config: the CLIP-style SPEC above (EMBED_DIM 32 = projection
    # width) would legitimately build a width-32 MoCo tower
    cfg2 = get_default_config()
    cfg2.TRAIN.IMAGE_SIZE = [32, 32]
    cfg2.MODEL.NAME = "mocov3_vitb16"
    bb2 = get_model(cfg2)
    # random init is built at TRAIN.IMAGE_SIZE (the reference's timm ViT is
    # fixed-size and asserts on mismatch, mocov3.py:101-102) — 32 here
    x32 = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    assert bb2.forward_features(bb2.params, x32).shape == (1, 768)
    # EMBED_DIM drives the random-init width (reference mocov3.py:145)
    cfg2.MODEL.SPEC.update({"EMBED_DIM": 64, "NUM_HEADS": 2, "DEPTH": 2})
    bb3 = get_model(cfg2)
    assert bb3.forward_features(bb3.params, x32).shape == (1, 64)

    cfg.MODEL.NAME = "not_a_model"
    with pytest.raises(ValueError):
        get_model(cfg)
