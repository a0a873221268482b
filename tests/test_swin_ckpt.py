"""Swin checkpoint mapping: official key layout -> our params, forward runs."""

import numpy as np
import jax

from pevit_tpu.models.swin import SwinSpec, swin_forward, swin_state_dict_to_params


def synthetic_official_sd(embed=32, depths=(2, 2), heads=(2, 4), window=7, p=4, n_classes=5):
    rng = np.random.default_rng(0)
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.02
    sd = {
        "patch_embed.proj.weight": r(embed, 3, p, p),
        "patch_embed.proj.bias": r(embed),
        "patch_embed.norm.weight": np.ones(embed, np.float32),
        "patch_embed.norm.bias": np.zeros(embed, np.float32),
        "norm.weight": np.ones(embed * 2 ** (len(depths) - 1), np.float32),
        "norm.bias": np.zeros(embed * 2 ** (len(depths) - 1), np.float32),
        "head.weight": r(n_classes, embed * 2 ** (len(depths) - 1)),
        "head.bias": np.zeros(n_classes, np.float32),
    }
    for s, (d, h) in enumerate(zip(depths, heads)):
        dim = embed * 2 ** s
        for b in range(d):
            pre = f"layers.{s}.blocks.{b}"
            sd[f"{pre}.norm1.weight"] = np.ones(dim, np.float32)
            sd[f"{pre}.norm1.bias"] = np.zeros(dim, np.float32)
            sd[f"{pre}.attn.qkv.weight"] = r(3 * dim, dim)
            sd[f"{pre}.attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
            sd[f"{pre}.attn.proj.weight"] = r(dim, dim)
            sd[f"{pre}.attn.proj.bias"] = np.zeros(dim, np.float32)
            sd[f"{pre}.attn.relative_position_bias_table"] = r((2 * window - 1) ** 2, h)
            sd[f"{pre}.attn.relative_position_index"] = np.zeros(
                (window * window, window * window), np.int64
            )
            sd[f"{pre}.norm2.weight"] = np.ones(dim, np.float32)
            sd[f"{pre}.norm2.bias"] = np.zeros(dim, np.float32)
            sd[f"{pre}.mlp.fc1.weight"] = r(4 * dim, dim)
            sd[f"{pre}.mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
            sd[f"{pre}.mlp.fc2.weight"] = r(dim, 4 * dim)
            sd[f"{pre}.mlp.fc2.bias"] = np.zeros(dim, np.float32)
        if s < len(depths) - 1:
            sd[f"layers.{s}.downsample.norm.weight"] = np.ones(4 * dim, np.float32)
            sd[f"layers.{s}.downsample.norm.bias"] = np.zeros(4 * dim, np.float32)
            sd[f"layers.{s}.downsample.reduction.weight"] = r(2 * dim, 4 * dim)
    return sd


def test_swin_ckpt_mapping_and_forward():
    sd = synthetic_official_sd()
    params, spec = swin_state_dict_to_params(sd)
    assert spec.embed_dim == 32 and spec.depths == (2, 2)
    assert spec.num_heads == (2, 4) and spec.window_size == 7
    assert spec.num_classes == 5
    # weight placement spot check: qkv transposed to (in, out)
    np.testing.assert_allclose(
        np.asarray(params["stages"][0]["blocks"][0]["qkv"]["kernel"]),
        sd["layers.0.blocks.0.attn.qkv.weight"].T,
    )
    spec56 = SwinSpec(
        img_size=56, patch_size=spec.patch_size, embed_dim=spec.embed_dim,
        depths=spec.depths, num_heads=spec.num_heads, window_size=spec.window_size,
        num_classes=spec.num_classes,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3))
    logits = swin_forward(params, x, spec=spec56)
    assert logits.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(logits)))
