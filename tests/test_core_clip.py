"""Core CLIP forward: shapes, dtype islands, PEFT-hook integration, and a
full-block parity check against the NumPy attention oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from pevit_tpu.core import (
    CLIPSpec,
    TextSpec,
    VisionSpec,
    encode_image,
    encode_text,
    init_clip_params,
)
from pevit_tpu.core.layers import layer_norm, multi_head_attention
from pevit_tpu.peft import PeftConfig, init_peft, make_hooks
from tests import oracles

TINY = CLIPSpec(
    embed_dim=32,
    vision=VisionSpec(input_resolution=32, patch_size=16, width=64, layers=2, heads=2, output_dim=32),
    text=TextSpec(context_length=12, vocab_size=100, width=32, heads=2, layers=2, output_dim=32),
)


def test_encode_image_shape():
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
    feats = encode_image(params, x, spec=TINY)
    assert feats.shape == (3, 32)
    assert feats.dtype == jnp.float32


def test_encode_text_shape_and_eot():
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    tokens = jnp.zeros((2, 12), jnp.int32)
    # put the highest token (EOT) at different positions
    tokens = tokens.at[0, 3].set(99).at[1, 7].set(99)
    feats = encode_text(params, tokens, spec=TINY)
    assert feats.shape == (2, 32)
    # moving tokens AFTER the eot position must not change the features
    tokens2 = tokens.at[0, 5].set(50)
    feats2 = encode_text(params, tokens2, spec=TINY)
    assert not np.allclose(np.asarray(feats)[0], np.asarray(feats2)[0]) or True
    # moving tokens after EOT changes block outputs at other positions but the
    # pooled feature comes from the EOT position which attends only backwards.
    np.testing.assert_allclose(np.asarray(feats)[0], np.asarray(feats2)[0], rtol=1e-5, atol=1e-6)


def test_attention_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    B, N, C, H = 2, 5, 16, 4
    x = rng.standard_normal((B, N, C)).astype(np.float32)
    w_in = rng.standard_normal((3 * C, C)).astype(np.float32) * 0.1
    b_in = rng.standard_normal((3 * C,)).astype(np.float32) * 0.1
    w_out = rng.standard_normal((C, C)).astype(np.float32) * 0.1
    b_out = rng.standard_normal((C,)).astype(np.float32) * 0.1

    params = {
        "in_proj": {"kernel": jnp.asarray(w_in.T), "bias": jnp.asarray(b_in)},
        "out_proj": {"kernel": jnp.asarray(w_out.T), "bias": jnp.asarray(b_out)},
    }
    got = multi_head_attention(params, jnp.asarray(x), n_head=H)
    want = oracles.np_attention_with_delta(
        x.transpose(1, 0, 2).astype(np.float64),
        w_in.astype(np.float64),
        b_in.astype(np.float64),
        w_out.astype(np.float64),
        b_out.astype(np.float64),
        H,
    ).transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_peft_hooks_integration():
    """Each PEFT method must run end-to-end through encode_image; zero-init
    methods must reproduce the frozen-backbone features exactly."""
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    base = encode_image(params, x, spec=TINY)

    for method, identity_at_init in [
        ("kadaptation", False),  # bias b=0 but rules nonzero x zero factors => delta 0; identity
        ("lora", True),
        ("adapter", False),
        ("compacter", False),
    ]:
        cfg = PeftConfig(method=method)
        peft = init_peft(jax.random.PRNGKey(2), cfg, TINY)
        hooks = make_hooks(cfg, TINY, train=False)
        feats = encode_image(params, x, spec=TINY, peft=peft, hooks=hooks)
        assert feats.shape == base.shape, method
        assert np.all(np.isfinite(np.asarray(feats))), method
        if method in ("kadaptation", "lora"):
            # zero-init deltas => bit-identical to frozen backbone
            np.testing.assert_allclose(np.asarray(feats), np.asarray(base), rtol=1e-5, atol=1e-6)


def test_remat_matches_no_remat():
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    a = encode_image(params, x, spec=TINY, remat=False)
    b = encode_image(params, x, spec=TINY, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_fast_ln_switch():
    """TPU.FAST_LN trades the fp32 LN island for activation-dtype stats:
    bf16 inputs diverge slightly (different numerics), fp32 inputs match to
    float rounding, and the switch always restores."""
    from pevit_tpu.core.layers import set_fast_ln

    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    xbf = x32.astype(jnp.bfloat16)
    try:
        ref32, refbf = layer_norm(x32, scale, bias), layer_norm(xbf, scale, bias)
        set_fast_ln(True)
        fast32, fastbf = layer_norm(x32, scale, bias), layer_norm(xbf, scale, bias)
    finally:
        set_fast_ln(False)
    assert fastbf.dtype == jnp.bfloat16 and refbf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(fast32), np.asarray(ref32), rtol=1e-5, atol=1e-6)
    # bf16 stats are a real numerics change (why FAST_LN is opt-in), but
    # stay within bf16 resolution of the fp32-island answer
    np.testing.assert_allclose(
        np.asarray(fastbf, np.float32), np.asarray(refbf, np.float32), rtol=0.1, atol=0.1
    )
    np.testing.assert_allclose(
        np.asarray(layer_norm(x32, scale, bias)), np.asarray(ref32), rtol=0, atol=0
    )


def test_vit_l14_spec_geometry_and_param_tree():
    """ViT-L/14 preset matches OpenAI CLIP L/14 state-dict geometry
    (model.py:1210-1233 inference path); params checked by eval_shape so
    the 428M-param tree is never materialised on the CPU host."""
    spec = CLIPSpec.vit_l14()
    assert spec.vision.seq_len == (224 // 14) ** 2 + 1 == 257
    assert (spec.embed_dim, spec.vision.width, spec.vision.layers, spec.vision.heads) == (768, 1024, 24, 16)
    assert (spec.text.width, spec.text.layers) == (768, 12)

    shapes = jax.eval_shape(lambda k: init_clip_params(k, spec), jax.random.PRNGKey(0))
    leaves = jax.tree.leaves(shapes)
    n_params = sum(int(np.prod(l.shape)) for l in leaves)
    assert 420e6 < n_params < 440e6, n_params  # OpenAI L/14: ~427.6M
    v = shapes["visual"]
    assert v["patch_embed"]["kernel"].shape[0] == 14 * 14 * 3
    assert v["positional_embedding"].shape[0] == 257
