"""Custom-VJP correctness: lean attention + QuickGELU grads == autodiff.

These paths are the DEFAULTS on the training hot loop (attention_core routes
mask-free attention to xla_attention_lean; layers.quick_gelu saves only its
input).  Each is checked against plain-autodiff reference formulas in fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pevit_tpu.ops.attention import (
    _xla_attention_bnhd,
    attention_core,
    xla_attention_lean,
    xla_attention_remat,
)


def _rand_qkv(key, B=2, N=9, H=3, hd=8):
    kq, kk, kv = jax.random.split(key, 3)
    shape = (B, N, H, hd)
    return (
        jax.random.normal(kq, shape, jnp.float32),
        jax.random.normal(kk, shape, jnp.float32),
        jax.random.normal(kv, shape, jnp.float32),
    )


def _autodiff_attention(q, k, v):
    # plain-autodiff reference: identical forward math, no custom VJP
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


def _loss_grads(fn, q, k, v):
    def loss(q, k, v):
        out = fn(q, k, v)
        return jnp.sum(jnp.sin(out))  # non-trivial cotangent

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


def test_lean_attention_forward_matches():
    q, k, v = _rand_qkv(jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(xla_attention_lean(q, k, v)),
        np.asarray(_autodiff_attention(q, k, v)),
        rtol=1e-6, atol=1e-6,
    )


def test_lean_attention_grads_match_autodiff():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1))
    ref = _loss_grads(_autodiff_attention, q, k, v)
    got = _loss_grads(xla_attention_lean, q, k, v)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-5)


def test_remat_attention_grads_match_autodiff():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2))
    ref = _loss_grads(_autodiff_attention, q, k, v)
    got = _loss_grads(xla_attention_remat, q, k, v)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-5)


def test_attention_core_default_routes_to_lean():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        np.asarray(attention_core(q, k, v)),
        np.asarray(_xla_attention_bnhd(q, k, v)),
        rtol=1e-6, atol=1e-6,
    )


def test_quick_gelu_grads_match_autodiff():
    from pevit_tpu.core.layers import quick_gelu

    x = jax.random.normal(jax.random.PRNGKey(4), (64,), jnp.float32) * 3.0

    def raw(x):
        return x * jax.nn.sigmoid(1.702 * x)

    np.testing.assert_allclose(np.asarray(quick_gelu(x)), np.asarray(raw(x)), rtol=1e-6)
    g_ref = jax.grad(lambda x: jnp.sum(jnp.sin(raw(x))))(x)
    g_got = jax.grad(lambda x: jnp.sum(jnp.sin(quick_gelu(x))))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-5, atol=1e-6)


def test_bhnd_layout_matches_bnhd_fwd_and_grad():
    """Opt-in head-major attention layout (set_attn_layout) is numerically
    the same computation — forward and grads — as the default layout."""
    import jax
    import jax.numpy as jnp

    from pevit_tpu.core import layers
    from pevit_tpu.core.clip import CLIPSpec, TextSpec, VisionSpec, encode_image, init_clip_params

    spec = CLIPSpec(
        embed_dim=32,
        vision=VisionSpec(input_resolution=32, patch_size=16, width=64, layers=2, heads=2, output_dim=32),
        text=TextSpec(context_length=8, vocab_size=64, width=32, heads=2, layers=2, output_dim=32),
    )
    params = init_clip_params(jax.random.PRNGKey(0), spec)
    # non-zero in_proj bias: exercises the (3,1,H,1,hd) bias broadcast
    params["visual"]["blocks"]["attn"]["in_proj"]["bias"] = 0.3 * jax.random.normal(
        jax.random.PRNGKey(9), params["visual"]["blocks"]["attn"]["in_proj"]["bias"].shape
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 32, 32, 3))

    def loss(p, layout):
        layers.set_attn_layout(layout)
        try:
            return (encode_image(p, x, spec=spec) ** 2).sum()
        finally:
            layers.set_attn_layout("auto")

    f_a, g_a = jax.value_and_grad(lambda p: loss(p, "bnhd"))(params)
    f_b, g_b = jax.value_and_grad(lambda p: loss(p, "bhnd"))(params)
    assert abs(float(f_a) - float(f_b)) < 1e-3 * abs(float(f_a))
    for u, v in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), rtol=2e-3, atol=2e-4)


def test_auto_attn_layout_resolution_and_parity_pinning():
    """'auto' picks bhnd for short sequences (N<=64, the measured crossover
    between B/32's N=50 and B/16's N=197) and bnhd for long ones; parity
    mode pins bnhd (the reference-shaped computation) via TaskStatic."""
    from pevit_tpu.core import layers
    from pevit_tpu.config import get_default_config
    from pevit_tpu.core.clip import CLIPSpec
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.train import TaskStatic

    assert layers._resolve_attn_layout(50) == "bhnd"
    assert layers._resolve_attn_layout(197) == "bnhd"
    layers.set_attn_layout("bnhd")
    try:
        assert layers._resolve_attn_layout(50) == "bnhd"
    finally:
        layers.set_attn_layout("auto")

    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = 10
    spec = CLIPSpec.vit_b32()
    st = TaskStatic.from_config(cfg, spec, PeftConfig(method="lora"))
    assert st.attn_layout == "auto"
    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.TPU.PARITY_FP32 = True
    st2 = TaskStatic.from_config(cfg2, spec, PeftConfig(method="lora"))
    assert st2.attn_layout == "bnhd"

    # fp32 compute = parity/accuracy context: pinned too (and the bhnd trace
    # is not vmap-stable at float level — see TaskStatic.from_config)
    cfg3 = cfg.clone()
    cfg3.defrost()
    cfg3.TPU.COMPUTE_DTYPE = "float32"
    st3 = TaskStatic.from_config(cfg3, spec, PeftConfig(method="lora"))
    assert st3.attn_layout == "bnhd"
