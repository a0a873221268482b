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
