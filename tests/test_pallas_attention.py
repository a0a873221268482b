"""Pallas fused attention vs XLA reference (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pevit_tpu.ops.attention import _fused, _xla_attention


@pytest.mark.parametrize("n", [50, 197])
def test_fused_attention_matches_xla(n):
    rng = np.random.default_rng(0)
    B, H, hd = 2, 3, 64
    q = jnp.asarray(rng.standard_normal((B, H, n, hd)).astype(np.float32) * 0.1)
    k = jnp.asarray(rng.standard_normal((B, H, n, hd)).astype(np.float32) * 0.1)
    v = jnp.asarray(rng.standard_normal((B, H, n, hd)).astype(np.float32))
    want = _xla_attention(q, k, v)
    got = _fused(q, k, v, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_fused_attention_grads_match_xla():
    rng = np.random.default_rng(1)
    B, H, n, hd = 1, 2, 24, 32
    q = jnp.asarray(rng.standard_normal((B, H, n, hd)).astype(np.float32) * 0.2)
    k = jnp.asarray(rng.standard_normal((B, H, n, hd)).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.standard_normal((B, H, n, hd)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(_fused(q, k, v, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
