"""Compacter: PHM (parameterized-hypercomplex-multiplication) adapters.

Reference: vision_benchmark/evaluation/compacter_model.py:196-308 (PHMLinear),
:356-448 (HyperComplexAdapter), :497-524 (insertion + shared phm_rule).

    m    = mlp(ln_2(x))
    h    = ln_a(m)
    h    = phm_down(h)           # PHMLinear 768 -> 64
    h    = gelu_new(h)           # tanh-approx GELU, NOT QuickGELU (:338-345)
    out  = phm_up(h) + m         # PHMLinear 64 -> 768, residual inside
    x    = x + out

PHMLinear (phm_dim P=4, rank 1, factorised):
    W = bmm(W_left, W_right)                 # (P, in/P, out/P)
    H = sum_p kron(phm_rule[p], W[p])        # (in, out)
    y = x @ H + b

phm_rule is a single (4,4,4) tensor SHARED across all layers and both
up/down projections, init U(-1, 1) (compacter_model.py:512-514).  W factors
use glorot-uniform with gain sqrt(2) applied per axis-slice
(compacter_model.py:262-266 -> model.py glorot_uniform), biases zero.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.layers import gelu_new, layer_norm
from .kron import batched_kron_sum, bmm

PHM_DIM = 4
PHM_RANK = 1
DOWN_SAMPLE = 64  # compacter_model.py:472


def _glorot_uniform_sliced(key: jax.Array, shape: tuple, gain: float = math.sqrt(2.0)):
    """torch xavier_uniform_(gain=sqrt(2)) applied to each (a, b) slice of a
    stacked (..., P, a, b) tensor; torch fan_in = b, fan_out = a."""
    a, b = shape[-2], shape[-1]
    bound = gain * math.sqrt(6.0 / (a + b))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_params(rng: jax.Array, n_layers: int, width: int) -> dict:
    k_rule, k1, k2, k3, k4 = jax.random.split(rng, 5)
    d_in, d_down = width // PHM_DIM, DOWN_SAMPLE // PHM_DIM
    zeros = lambda *s: jnp.zeros((n_layers, *s), jnp.float32)
    ones = lambda *s: jnp.ones((n_layers, *s), jnp.float32)
    return {
        "shared": {
            "phm_rule": jax.random.uniform(k_rule, (PHM_DIM, PHM_DIM, PHM_DIM), jnp.float32, -1.0, 1.0),
        },
        "layers": {
            "norm_scale": ones(width),
            "norm_bias": zeros(width),
            "down_w_left": _glorot_uniform_sliced(k1, (n_layers, PHM_DIM, d_in, PHM_RANK)),
            "down_w_right": _glorot_uniform_sliced(k2, (n_layers, PHM_DIM, PHM_RANK, d_down)),
            "down_b": zeros(DOWN_SAMPLE),
            "up_w_left": _glorot_uniform_sliced(k3, (n_layers, PHM_DIM, d_down, PHM_RANK)),
            "up_w_right": _glorot_uniform_sliced(k4, (n_layers, PHM_DIM, PHM_RANK, d_in)),
            "up_b": zeros(width),
        },
    }


def phm_linear(x: jax.Array, w_left: jax.Array, w_right: jax.Array, rule: jax.Array, b: jax.Array):
    """PHMLinear forward (compacter_model.py:302-308).

    H assembles in fp32 (tiny); the token GEMM runs in the activation dtype
    with fp32 accumulation.
    """
    w = bmm(w_left, w_right)
    h = batched_kron_sum(rule, w)
    y = jnp.dot(x, h.astype(x.dtype), preferred_element_type=jnp.float32)
    return y + b.astype(jnp.float32)


def mlp_post(shared: dict, layer: dict, rng: jax.Array, m: jax.Array, *, train: bool = False):
    del rng, train
    dt = m.dtype
    rule = shared["phm_rule"]
    h = layer_norm(m, layer["norm_scale"], layer["norm_bias"])
    h = phm_linear(h, layer["down_w_left"], layer["down_w_right"], rule, layer["down_b"])
    h = gelu_new(h).astype(dt)
    h = phm_linear(h, layer["up_w_left"], layer["up_w_right"], rule, layer["up_b"])
    return h.astype(dt) + m


def num_params(n_layers: int, width: int) -> int:
    d_in, d_down = width // PHM_DIM, DOWN_SAMPLE // PHM_DIM
    per_layer = 2 * width  # adapter LN
    per_layer += PHM_DIM * (d_in * PHM_RANK + PHM_RANK * d_down) + DOWN_SAMPLE  # down
    per_layer += PHM_DIM * (d_down * PHM_RANK + PHM_RANK * d_in) + width  # up
    shared = PHM_DIM ** 3
    return n_layers * per_layer + shared
