"""Pfeiffer-style bottleneck adapter after the MLP.

Reference: vision_benchmark/evaluation/adapter_model.py:204-296 (Adapter
module) and adapter_model.py:330-336 (insertion):

    m   = mlp(ln_2(x))
    out = up(relu(down(ln_a(m)))) + m       # residual inside the adapter
    x   = x + out

down: 768->64, up: 64->768, both N(0, 0.02)/zero-bias BERT init
(adapter_model.py:285-295); LN before, none after.

Quirk note (SURVEY.md §2.4 item 5): the reference evaluates
``self.mlp(self.ln_2(x))`` TWICE per block — once as the adapter input and
once as the adapter's residual argument.  The MLP is deterministic, so both
evaluations are bit-identical; we compute it once.  This halves the MLP FLOPs
with zero numerical difference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.layers import layer_norm

DOWN_SAMPLE = 64  # adapter_model.py:305


def init_params(rng: jax.Array, n_layers: int, width: int) -> dict:
    kd, ku = jax.random.split(rng)
    n = lambda k, *s: 0.02 * jax.random.normal(k, (n_layers, *s), jnp.float32)
    zeros = lambda *s: jnp.zeros((n_layers, *s), jnp.float32)
    ones = lambda *s: jnp.ones((n_layers, *s), jnp.float32)
    return {
        "shared": None,
        "layers": {
            "norm_scale": ones(width),
            "norm_bias": zeros(width),
            "down_kernel": n(kd, width, DOWN_SAMPLE),
            "down_bias": zeros(DOWN_SAMPLE),
            "up_kernel": n(ku, DOWN_SAMPLE, width),
            "up_bias": zeros(width),
        },
    }


def mlp_post(shared, layer: dict, rng: jax.Array, m: jax.Array, *, train: bool = False):
    del shared, rng, train
    dt = m.dtype
    h = layer_norm(m, layer["norm_scale"], layer["norm_bias"])
    h = jax.nn.relu(
        jnp.dot(h, layer["down_kernel"].astype(dt), preferred_element_type=jnp.float32)
        + layer["down_bias"]
    ).astype(dt)
    up = jnp.dot(h, layer["up_kernel"].astype(dt), preferred_element_type=jnp.float32) + layer["up_bias"]
    return up.astype(dt) + m


def num_params(n_layers: int, width: int) -> int:
    per_layer = 2 * width  # adapter LN
    per_layer += width * DOWN_SAMPLE + DOWN_SAMPLE
    per_layer += DOWN_SAMPLE * width + width
    return n_layers * per_layer
