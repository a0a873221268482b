"""LoRA: rank-4 low-rank q/v updates.

Reference: vision_benchmark/evaluation/lora_model.py:455-514 (parameters +
adapter_forward) and lora_model.py:718-733 (application inside attention).

    delta = (x @ A) @ B * (alpha / r)        # r=4, alpha=128 => scale 32
    A ~ N(0, 0.02), B = 0                    # (lora_model.py:466-475)

Shares the reference's application quirks with KAdaptation: delta computed
from the LN'd block input, added after q's 1/sqrt(hd) scaling, and reshaped
with the raw (N,B,C)->(B*H,N,hd) scramble (lora_model.py:729-733).

The reference's MoE-gating branch (``lora_moe``, lora_model.py:480-512) is
dead code disabled by ``lora_moe=0``; we mirror it as an unimplemented flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LORA_RANK = 4
LORA_ALPHA = 128
SCALE = LORA_ALPHA / LORA_RANK  # = 32
LORA_MOE = 0  # dead feature flag, kept for parity (lora_model.py:462)


def init_params(rng: jax.Array, n_layers: int, width: int) -> dict:
    kq, kv = jax.random.split(rng)
    # kernels stored (in, out); torch stores Linear weight (out, in) and
    # computes x @ W.T — same distribution, same math.
    return {
        "shared": None,
        "layers": {
            "q_a": 0.02 * jax.random.normal(kq, (n_layers, width, LORA_RANK), jnp.float32),
            "q_b": jnp.zeros((n_layers, LORA_RANK, width), jnp.float32),
            "v_a": 0.02 * jax.random.normal(kv, (n_layers, width, LORA_RANK), jnp.float32),
            "v_b": jnp.zeros((n_layers, LORA_RANK, width), jnp.float32),
        },
    }


def attn_delta(
    shared,
    layer: dict,
    rng: jax.Array,
    x: jax.Array,
    *,
    n_head: int,
    train: bool = False,
    reference_compat: bool = True,
):
    del shared, rng, train  # lora_r_dropout is None in the reference (:460)
    B, N, C = x.shape
    hd = C // n_head
    dt = x.dtype
    dq = jnp.dot(
        jnp.dot(x, layer["q_a"].astype(dt), preferred_element_type=jnp.float32).astype(dt),
        layer["q_b"].astype(dt),
        preferred_element_type=jnp.float32,
    ) * SCALE
    dv = jnp.dot(
        jnp.dot(x, layer["v_a"].astype(dt), preferred_element_type=jnp.float32).astype(dt),
        layer["v_b"].astype(dt),
        preferred_element_type=jnp.float32,
    ) * SCALE
    if reference_compat:
        dq = dq.transpose(1, 0, 2).reshape(B, n_head, N, hd)
        dv = dv.transpose(1, 0, 2).reshape(B, n_head, N, hd)
    else:
        dq = dq.reshape(B, N, n_head, hd).transpose(0, 2, 1, 3)
        dv = dv.reshape(B, N, n_head, hd).transpose(0, 2, 1, 3)
    return dq, dv


def num_params(n_layers: int, width: int) -> int:
    return n_layers * 4 * width * LORA_RANK
