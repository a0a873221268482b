"""KAdaptation: Kronecker-factored delta-W on attention q/v.

The paper's method ("Parameter-efficient Model Adaptation for Vision
Transformers", AAAI 2023).  Reference implementation:
vision_benchmark/evaluation/model.py:406-584 (adapter math) and
model.py:786-799 (application inside attention), model.py:983-1009
(shared phm_rule ownership at the Transformer level).

Math (per visual layer, width C=768, phm_dim P=32, per-axis dim D=C/P=24,
rank 1):

    Wq       = bmm(q_left, q_right)                    # (P, D, D), rank-1
    rule_q   = bmm(rule1_left, rule1_right)            # (P, P, P’=P), rank-1, SHARED across layers
    H_q      = sum_p kron(rule_q[p], Wq[p])            # (C, C)
    H_q      = dropout(H_q, 0.5)                       # dropout on the WEIGHT matrix (train only)
    delta_q  = x @ H_q * scale + b                     # scale = 128/4*5 = 160
    q       += scramble(delta_q)                       # raw (N,B,C)->(B*H,N,hd) reshape

Reference-compat quirks preserved behind ``reference_compat=True`` (all are
accuracy-relevant at the ±0.3pt parity bar — see SURVEY.md §2.4):

1. The v-delta REUSES ``Wq`` (model.py:577-580 passes Wq, not Wv, into the
   kron for the 'v' branch); the v_left/v_right parameters exist and are
   "trained" but unused.  Only rule2 differentiates v from q.
2. q/v factors are ZERO-initialised (model.py:533-539 "glorot-uniform"
   branch zeroes the factorised weights) => the delta starts at exactly 0.
3. Deltas are computed from the pre-projection LN'd block input and added
   AFTER q is scaled by 1/sqrt(head_dim) (model.py:786-798).
4. The (N,B,C)->(B*heads,N,head_dim) delta reshape does NOT match q's
   head-split layout — tokens/batch/head axes are scrambled (model.py:796).
5. Dropout(p=0.5) is applied to H itself, independently for q and v
   (model.py:516,582).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .kron import batched_kron_sum, bmm

PHM_DIM = 32
PHM_RANK = 1
LORA_ATTN_DIM = 4
LORA_ATTN_ALPHA = 128
SCALE = LORA_ATTN_ALPHA / LORA_ATTN_DIM * 5  # = 160 (model.py:564)
KDROPOUT_P = 0.5

# Concatenated delta GEMM (r4 VERDICT Next #6): issue x @ [H_q | H_v] as ONE
# (C, 2C) MXU trip instead of two (C, C) GEMMs per layer.  Exact algebra —
# each output column is the same dot product either way; the scramble applies
# to the output slices.  Toggled by TPU.KADAPT_CONCAT_DELTA via
# set_concat_delta (trainer/bench plumb it like SCAN_UNROLL).
# MEASURED r5 (interleaved 3-rep A/B, B/32 batch 128): -1.71% (3814.7 ->
# 3749.5 img/s median) — the (C,C) GEMMs already tile fine; the concat
# materialisation costs more than the saved dispatch.  Stays default-off
# (ARCHITECTURE.md dead-end ledger).
_CONCAT_DELTA = False


def set_concat_delta(on: bool) -> None:
    global _CONCAT_DELTA
    _CONCAT_DELTA = bool(on)


def init_params(rng: jax.Array, n_layers: int, width: int) -> dict:
    """Parameter tree: shared phm rules + stacked per-layer factors."""
    d = width // PHM_DIM
    ks = jax.random.split(rng, 4)

    def u(key, shape, lo, hi):
        return jax.random.uniform(key, shape, jnp.float32, lo, hi)

    zeros = lambda *s: jnp.zeros(s, jnp.float32)
    return {
        "shared": {
            # U(-0.01, 0.01) init (model.py:987-999)
            "phm_rule1_left": u(ks[0], (PHM_DIM, PHM_DIM, 1), -0.01, 0.01),
            "phm_rule1_right": u(ks[1], (PHM_DIM, 1, PHM_DIM), -0.01, 0.01),
            "phm_rule2_left": u(ks[2], (PHM_DIM, PHM_DIM, 1), -0.01, 0.01),
            "phm_rule2_right": u(ks[3], (PHM_DIM, 1, PHM_DIM), -0.01, 0.01),
        },
        "layers": {
            # zero-init (quirk #2; model.py:533-539)
            "q_left": zeros(n_layers, PHM_DIM, d, PHM_RANK),
            "q_right": zeros(n_layers, PHM_DIM, PHM_RANK, d),
            "v_left": zeros(n_layers, PHM_DIM, d, PHM_RANK),
            "v_right": zeros(n_layers, PHM_DIM, PHM_RANK, d),
            "b": zeros(n_layers, width),
        },
    }


def delta_weights(shared: dict, layer: dict, *, reference_compat: bool = True):
    """Build the (C, C) H_q / H_v delta-weight matrices for one layer."""
    rule1 = bmm(shared["phm_rule1_left"], shared["phm_rule1_right"])
    rule2 = bmm(shared["phm_rule2_left"], shared["phm_rule2_right"])
    wq = bmm(layer["q_left"], layer["q_right"])
    h_q = batched_kron_sum(rule1, wq)
    if reference_compat:
        h_v = batched_kron_sum(rule2, wq)  # quirk #1: Wq reused for v
    else:
        wv = bmm(layer["v_left"], layer["v_right"])
        h_v = batched_kron_sum(rule2, wv)
    return h_q, h_v


def attn_delta(
    shared: dict,
    layer: dict,
    rng: jax.Array,
    x: jax.Array,
    *,
    n_head: int,
    train: bool = False,
    reference_compat: bool = True,
    dropout_p: float = KDROPOUT_P,
):
    """Compute (q_delta, v_delta) in (B, H, N, hd) layout for (B, N, C) x.

    ``dropout_p`` overrides the reference's Dropout(0.5) on H (model.py:516)
    — parity tests force 0 to make the training trajectory deterministic."""
    B, N, C = x.shape
    hd = C // n_head
    h_q, h_v = delta_weights(shared, layer, reference_compat=reference_compat)

    if train and dropout_p > 0:
        kq, kv = jax.random.split(rng)
        keep = 1.0 - dropout_p
        h_q = h_q * jax.random.bernoulli(kq, keep, h_q.shape) / keep
        h_v = h_v * jax.random.bernoulli(kv, keep, h_v.shape) / keep

    # H builds in fp32 (tiny); the token-dimension GEMM runs in the activation
    # dtype (bf16 on TPU) with fp32 accumulation — standard mixed precision.
    b = layer["b"].astype(jnp.float32)
    if _CONCAT_DELTA:
        h_cat = jnp.concatenate([h_q, h_v], axis=1).astype(x.dtype)  # (C, 2C)
        d = jnp.dot(x, h_cat, preferred_element_type=jnp.float32) * SCALE
        dq, dv = d[..., :C] + b, d[..., C:] + b
    else:
        dq = jnp.dot(x, h_q.astype(x.dtype), preferred_element_type=jnp.float32) * SCALE + b
        dv = jnp.dot(x, h_v.astype(x.dtype), preferred_element_type=jnp.float32) * SCALE + b

    if reference_compat:
        # quirk #4: reference computes in (N, B, C) and raw-reshapes to
        # (B*H, N, hd); replicate the exact element mapping.
        dq = dq.transpose(1, 0, 2).reshape(B, n_head, N, hd)
        dv = dv.transpose(1, 0, 2).reshape(B, n_head, N, hd)
    else:
        dq = dq.reshape(B, N, n_head, hd).transpose(0, 2, 1, 3)
        dv = dv.reshape(B, N, n_head, hd).transpose(0, 2, 1, 3)
    return dq, dv


def num_params(n_layers: int, width: int) -> int:
    d = width // PHM_DIM
    per_layer = 4 * PHM_DIM * d * PHM_RANK + width
    shared = 4 * PHM_DIM * PHM_DIM
    return n_layers * per_layer + shared
