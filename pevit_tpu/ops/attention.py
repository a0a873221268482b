"""Fused attention Pallas kernel for the ViT towers.

The reference materialises the full (B*H, N, N) attention matrix in HBM via
two bmms + a softmax (model.py:803-812).  Here the whole
``softmax(q @ k^T) @ v`` computes inside VMEM per (batch, head) program —
the probability matrix never touches HBM.  ViT sequence lengths are tiny
(50 for /32, 197 for /16; SURVEY.md §5.7), so one program comfortably holds
a head's q/k/v and the (N, N) logits in VMEM; queries/keys are padded to
sublane/lane tiles and padded keys are masked to -inf inside the kernel.

Semantics contract (must match core/layers.multi_head_attention): q arrives
ALREADY scaled by 1/sqrt(hd) (and with any PEFT delta added); softmax runs in
fp32.  The backward pass is a custom VJP that recomputes probabilities
(flash-style rematerialisation) in plain XLA — no (N, N) tensor is saved
between forward and backward.

Falls back to pure-XLA math off-TPU and for masked (text/causal) attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, mask=None):
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", probs, v)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pallas_forward(q, k, v, *, interpret: bool = False):
    """q, k, v: (B, H, N, hd). Returns (B, H, N, hd)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, N, hd = q.shape
    n_sub = _round_up(N, 8)       # query rows: sublane multiple
    n_lane = _round_up(N, 128)    # key columns: lane multiple
    hd_lane = _round_up(hd, 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, n_sub - N), (0, hd_lane - hd)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, n_lane - N), (0, hd_lane - hd)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, n_lane - N), (0, hd_lane - hd)))
    g = B * H
    qp = qp.reshape(g, n_sub, hd_lane)
    kp = kp.reshape(g, n_lane, hd_lane)
    vp = vp.reshape(g, n_lane, hd_lane)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qb = q_ref[0]
        kb = k_ref[0]
        vb = v_ref[0]
        s = jax.lax.dot_general(
            qb, kb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_sub, n_lane)
        # mask padded key columns
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < N, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vb.dtype), vb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = o.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, n_sub, hd_lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lane, hd_lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lane, hd_lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_sub, hd_lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n_sub, hd_lane), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * g * (n_sub * n_lane * hd_lane) * 2,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=g * n_sub * n_lane,
        ),
    )(qp, kp, vp)
    return out.reshape(B, H, n_sub, hd_lane)[:, :, :N, :hd]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused(q, k, v, interpret):
    return _pallas_forward(q, k, v, interpret=interpret)


def _fused_fwd(q, k, v, interpret):
    return _pallas_forward(q, k, v, interpret=interpret), (q, k, v)


def _fused_bwd(interpret, res, g):
    # flash-style recompute backward in XLA (no (N,N) saved across the pass)
    q, k, v = res
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, g32).astype(v.dtype)
    dp = jnp.einsum("bhnd,bhmd->bhnm", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, k.astype(jnp.float32)).astype(q.dtype)
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, q.astype(jnp.float32)).astype(k.dtype)
    return dq, dk, dv


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_attention(q, k, v, mask=None, *, interpret: bool = False):
    """Drop-in for the XLA attention core.  q pre-scaled; see module doc."""
    if mask is not None or (jax.default_backend() != "tpu" and not interpret):
        return _xla_attention(q, k, v, mask=mask)
    return _fused(q, k, v, interpret)
