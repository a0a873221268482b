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


def _pallas_forward(q, k, v, *, interpret: bool = False, pairs_per_program: int = 8):
    """q, k, v: (B, H, N, hd). Returns (B, H, N, hd).

    Each program handles ``pairs_per_program`` (batch, head) pairs as the
    leading batch dim of batched MXU GEMMs — amortises program launch + DMA
    setup over 8x more work than a per-head grid.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, N, hd = q.shape
    n_sub = _round_up(N, 8)       # query rows: sublane multiple
    n_lane = _round_up(N, 128)    # key columns: lane multiple
    # head_dim stays UNPADDED: a 64-wide lane dim wastes half the VPU lanes
    # but halves DMA traffic vs zero-padding to 128 (measured faster)
    hd_lane = hd if hd % 8 == 0 else _round_up(hd, 8)
    G = pairs_per_program
    bh = B * H
    bh_pad = _round_up(bh, G)

    def prep(t, n_rows):
        t = jnp.pad(t, ((0, 0), (0, 0), (0, n_rows - N), (0, hd_lane - hd)))
        t = t.reshape(bh, n_rows, hd_lane)
        if bh_pad != bh:
            t = jnp.pad(t, ((0, bh_pad - bh), (0, 0), (0, 0)))
        return t

    qp, kp, vp = prep(q, n_sub), prep(k, n_lane), prep(v, n_lane)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        s = jax.lax.dot_general(
            q_ref[...], k_ref[...],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, n_sub, n_lane)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < N, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[...],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = o.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(bh_pad // G,),
        in_specs=[
            pl.BlockSpec((G, n_sub, hd_lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, n_lane, hd_lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, n_lane, hd_lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, n_sub, hd_lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh_pad, n_sub, hd_lane), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh_pad * (n_sub * n_lane * hd_lane) * 2,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh_pad * n_sub * n_lane,
        ),
    )(qp, kp, vp)
    return out[:bh].reshape(B, H, n_sub, hd_lane)[:, :, :N, :hd]


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


def _xla_attention_bnhd(q, k, v):
    """Transpose-free attention core: q, k, v and output are (B, N, H, hd);
    the head axis rides as a dot_general batch dim (no layout copies)."""
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


@jax.custom_vjp
def xla_attention_remat(q, k, v):
    """XLA attention with a flash-style VJP: saves only (q, k, v).

    Under plain autodiff, the scanned-blocks backward stashes the fp32
    softmax probs per layer — at ViT-B/16 batch 64 that is a
    (12, B, 12, 197, 197) fp32 residual, ~1.4 GB of HBM write+read per
    step (profiled: the dominant train-step cost and the reason larger
    batches got SLOWER).  Recomputing the probs in backward costs two
    small bmms and kills the stash.  (B, N, H, hd) layout throughout.
    """
    return _xla_attention_bnhd(q, k, v)


def _xla_remat_fwd(q, k, v):
    return _xla_attention_bnhd(q, k, v), (q, k, v)


def _xla_remat_bwd(res, g):
    q, k, v = res
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhnm,bnhd->bmhd", p, g32).astype(v.dtype)
    dp = jnp.einsum("bnhd,bmhd->bhnm", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bmhd->bnhd", ds, k.astype(jnp.float32)).astype(q.dtype)
    dk = jnp.einsum("bhnm,bnhd->bmhd", ds, q.astype(jnp.float32)).astype(k.dtype)
    return dq, dk, dv


xla_attention_remat.defvjp(_xla_remat_fwd, _xla_remat_bwd)


@jax.custom_vjp
def xla_attention_lean(q, k, v):
    """XLA attention whose VJP saves the probs ONCE, in activation dtype.

    Plain autodiff through the scanned blocks stashes the softmax probs
    TWICE per layer — fp32 (for the softmax grad) AND activation-dtype (the
    PV operand): (12, B, H, N, N) each, 2.1 GB/step at ViT-B/16 batch 64
    (trace-diffed; the dynamic-update-slice stashes scale superlinearly
    with batch and are why bigger batches ran slower).  Saving only the
    bf16 copy and running the softmax grad from it is the standard
    flash-attention backward precision; in fp32 compute the saved copy IS
    fp32, so parity paths are bit-identical to autodiff.
    """
    return _xla_attention_bnhd(q, k, v)


def _lean_fwd(q, k, v):
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", p, v)
    return out, (q, k, v, p)


def _lean_bwd(res, g):
    q, k, v, p = res
    g32 = g.astype(jnp.float32)
    p32 = p.astype(jnp.float32)
    dv = jnp.einsum("bhnm,bnhd->bmhd", p32, g32).astype(v.dtype)
    dp = jnp.einsum("bnhd,bmhd->bhnm", g32, v.astype(jnp.float32))
    ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bmhd->bnhd", ds, k.astype(jnp.float32)).astype(q.dtype)
    dk = jnp.einsum("bhnm,bnhd->bmhd", ds, q.astype(jnp.float32)).astype(k.dtype)
    return dq, dk, dv


xla_attention_lean.defvjp(_lean_fwd, _lean_bwd)


@jax.custom_vjp
def xla_attention_lean_bhnd(q, k, v):
    """Lean-VJP attention on (B, H, N, hd) tensors — adjacent LEADING batch
    dims in every dot_general, so TPU lowering needs no operand relayout
    (the (B, N, H, hd) formulation profiled ~350 ms/dispatch of bf16
    {0,3,2,1}->{3,1,2,0} copies around the attention einsums at ViT-B/32
    batch 128).  Same probs-saved-once backward as xla_attention_lean."""
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def _lean_bhnd_fwd(q, k, v):
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", p, v)
    return out, (q, k, v, p)


def _lean_bhnd_bwd(res, g):
    q, k, v, p = res
    g32 = g.astype(jnp.float32)
    p32 = p.astype(jnp.float32)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p32, g32).astype(v.dtype)
    dp = jnp.einsum("bhnd,bhmd->bhnm", g32, v.astype(jnp.float32))
    ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, k.astype(jnp.float32)).astype(q.dtype)
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, q.astype(jnp.float32)).astype(k.dtype)
    return dq, dk, dv


xla_attention_lean_bhnd.defvjp(_lean_bhnd_fwd, _lean_bhnd_bwd)


def attention_core(
    q, k, v, *, use_pallas: bool = False, remat_probs: bool = False, interpret: bool = False
):
    """Mask-free attention on (B, N, H, hd) tensors (q pre-scaled, PEFT
    deltas already added).  Routes to the Pallas fused kernel where it wins
    (short sequences on TPU), else the plain XLA core.

    ``remat_probs`` swaps in the flash-style recompute VJP.  Measured at
    ViT-B/16 batch 64 it kills the 1.4 GB/step fp32 probs stash but the
    softmax recompute costs MORE than the stash on this chip (726 vs 755
    img/s at batch 32; 605 vs 638 at 64) — HBM is fast relative to the VPU
    here, so it stays opt-in for models/batches where the stash OOMs."""
    N = q.shape[-3]
    if (
        use_pallas
        and N <= PALLAS_MAX_SEQ
        and (jax.default_backend() == "tpu" or interpret)
    ):
        t = lambda x: x.transpose(0, 2, 1, 3)
        return t(_fused(t(q), t(k), t(v), interpret))
    if remat_probs:
        return xla_attention_remat(q, k, v)
    return xla_attention_lean(q, k, v)


# Sequence-length ceiling for routing to the Pallas kernel; measured
# per-shape on-chip (see fused_attention docstring).  Module-level so the
# trainer/bench can re-gate after measuring a new shape regime.
#
# Default 0 = RETIRED from the default route: the kernel's 1.5x win at N=50
# was measured against plain-autodiff XLA, which stashes the softmax probs
# twice (fp32 + bf16) per layer.  With xla_attention_lean (single bf16
# probs stash, no recompute) the XLA path measures 3187 img/s vs the
# kernel's 2794 at ViT-B/32 batch 128 — XLA wins at every ViT shape now.
# The kernel stays for shapes where a (N, N) stash cannot fit at all.
PALLAS_MAX_SEQ = 0


def fused_attention(q, k, v, mask=None, *, interpret: bool = False):
    """Drop-in for the XLA attention core.  q pre-scaled; see module doc.

    Shape policy (measured on-chip): the fused kernel wins for short
    sequences (ViT-B/32's N=50, ~1.5x) where XLA's HBM round trip for the
    attention matrix dominates; at N=197 (ViT-B/16) XLA's own fusion is
    faster for the FORWARD, so the default gate defers to it — but in
    TRAINING the custom-VJP recompute avoids stashing the (B,H,N,N) probs
    per layer, so the trainer may raise PALLAS_MAX_SEQ where measured faster.
    """
    N = q.shape[-2]
    if mask is not None or N > PALLAS_MAX_SEQ or (
        jax.default_backend() != "tpu" and not interpret
    ):
        return _xla_attention(q, k, v, mask=mask)
    return _fused(q, k, v, interpret)
