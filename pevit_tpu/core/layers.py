"""Core neural-net layers for the TPU-native CLIP implementation.

Pure functions over explicit parameter pytrees (nested dicts of jnp arrays).
Weight convention: every linear kernel is stored ``(in_features, out_features)``
so the hot path is ``x @ W`` (row-major MXU-friendly); torch checkpoints are
transposed once at load time (see pevit_tpu/ckpt/torch_loader.py).

Numerical quirks of the reference that are intentionally preserved:

* LayerNorm always computes statistics in float32 and casts the result back
  to the activation dtype (reference: evaluation/model.py:154-160).
* QuickGELU ``x * sigmoid(1.702 x)`` in CLIP blocks (model.py:163-165),
  distinct from the tanh-approx ``gelu_new`` used inside Compacter adapters
  (compacter_model.py:338-345).
* Softmax over attention logits runs in float32.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp


# When True, LayerNorm statistics compute in the activation dtype instead of
# the reference's fp32 island (model.py:154-160).  Trace-time switch set by
# the trainer from TPU.FAST_LN; bf16 LN stats are a standard TPU trade-off
# and the parity mode (fp32 activations) is unaffected either way.
_FAST_LN = False

# mask-free attention data layout.  "bnhd": head axis rides as a trailing
# dot_general batch dim.  "bhnd": head-major with the head-split/merge folded
# into the projection GEMMs.  The winner depends on sequence length — the
# full-unroll r3 A/B (kadaptation, bf16, interleaved reps) measured bhnd
# +4.5% at B/32 batch 128 (N=50: 3560 -> 3722 img/s; the bnhd head-split
# relayout copies are ~15% of that step) but -1.5% at B/16 batch 16 (N=197:
# 1122 -> 1106, where the relayouts amortize over the longer sequence).
# Pre-unroll r2 measured the OPPOSITE sign at B/32 (-5.6%) — the unrolled
# schedule is what exposes the copies.  "auto" (default) picks bhnd iff
# N <= 64, the measured crossover between N=50 and N=197; parity runs pin
# "bnhd" (trainer), the reference-shaped computation.
_ATTN_LAYOUT = "auto"


def _resolve_attn_layout(n: int) -> str:
    if _ATTN_LAYOUT == "auto":
        return "bhnd" if n <= 64 else "bnhd"
    return _ATTN_LAYOUT


def set_fast_ln(enabled: bool) -> None:
    global _FAST_LN
    _FAST_LN = bool(enabled)


# Fold the ln_2 affine (scale g, bias b) into the frozen c_fc GEMM:
# ln2(x) @ W + c == norm(x) @ (g[:,None]*W) + (b@W + c) — exact algebra,
# removes 2 elementwise ops from the VPU-latency-bound LN fusion the r3
# profile pinned at ~46% of step time.  Trace-time switch (TPU.FOLD_LN2);
# default OFF: rounding differs slightly (n vs y cast to bf16), so parity
# tests keep the reference's LN->GEMM order.
_FOLD_LN2 = False


def set_fold_ln2(enabled: bool) -> None:
    global _FOLD_LN2
    _FOLD_LN2 = bool(enabled)


def set_attn_layout(layout: str) -> None:
    global _ATTN_LAYOUT
    assert layout in ("auto", "bhnd", "bnhd"), layout
    _ATTN_LAYOUT = layout


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """fp32-island LayerNorm (reference model.py:154-160)."""
    if _FAST_LN:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + jnp.asarray(eps, x.dtype))
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


@jax.custom_vjp
def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP activation (reference model.py:163-165).

    Custom VJP saves only ``x`` and recomputes the sigmoid in backward;
    plain autodiff additionally stashes sigmoid(1.702x) per scanned layer —
    a (L, B, N, 4C) tensor (~470 MB/step at B/32 batch 128).  One extra
    elementwise pass beats that stash on-chip (B/32 +0.9%, B/16 +3%)."""
    return x * jax.nn.sigmoid(1.702 * x)


def _quick_gelu_fwd(x):
    return x * jax.nn.sigmoid(1.702 * x), x


def _quick_gelu_bwd(x, g):
    s = jax.nn.sigmoid(1.702 * x)
    return (g * (s + 1.702 * x * s * (1 - s)),)


quick_gelu.defvjp(_quick_gelu_fwd, _quick_gelu_bwd)


def gelu_new(x: jax.Array) -> jax.Array:
    """BERT/GPT tanh-approx GELU used by Compacter adapters
    (reference compacter_model.py:338-345)."""
    return 0.5 * x * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3))))


def linear(x: jax.Array, params: dict) -> jax.Array:
    y = x @ params["kernel"].astype(x.dtype)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(x.dtype)
    return y


def gelu_exact(x: jax.Array) -> jax.Array:
    """erf-based GELU (timm ViT default; used by the auxiliary backbones)."""
    return jax.nn.gelu(x, approximate=False)


def mlp(params: dict, x: jax.Array, act: Callable = None) -> jax.Array:
    """CLIP block MLP: c_fc (C->4C) -> QuickGELU -> c_proj (4C->C).

    The activation output is checkpoint-named: under the "lean" remat mode
    (core.clip._run_blocks) autodiff saves the 4C pre-activation ONCE and
    recomputes the GELU in backward, instead of stashing both the (B,N,4C)
    pre-activation AND the (B,N,4C) activation per scanned layer."""
    h = linear(x, params["c_fc"])
    h = (act or quick_gelu)(h)
    from jax.ad_checkpoint import checkpoint_name

    h = checkpoint_name(h, "mlp_act")
    return linear(h, params["c_proj"])


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

DeltaFn = Callable[[jax.Array], tuple[Optional[jax.Array], Optional[jax.Array]]]


def multi_head_attention(
    params: dict,
    x: jax.Array,
    *,
    n_head: int,
    mask: Optional[jax.Array] = None,
    qv_delta_fn: Optional[DeltaFn] = None,
    use_pallas: bool = False,
) -> jax.Array:
    """Self-attention over ``x`` of shape (B, N, C).

    Faithful to the reference custom MHA forward (model.py:612-834):
    * packed qkv in-projection,
    * q scaled by 1/sqrt(head_dim) BEFORE the PEFT delta is added, so the
      delta is not downscaled (quirk; model.py:786-798),
    * ``qv_delta_fn(x)`` receives the pre-projection hidden states (the LN'd
      block input) and returns per-head (B, H, N, hd) deltas for q and v.
    """
    B, N, C = x.shape
    hd = C // n_head

    if mask is None and _resolve_attn_layout(N) == "bhnd":
        # head-major (B, H, N, hd) path: q/k/v are produced DIRECTLY in the
        # layout the attention dot_generals want — the head-split transpose
        # rides the in-projection GEMM epilogue, and the head-merge rides the
        # out-projection contraction.  All attention einsums carry adjacent
        # LEADING batch dims (b, h), so TPU lowering emits no operand
        # relayout copies (the bnhd formulation profiled ~350 ms/dispatch of
        # bf16 copies at ViT-B/32 batch 128).
        from ..ops.attention import xla_attention_lean_bhnd

        w = params["in_proj"]["kernel"].astype(x.dtype).reshape(C, 3, n_head, hd)
        b = params["in_proj"]["bias"].astype(x.dtype).reshape(3, 1, n_head, 1, hd)
        qkv = jnp.einsum("bnc,cthd->tbhnd", x, w) + b
        q = qkv[0] * (1.0 / math.sqrt(hd))
        k, v = qkv[1], qkv[2]

        if qv_delta_fn is not None:
            q_delta, v_delta = qv_delta_fn(x)  # (B, H, N, hd) native here
            if q_delta is not None:
                q = q + q_delta.astype(q.dtype)
            if v_delta is not None:
                v = v + v_delta.astype(v.dtype)

        out = xla_attention_lean_bhnd(q, k, v)  # (B, H, N, hd)
        wo = params["out_proj"]["kernel"].astype(out.dtype).reshape(n_head, hd, C)
        return jnp.einsum("bhnd,hdc->bnc", out, wo) + params["out_proj"]["bias"].astype(out.dtype)

    qkv = linear(x, params["in_proj"])  # (B, N, 3C)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    # transpose-free (B, N, H, hd) layout: the head axis rides as a dot_general
    # batch dim, so XLA folds layouts into the GEMMs instead of emitting
    # explicit copies (profiled ~10% of epoch time in the transposed layout)
    q = q.reshape(B, N, n_head, hd) * (1.0 / math.sqrt(hd))
    k = k.reshape(B, N, n_head, hd)
    v = v.reshape(B, N, n_head, hd)

    if qv_delta_fn is not None:
        q_delta, v_delta = qv_delta_fn(x)  # (B, H, N, hd) reference-compat layout
        if q_delta is not None:
            q = q + q_delta.transpose(0, 2, 1, 3).astype(q.dtype)
        if v_delta is not None:
            v = v + v_delta.transpose(0, 2, 1, 3).astype(v.dtype)

    if mask is None:
        # mask-free (vision) path: Pallas fused kernel where it wins, else
        # the XLA core with a flash-style recompute VJP — either way the
        # (N, N) probs never survive fwd -> bwd (see ops/attention.py)
        from ..ops.attention import attention_core

        out = attention_core(q, k, v, use_pallas=use_pallas)
    else:
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
        logits = logits + mask.astype(logits.dtype)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", probs, v)

    out = out.reshape(B, N, C)
    return linear(out, params["out_proj"])


def residual_attention_block(
    params: dict,
    x: jax.Array,
    *,
    n_head: int,
    mask: Optional[jax.Array] = None,
    qv_delta_fn: Optional[DeltaFn] = None,
    mlp_post_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    use_pallas: bool = False,
    use_fused_mlp: bool = False,
    act: Optional[Callable] = None,
    ln_eps: float = 1e-5,
) -> jax.Array:
    """One CLIP transformer block (reference model.py:947-975).

    ``ln_eps``: LayerNorm epsilon — 1e-5 for OpenAI CLIP towers
    (model.py:154-160), 1e-12 for clip_swin's TF-style text LayerNorm
    (clip_swin.py:24-39).  Static, so it costs nothing under jit.

    ``mlp_post_fn`` (bottleneck-adapter / Compacter hook) receives the MLP
    output ``m = mlp(ln_2(x))`` and returns what is added to the residual
    stream in its place (reference adapter_model.py:330-336,
    compacter_model.py:497-503 — both compute ``x + f(m)`` where ``f``
    internally re-adds ``m``).

    ``use_fused_mlp`` routes the LN2->c_fc->QuickGELU->c_proj->residual
    chain through the fused Pallas kernel (ops/fused_mlp.py).  Only valid
    when the MLP weights are FROZEN (its VJP is dgrad-only) and no
    ``mlp_post_fn`` hook needs the bare MLP output.
    """
    h = layer_norm(x, params["ln_1"]["scale"], params["ln_1"]["bias"], eps=ln_eps)
    x = x + multi_head_attention(
        params["attn"], h, n_head=n_head, mask=mask, qv_delta_fn=qv_delta_fn,
        use_pallas=use_pallas,
    )
    if use_fused_mlp and mlp_post_fn is None and act is None:
        from ..ops.fused_mlp import fused_mlp_residual

        dt = x.dtype
        # ln scale/bias stay fp32 (the kernel's LN is an fp32 island);
        # GEMM weights/biases cast to the compute dtype like `linear` does
        return fused_mlp_residual(
            x,
            params["ln_2"]["scale"], params["ln_2"]["bias"],
            params["mlp"]["c_fc"]["kernel"].astype(dt), params["mlp"]["c_fc"]["bias"].astype(dt),
            params["mlp"]["c_proj"]["kernel"].astype(dt), params["mlp"]["c_proj"]["bias"].astype(dt),
            jax.default_backend() != "tpu",
        )
    if _FOLD_LN2:
        # params are PRE-FOLDED (core.clip.fold_ln2_params: ln_2 affine lives
        # inside c_fc; ln_2 itself is the identity) — skip the dead affine and
        # feed the bare normalisation to the MLP.  fp32 stats, as layer_norm.
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        n = ((x32 - mean) * jax.lax.rsqrt(var + ln_eps)).astype(x.dtype)
        m = mlp(params["mlp"], n, act=act)
    else:
        m = mlp(params["mlp"], layer_norm(x, params["ln_2"]["scale"], params["ln_2"]["bias"], eps=ln_eps), act=act)
    if mlp_post_fn is not None:
        m = mlp_post_fn(m)
    return x + m


def causal_mask(n: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask (reference model.py:1139-1145)."""
    return jnp.triu(jnp.full((n, n), float("-inf"), dtype=dtype), k=1)
