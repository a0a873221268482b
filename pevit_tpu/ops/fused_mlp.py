"""Fused residual-MLP Pallas kernel: x + c_proj(QuickGELU(c_fc(LN(x)))).

Motivation (r3 roofline, scripts/roofline.py): the B/32 training program
achieves ~100 GB/s of the chip's 819 (12% of the HBM roofline) at low
MFU — it is bound by op granularity and inter-fusion HBM round-trips, not
by bandwidth or FLOPs.  The MLP half of each block is the largest such
chain (LN fusion -> c_fc GEMM -> GELU -> c_proj GEMM -> residual add, plus
the (B, N, 4C) pre-activation stash for backward — ~39 MB/layer/step at
B/32:128).  This kernel runs the whole chain inside VMEM per row-tile:

* ONE read of x and ONE write of y per tile; no intermediate touches HBM,
* weights (c_fc + c_proj, ~9.4 MB bf16 at ViT-B) stay VMEM-resident across
  the row grid (constant index_map -> fetched once per pallas_call),
* LayerNorm statistics in fp32 (the reference's fp32 island,
  model.py:154-160); GEMMs accumulate fp32 on the MXU,
* the backward is a custom-VJP Pallas kernel that RECOMPUTES the forward
  chain from x (flash-style) and produces the ACTIVATION gradient only —
  nothing is stashed between forward and backward except x itself, which
  the residual stream already keeps.

FROZEN-WEIGHT SEMANTICS (read before routing new methods here): the VJP
returns symbolic zeros for ln scale/bias, c_fc and c_proj — correct only
when those weights are frozen (true for every PEFT method; the trainer
gate in TaskStatic.from_config excludes full_finetune).  Differentiating
this op w.r.t. the weights silently yields 0.

MEASURED OUTCOME (r3 A/B on v5e, kadaptation B/32 batch 128 bf16, 8-epoch
whole-run bench, unfused baseline 3220 img/s): this recompute bwd loses —
3024 img/s at 64-row bwd tiles, 3066 at 256-row tiles under a raised 64 MB
VMEM limit.  A stash-based variant (fwd additionally emits h, bwd reads it
instead of recomputing — FLOP-neutral with XLA's dgrad) measured 2864,
worse still: the explicit (rows, F) stash traffic serialized against the
kernel costs more than the recompute GEMM.  Conclusion: XLA's overlapped
small fusions beat a monolithic VMEM-resident kernel at ViT-B MLP shapes
on this backend; TPU.FUSED_MLP stays default-OFF (opt-in for A/B on other
backends/shapes).  See ARCHITECTURE.md perf notes.

Runs in interpret mode off-TPU (tests exercise the kernel on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LN_EPS = 1e-5
_TILE_ROWS = 256
# the bwd kernel holds ~3 fp32 (rows, F) intermediates next to the 9.4 MB of
# weights; scoped-VMEM measured on v5e: 256 rows 20.1 MB, 128 rows 16.77 MB
# vs the 16 MB DEFAULT limit — raised to 64 MB via CompilerParams (v5e has
# 128 MB physical VMEM), keeping the larger, MXU-friendlier tiles
# (256-row bwd measured 3066 vs 3024 img/s at 64-row)
_TILE_ROWS_BWD = 256
_VMEM_LIMIT = 64 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pallas_fwd(x2d, ln_scale, ln_bias, wfc, bfc, wproj, bproj, *, tile_rows, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = x2d.shape
    F = wfc.shape[1]
    Rp = _round_up(R, tile_rows)
    if Rp != R:
        x2d = jnp.pad(x2d, ((0, Rp - R), (0, 0)))

    def kernel(x_ref, s_ref, b_ref, wfc_ref, bfc_ref, wp_ref, bp_ref, o_ref):
        x = x_ref[...]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        xhat = (x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)
        u = (
            xhat * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
        ).astype(x.dtype)
        # elementwise chain in fp32 (VPU-native; Mosaic rejects mixed f32
        # scalar broadcasts into bf16 vectors), bf16 only at GEMM operands
        h = jax.lax.dot_general(
            u, wfc_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc_ref[...].astype(jnp.float32)
        g = (h * jax.nn.sigmoid(1.702 * h)).astype(x.dtype)  # QuickGELU (model.py:163-165)
        m = jax.lax.dot_general(
            g, wp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bp_ref[...].astype(jnp.float32)
        o_ref[...] = x + m.astype(x.dtype)

    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(Rp // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            vec(C), vec(C),
            pl.BlockSpec((C, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(F),
            pl.BlockSpec((F, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(C),
        ],
        out_specs=pl.BlockSpec((tile_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, C), x2d.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * C * F * 2,
            bytes_accessed=(2 * Rp * C + 2 * C * F) * x2d.dtype.itemsize,
            transcendentals=Rp * F,
        ),
    )(
        x2d, ln_scale.reshape(1, C), ln_bias.reshape(1, C),
        wfc, bfc.reshape(1, F), wproj, bproj.reshape(1, C),
    )
    return out[:R]


def _pallas_bwd(dy2d, x2d, ln_scale, ln_bias, wfc, bfc, wproj, *, tile_rows, interpret):
    """Activation gradient of y = x + c_proj(qgelu(c_fc(LN(x)))) w.r.t. x,
    recomputing the whole forward chain from x inside the kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = x2d.shape
    F = wfc.shape[1]
    Rp = _round_up(R, tile_rows)
    if Rp != R:
        x2d = jnp.pad(x2d, ((0, Rp - R), (0, 0)))
        dy2d = jnp.pad(dy2d, ((0, Rp - R), (0, 0)))

    def kernel(dy_ref, x_ref, s_ref, b_ref, wfc_ref, bfc_ref, wp_ref, o_ref):
        dy = dy_ref[...]
        x32 = x_ref[...].astype(jnp.float32)
        scale = s_ref[...].astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + _LN_EPS)
        xhat = (x32 - mean) * rstd
        u = (xhat * scale + b_ref[...].astype(jnp.float32)).astype(dy.dtype)
        # recompute h as the forward did (elementwise in fp32 — see fwd note)
        h = jax.lax.dot_general(
            u, wfc_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc_ref[...].astype(jnp.float32)
        sig = jax.nn.sigmoid(1.702 * h)
        dgelu = sig * (1.0 + 1.702 * h * (1.0 - sig))  # d/dh [h*sigmoid(1.702h)]
        # dgrad chain: dy -> dg -> dh -> du (contract the WIDE axes)
        dg = jax.lax.dot_general(
            dy, wp_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows, F) fp32
        dh = (dg * dgelu).astype(dy.dtype)
        du = jax.lax.dot_general(
            dh, wfc_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows, C) fp32
        # LayerNorm backward (fp32 island)
        dxhat = du * scale
        mdx = jnp.mean(dxhat, axis=-1, keepdims=True)
        mdxx = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx_ln = (dxhat - mdx - xhat * mdxx) * rstd
        o_ref[...] = dx_ln.astype(dy.dtype) + dy

    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(Rp // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            vec(C), vec(C),
            pl.BlockSpec((C, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(F),
            pl.BlockSpec((F, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, C), dy2d.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * C * F * 4,
            bytes_accessed=(3 * Rp * C + 2 * C * F) * dy2d.dtype.itemsize,
            transcendentals=2 * Rp * F,
        ),
    )(
        dy2d, x2d, ln_scale.reshape(1, C), ln_bias.reshape(1, C),
        wfc, bfc.reshape(1, F), wproj,
    )
    return out[:R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_mlp_residual(x, ln_scale, ln_bias, wfc, bfc, wproj, bproj, interpret=False):
    """x: (B, N, C) -> x + c_proj(QuickGELU(c_fc(LayerNorm(x)))).

    Weight arguments must be FROZEN: the VJP yields activation gradients
    only (zeros for every weight — see module docstring)."""
    B, N, C = x.shape
    y = _pallas_fwd(
        x.reshape(B * N, C), ln_scale, ln_bias, wfc, bfc, wproj, bproj,
        tile_rows=_TILE_ROWS, interpret=interpret,
    )
    return y.reshape(B, N, C)


def _fused_fwd(x, ln_scale, ln_bias, wfc, bfc, wproj, bproj, interpret):
    y = fused_mlp_residual(x, ln_scale, ln_bias, wfc, bfc, wproj, bproj, interpret)
    return y, (x, ln_scale, ln_bias, wfc, bfc, wproj)


def _fused_bwd(interpret, res, dy):
    x, ln_scale, ln_bias, wfc, bfc, wproj = res
    B, N, C = x.shape
    dx = _pallas_bwd(
        dy.reshape(B * N, C), x.reshape(B * N, C), ln_scale, ln_bias, wfc, bfc,
        wproj, tile_rows=_TILE_ROWS_BWD, interpret=interpret,
    ).reshape(B, N, C)
    zeros = lambda a: jnp.zeros_like(a)
    # frozen-weight cotangents: symbolic zeros, DCE'd by XLA because the
    # trainable partition never requests them
    return (dx, zeros(ln_scale), zeros(ln_bias), zeros(wfc), zeros(bfc),
            zeros(wproj), jnp.zeros((wproj.shape[1],), wproj.dtype))


fused_mlp_residual.defvjp(_fused_fwd, _fused_bwd)
