"""Weight-only int8 quantization for serving artifacts.

The reference has no deployment story (SURVEY.md §2.8); this extends the
framework's own serving layer (pevit_tpu/serve.py).  Symmetric per-channel
int8: every large float weight leaf W is stored as

    {"_q8": int8 round(W / s), "scale": s}     s = amax(|W|, contraction axis) / 127

with the scale computed over axis -2 — the contraction axis of ``x @ W`` —
so each (layer, out-channel) column gets its own scale.  This covers the
repo's parameter-stacked transformer leaves ((L, in, out): per-(L, out)
scales), plain 2-D linears ((in, out): per-out), and embedding tables
((rows, C): per-C).  Dequantization is a trace-time ``int8 -> float * s``
multiply, so XLA fuses it into the consumer GEMM's operand load; the
serialized artifact / weight bundle keeps the int8 constants (~4x smaller
than fp32 — this is what makes a ViT-B baked program fit under
request-size-limited compile services, and what quarters hot-swap weight
pushes in the weights-as-args mode).

Accuracy: weight-only (activations stay in the configured compute dtype),
per-channel symmetric — the standard serving-grade scheme; the end-to-end
logit error bound is exercised in tests/test_quant_serving.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_tree", "dequantize_tree", "is_quantized", "tree_nbytes"]

QUANT_KEY = "_q8"
# below this element count a leaf stays fp32: biases, LN affines, tiny heads
# (quantizing them saves nothing and the scale array overhead bites)
MIN_SIZE = 16384


def _is_qleaf(node) -> bool:
    return isinstance(node, dict) and QUANT_KEY in node


def is_quantized(tree) -> bool:
    found = [False]

    def visit(node):
        if _is_qleaf(node):
            found[0] = True
        return node

    jax.tree.map(visit, tree, is_leaf=_is_qleaf)
    return found[0]


def quantize_tree(tree, *, min_size: int = MIN_SIZE):
    """Quantize every large floating leaf; structure otherwise preserved."""

    def q(leaf):
        leaf = jnp.asarray(leaf)
        if (
            not jnp.issubdtype(leaf.dtype, jnp.floating)
            or leaf.ndim < 2
            or leaf.size < min_size
            or leaf.shape[-2] < 16  # scale overhead would exceed the savings
        ):
            return leaf
        amax = jnp.max(jnp.abs(leaf).astype(jnp.float32), axis=-2, keepdims=True)
        scale = jnp.where(amax > 0, amax, 1.0) / 127.0
        q8 = jnp.clip(jnp.round(leaf.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
        return {QUANT_KEY: q8, "scale": scale.astype(jnp.float32)}

    return jax.tree.map(q, tree)


def dequantize_tree(tree, dtype=None):
    """Trace-time inverse; non-quantized leaves pass through untouched."""

    def d(node):
        if _is_qleaf(node):
            w = node[QUANT_KEY].astype(jnp.float32) * node["scale"]
            return w.astype(dtype) if dtype is not None else w
        return node

    return jax.tree.map(d, tree, is_leaf=_is_qleaf)


def tree_nbytes(tree) -> int:
    return sum(leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(tree))
