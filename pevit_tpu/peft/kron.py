"""Batched Kronecker-product math shared by KAdaptation and Compacter.

Reference: ``kronecker_product_einsum_batched`` at
vision_benchmark/evaluation/model.py:406-417 (and the identical copy at
compacter_model.py).  On TPU we keep the sum-of-Kroneckers as a single einsum
feeding one reshape — XLA fuses it into the consuming GEMM.
"""

from __future__ import annotations

import jax.numpy as jnp


def batched_kron_sum(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """sum_p kron(a[p], b[p]).

    a: (P, i, j), b: (P, k, l) -> (i*k, j*l) with
    H[i*K + k, j*L + l] = sum_p a[p, i, j] * b[p, k, l].
    """
    P, I, J = a.shape
    _, K, L = b.shape
    h = jnp.einsum("pij,pkl->ikjl", a, b)
    return h.reshape(I * K, J * L)


def bmm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched matmul (torch.bmm parity): (P, m, r) @ (P, r, n) -> (P, m, n)."""
    return jnp.einsum("pmr,prn->pmn", a, b)
