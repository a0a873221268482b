"""TPU-native NNCLR nearest-neighbour memory bank (DeCLIP pretraining aid).

Functional re-design of the reference's lightly-derived modules
(vision_benchmark/models/declip_model/utils/nnclr_modules/memory_bank.py:9-124,
nn_memory_bank.py:10-65; memory_bank_cuda.py is the same module pinned to a
CUDA device).  DeCLIP instantiates one bank per modality and swaps each
feature for its bank nearest-neighbour during pretraining
(declip_model/declip.py:168-169,276-282).

The torch module mutates an un-checkpointed ``(dim, size)`` buffer in place.
Here the bank is explicit state threaded through the step — a
``MemoryBankState`` pytree that lives happily inside ``jit``/``scan`` and can
be sharded over a mesh like any other array.  We store the bank row-major
``(size, dim)`` (each row one key): queries become one ``(n, dim) @ (dim,
size)`` MXU matmul and enqueues one scatter along the leading axis, instead of
the reference's column writes.

Quirks kept bit-faithful (memory_bank.py:70-87):
  * the queried snapshot is taken BEFORE the enqueue, so a batch never
    matches itself (memory_bank.py:118-122);
  * wraparound truncates: if ``ptr + batch >= size`` only the first
    ``size - ptr`` rows are written and the pointer resets to 0 — the tail
    of the batch is DISCARDED, not wrapped (memory_bank.py:82-84);
  * neighbours are returned un-normalised even though similarity is
    computed on normalised vectors (nn_memory_bank.py:56-63).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "MemoryBankState",
    "init_memory_bank",
    "enqueue",
    "nearest_neighbours",
    "nn_replace",
]


class MemoryBankState(NamedTuple):
    """Ring-buffer bank of unit-norm keys.  ``bank``: (size, dim) f32."""

    bank: jax.Array
    ptr: jax.Array  # () int32, next write position


def init_memory_bank(rng: jax.Array, size: int, dim: int) -> MemoryBankState:
    """Random unit-norm init (memory_bank.py:66-68 normalises each stored key)."""
    if size <= 0:
        raise ValueError(f"Illegal memory bank size {size}, must be positive.")
    bank = jax.random.normal(rng, (size, dim), jnp.float32)
    bank = bank / jnp.maximum(jnp.linalg.norm(bank, axis=1, keepdims=True), 1e-12)
    return MemoryBankState(bank=bank, ptr=jnp.zeros((), jnp.int32))


def enqueue(state: MemoryBankState, batch: jax.Array) -> MemoryBankState:
    """Dequeue-oldest/enqueue-latest with the reference's truncating wrap.

    memory_bank.py:71-87: rows land at ``ptr + i``; any row past the end of
    the bank is dropped (scatter mode="drop"), and the pointer resets to 0
    whenever the batch reaches the end.
    """
    n = batch.shape[0]
    size = state.bank.shape[0]
    idx = state.ptr + jnp.arange(n, dtype=jnp.int32)
    bank = state.bank.at[idx].set(
        jax.lax.stop_gradient(batch).astype(state.bank.dtype), mode="drop"
    )
    wrapped = state.ptr + n >= size
    new_ptr = jnp.where(wrapped, 0, state.ptr + n).astype(jnp.int32)
    return MemoryBankState(bank=bank, ptr=new_ptr)


def nearest_neighbours(
    state: MemoryBankState, output: jax.Array, *, topk: int = 1
) -> jax.Array:
    """Top-k bank neighbours by cosine similarity.

    nn_memory_bank.py:53-65 — similarity on L2-normalised vectors, gather of
    the UN-normalised keys.  Returns ``(topk, n, dim)`` (the reference
    returns a python list of k ``(n, dim)`` tensors).
    """
    out_n = output / jnp.maximum(
        jnp.linalg.norm(output, axis=1, keepdims=True), 1e-12
    )
    bank_n = state.bank / jnp.maximum(
        jnp.linalg.norm(state.bank, axis=1, keepdims=True), 1e-12
    )
    sims = out_n @ bank_n.T  # (n, size) — one MXU matmul
    _, idx = jax.lax.top_k(sims, topk)  # (n, topk)
    return jnp.transpose(state.bank[idx], (1, 0, 2))  # (topk, n, dim)


def nn_replace(
    state: MemoryBankState, output: jax.Array, *, update: bool, topk: int = 1
) -> tuple[jax.Array, MemoryBankState]:
    """One DeCLIP-style call: query the pre-update snapshot, then enqueue.

    Mirrors NNMemoryBankModule.forward(output, update=...) — the snapshot is
    taken before the enqueue so the batch never retrieves itself
    (memory_bank.py:117-122).  ``update`` is a Python bool (trace-time
    static), matching the reference call sites declip.py:276-282.
    """
    nn = nearest_neighbours(state, output, topk=topk)
    if update:
        state = enqueue(state, output)
    return nn, state
