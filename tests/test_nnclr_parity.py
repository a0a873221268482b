"""Golden parity for the NNCLR memory bank vs the reference's torch modules.

Drives vision_benchmark/models/declip_model/utils/nnclr_modules/
{memory_bank,nn_memory_bank}.py (the lightly-derived modules DeCLIP uses at
declip.py:168-169,276-282) and asserts our functional TPU state machine
(pevit_tpu/models/nnclr.py) matches: snapshot-before-update queries, the
truncating wraparound, un-normalised neighbour payloads, and top-k order.
"""

import importlib
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pevit_tpu.models.nnclr import (
    MemoryBankState,
    init_memory_bank,
    nearest_neighbours,
    nn_replace,
)

torch = pytest.importorskip("torch")

REF_NNCLR = Path(
    "/root/reference/vision_benchmark/models/declip_model/utils/nnclr_modules"
)


def _load_ref(name):
    if not REF_NNCLR.exists():
        pytest.skip("reference tree not available")
    pkg_name = "_ref_nnclr_parity"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [str(REF_NNCLR)]
        sys.modules[pkg_name] = pkg
    return importlib.import_module(f"{pkg_name}.{name}")


SIZE, DIM, TOPK = 16, 8, 3


def _paired_banks(seed=0):
    """A reference module and our state sharing one deterministic bank."""
    nn_mod = _load_ref("nn_memory_bank")
    rng = np.random.default_rng(seed)
    bank_rows = rng.standard_normal((SIZE, DIM)).astype(np.float32)
    bank_rows /= np.linalg.norm(bank_rows, axis=1, keepdims=True)

    ref = nn_mod.NNMemoryBankModule(size=SIZE, topk=TOPK)
    ref._init_memory_bank(DIM)
    with torch.no_grad():
        ref.bank.copy_(torch.from_numpy(bank_rows.T))  # ref stores (dim, size)

    state = MemoryBankState(
        bank=jnp.asarray(bank_rows), ptr=jnp.zeros((), jnp.int32)
    )
    return ref, state, rng


def test_topk_neighbours_match_reference():
    ref, state, rng = _paired_banks()
    x = rng.standard_normal((5, DIM)).astype(np.float32)

    ref_nn = ref(torch.from_numpy(x), update=False)  # list of TOPK (n, dim)
    ours = nearest_neighbours(state, jnp.asarray(x), topk=TOPK)

    assert len(ref_nn) == TOPK and ours.shape == (TOPK, 5, DIM)
    for k in range(TOPK):
        np.testing.assert_allclose(
            np.asarray(ours[k]), ref_nn[k].numpy(), rtol=1e-5, atol=1e-5
        )


def test_enqueue_and_wraparound_match_reference():
    ref, state, rng = _paired_banks(seed=1)
    # three updates of 6 rows against a 16-slot bank: the third crosses the
    # end (ptr 12 + 6 >= 16) and must truncate to 4 rows + reset the pointer.
    for step in range(3):
        x = rng.standard_normal((6, DIM)).astype(np.float32)
        ref(torch.from_numpy(x), update=True)
        _, state = nn_replace(state, jnp.asarray(x), update=True, topk=TOPK)
        np.testing.assert_allclose(
            np.asarray(state.bank), ref.bank.numpy().T, rtol=1e-6, atol=1e-6,
            err_msg=f"bank diverged after update {step}",
        )
        assert int(state.ptr) == int(ref.bank_ptr[0])
    assert int(state.ptr) == 0  # the wrap happened


def test_snapshot_is_pre_update():
    """update=True queries must not see the batch they enqueue."""
    _, state, rng = _paired_banks(seed=2)
    x = rng.standard_normal((4, DIM)).astype(np.float32)
    nn1, state2 = nn_replace(state, jnp.asarray(x), update=True, topk=1)
    # query again WITHOUT update: now the batch IS in the bank and must
    # retrieve itself exactly (cosine similarity 1 with itself).
    nn2, _ = nn_replace(state2, jnp.asarray(x), update=False, topk=1)
    np.testing.assert_allclose(np.asarray(nn2[0]), x, rtol=1e-6, atol=1e-6)
    assert not np.allclose(np.asarray(nn1[0]), x)


def test_enqueue_is_jit_and_scan_safe():
    state = init_memory_bank(jax.random.PRNGKey(0), SIZE, DIM)

    def step(st, batch):
        nn, st = nn_replace(st, batch, update=True, topk=1)
        return st, nn

    batches = jax.random.normal(jax.random.PRNGKey(1), (5, 6, DIM))
    final, nns = jax.jit(lambda s, b: jax.lax.scan(step, s, b))(state, batches)
    assert final.bank.shape == (SIZE, DIM) and nns.shape == (5, 1, 6, DIM)
