"""Driver-contract regression: entry() compiles, dryrun_multichip runs."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import __graft_entry__ as graft  # noqa: E402


@pytest.mark.slow
def test_entry_lowers_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 10)


@pytest.mark.slow
def test_dryrun_multichip_small_mesh():
    graft.dryrun_multichip(2)  # (1 data x 2 model) mesh on virtual devices
