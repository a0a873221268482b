"""tools/serve_bench.py: the serving A/B harness itself.

Runs the fresh-export mode on a tiny CPU config and checks that (a) every
arm produces a positive throughput for every rep and (b) the tool's own
cross-arm logits equality gate passes (a mismatch raises SystemExit inside
``main``).  The on-chip numbers live in ARCHITECTURE.md; this test keeps
the measurement harness honest on CPU.
"""

import importlib.util
from pathlib import Path

import pytest

from tests.test_cli_e2e import _write_cfgs

REPO = Path(__file__).resolve().parents[1]


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "serve_bench", REPO / "tools" / "serve_bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_serve_bench_arms_agree_and_report(tmp_path):
    ds, model = _write_cfgs(tmp_path)
    tool = _load_tool()
    results = tool.main([
        "--model", model, "--ds", ds, "--batch", "8", "--images", "32",
        "--reps", "2", "--depths", "2",
        "TRAIN.IMAGE_SIZE", "[32,32]", "TEST.IMAGE_SIZE", "[32,32]",
        "TPU.COMPUTE_DTYPE", "float32", "TPU.USE_PALLAS_ATTENTION", "False",
    ])
    assert set(results) == {"naive", "pipe2"}
    for arm, rates in results.items():
        assert len(rates) == 2, arm
        assert all(r > 0 for r in rates), (arm, rates)


@pytest.mark.slow
def test_serve_bench_request_mix_pad_policy_ab(tmp_path, capsys):
    """--request-sizes adds the ragged-mix arms; bucket and exact policies
    both route rows correctly (the fp32 ViT-B tower used here is
    composition-insensitive, so the policies' logits agree bit-for-bit and
    the tool prints a zero numerics delta)."""
    ds, model = _write_cfgs(tmp_path)
    tool = _load_tool()
    results = tool.main([
        "--model", model, "--ds", ds, "--batch", "8", "--images", "32",
        "--reps", "1", "--depths", "2", "--request-sizes", "5,3,8",
        "TRAIN.IMAGE_SIZE", "[32,32]", "TEST.IMAGE_SIZE", "[32,32]",
        "TPU.COMPUTE_DTYPE", "float32", "TPU.USE_PALLAS_ATTENTION", "False",
    ])
    assert set(results) == {"naive", "pipe2", "mix-bucket", "mix-exact"}
    for arm in ("mix-bucket", "mix-exact"):
        assert all(r > 0 for r in results[arm]), (arm, results[arm])
    head = capsys.readouterr().out
    assert "pad-policy numerics: max|bucket - exact| = 0.000000" in head


@pytest.mark.slow
def test_serve_bench_daemon_arm(tmp_path):
    """--clients adds the end-to-end HTTP daemon arm (MicroBatcher over
    real sockets) and its logits agree with the direct arms."""
    ds, model = _write_cfgs(tmp_path)
    tool = _load_tool()
    results = tool.main([
        "--model", model, "--ds", ds, "--batch", "8", "--images", "32",
        "--reps", "1", "--depths", "2", "--clients", "4", "--client-batch", "4",
        "TRAIN.IMAGE_SIZE", "[32,32]", "TEST.IMAGE_SIZE", "[32,32]",
        "TPU.COMPUTE_DTYPE", "float32", "TPU.USE_PALLAS_ATTENTION", "False",
    ])
    assert set(results) == {"naive", "pipe2", "daemon4"}
    assert all(r > 0 for r in results["daemon4"])
