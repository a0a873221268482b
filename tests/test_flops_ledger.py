"""Exact jaxpr FLOP ledger (pevit_tpu/utils/flops.py): unit correctness +
the bench/roofline reconciliation numbers (VERDICT r3 weak #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pevit_tpu.utils.flops import chip_peaks, count_matmul_flops, step_flops


def test_dot_einsum_scan_cond_counts():
    a = jnp.zeros((128, 256)); b = jnp.zeros((256, 512))
    assert step_flops(lambda a, b: a @ b, a, b) == 2 * 128 * 256 * 512

    q = jnp.zeros((4, 12, 50, 64)); k = jnp.zeros((4, 12, 50, 64))
    want = 2 * 4 * 12 * 50 * 50 * 64
    assert step_flops(lambda q, k: jnp.einsum("bhnd,bhmd->bhnm", q, k), q, k) == want

    w = jnp.zeros((64, 64)); x = jnp.zeros((32, 64))
    scan_fn = lambda x: jax.lax.scan(lambda c, _: (c @ w, None), x, None, length=10)[0]
    assert step_flops(scan_fn, x) == 10 * 2 * 32 * 64 * 64

    # cond: max over branches
    cond_fn = lambda p, x: jax.lax.cond(p, lambda v: v @ w, lambda v: v, x)
    assert step_flops(cond_fn, True, x) == 2 * 32 * 64 * 64

    # grad doubles a single-dot fn (fwd + dgrad)
    g = jax.grad(lambda a: jnp.sum(a @ b))
    assert step_flops(g, a) == 2 * 2 * 128 * 256 * 512


def test_conv_flops():
    x = jnp.zeros((2, 8, 8, 3))
    k = jnp.zeros((4, 4, 3, 16))
    f = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (4, 4), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # out (2,2,2,16); per output elem: 4*4*3 MACs
    assert step_flops(f, x, k) == 2 * (2 * 2 * 2 * 16) * (4 * 4 * 3)


def test_b32_training_step_ledger():
    """The reconciled headline: the B/32 train step is ~21-22 GFLOP/img
    (NOT the ~2 XLA cost_analysis reported in r3, NOT the 13 the old bench
    header claimed)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "flops_audit", Path(__file__).resolve().parents[1] / "scripts" / "flops_audit.py")
    audit = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(audit)

    step, sargs, cspec = audit.build_step("b32", 32)
    exact = step_flops(step, *sargs) / 32 / 1e9
    assert 18.0 < exact < 26.0, exact
    # closed form agrees within ~30% (it omits attention-bwd extra bmms,
    # PEFT delta construction and head)
    cf = audit.closed_form_vit_gflops(cspec, 32)["step_gflop_approx"] / 32
    assert abs(exact - cf) / cf < 0.35, (exact, cf)


def test_chip_peaks_table():
    assert chip_peaks("TPU v5 lite0") == (819.0, 197.0)
    assert chip_peaks("TPU v4") == (1228.0, 275.0)
    assert chip_peaks("unknown accelerator") == (None, None)
