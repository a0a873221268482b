"""PEFT math vs NumPy oracles (small dims, fp32, eval mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pevit_tpu.peft import adapter, compacter, kadaptation, kron, lora
from tests import oracles

# small test dims: width divisible by kadaptation PHM_DIM(32), heads, compacter PHM_DIM(4)
WIDTH = 64
N_HEAD = 4
N, B = 5, 3
RTOL, ATOL = 1e-5, 1e-6


def rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_batched_kron_sum_matches_numpy(rng):
    a = rand(rng, 6, 4, 5)
    b = rand(rng, 6, 3, 2)
    got = kron.batched_kron_sum(jnp.asarray(a), jnp.asarray(b))
    want = oracles.np_kron_sum(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def _kad_params(rng, width):
    p = kadaptation.PHM_DIM
    d = width // p
    shared = {
        "phm_rule1_left": rand(rng, p, p, 1) * 0.01,
        "phm_rule1_right": rand(rng, p, 1, p) * 0.01,
        "phm_rule2_left": rand(rng, p, p, 1) * 0.01,
        "phm_rule2_right": rand(rng, p, 1, p) * 0.01,
    }
    layer = {
        "q_left": rand(rng, p, d, 1),
        "q_right": rand(rng, p, 1, d),
        "v_left": rand(rng, p, d, 1),
        "v_right": rand(rng, p, 1, d),
        "b": rand(rng, width),
    }
    return shared, layer


def test_kadaptation_delta_matches_oracle(rng):
    # width must be divisible by PHM_DIM=32
    width = 64
    n_head = 2
    shared, layer = _kad_params(rng, width)
    x_nbc = rand(rng, N, B, width)

    # oracle works in reference (N,B,C) layout; ours in (B,N,C)
    want_q = oracles.np_kadaptation_delta(
        x_nbc.astype(np.float64),
        {k: v.astype(np.float64) for k, v in shared.items()},
        {k: v.astype(np.float64) for k, v in layer.items()},
        n_head,
        "q",
    )
    want_v = oracles.np_kadaptation_delta(
        x_nbc.astype(np.float64),
        {k: v.astype(np.float64) for k, v in shared.items()},
        {k: v.astype(np.float64) for k, v in layer.items()},
        n_head,
        "v",
    )
    x_bnc = jnp.asarray(x_nbc.transpose(1, 0, 2))
    dq, dv = kadaptation.attn_delta(
        jax.tree.map(jnp.asarray, shared),
        jax.tree.map(jnp.asarray, layer),
        jax.random.PRNGKey(0),
        x_bnc,
        n_head=n_head,
        train=False,
    )
    hd = width // n_head
    np.testing.assert_allclose(
        np.asarray(dq).reshape(B * n_head, N, hd), want_q, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dv).reshape(B * n_head, N, hd), want_v, rtol=1e-4, atol=1e-5
    )


def test_kadaptation_concat_delta_equivalent(rng):
    """TPU.KADAPT_CONCAT_DELTA (one x@[H_q|H_v] GEMM) is exact algebra:
    fwd AND grads match the two-GEMM path at fp32 tolerance."""
    width, n_head = 64, 2
    shared, layer = _kad_params(rng, width)
    shared = jax.tree.map(jnp.asarray, shared)
    layer = jax.tree.map(jnp.asarray, layer)
    x = jnp.asarray(rand(rng, B, N, width))

    def loss(args):
        sh, ly = args
        dq, dv = kadaptation.attn_delta(
            sh, ly, jax.random.PRNGKey(0), x, n_head=n_head, train=False
        )
        return (dq ** 2).sum() + (dv * dq).sum(), (dq, dv)

    outs = {}
    try:
        for flag in (False, True):
            kadaptation.set_concat_delta(flag)
            (l, (dq, dv)), g = jax.value_and_grad(loss, has_aux=True)((shared, layer))
            outs[flag] = (np.asarray(l), np.asarray(dq), np.asarray(dv),
                          jax.tree.map(np.asarray, g))
    finally:
        kadaptation.set_concat_delta(False)

    np.testing.assert_allclose(outs[True][1], outs[False][1], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(outs[True][2], outs[False][2], rtol=1e-6, atol=1e-6)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(outs[True][3]),
        jax.tree_util.tree_leaves_with_path(outs[False][3]),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))


def test_kadaptation_wq_reuse_quirk(rng):
    """The v-delta must depend on q factors, not v factors (quirk #1)."""
    width, n_head = 64, 2
    shared, layer = _kad_params(rng, width)
    x = jnp.asarray(rand(rng, B, N, width))
    key = jax.random.PRNGKey(0)
    as_jnp = lambda t: jax.tree.map(jnp.asarray, t)

    _, dv1 = kadaptation.attn_delta(as_jnp(shared), as_jnp(layer), key, x, n_head=n_head)
    layer2 = dict(layer)
    layer2["v_left"] = layer["v_left"] * 7.0  # perturb v factors: no effect expected
    _, dv2 = kadaptation.attn_delta(as_jnp(shared), as_jnp(layer2), key, x, n_head=n_head)
    np.testing.assert_allclose(np.asarray(dv1), np.asarray(dv2))

    layer3 = dict(layer)
    layer3["q_left"] = layer["q_left"] * 7.0  # perturb q factors: must change v-delta
    _, dv3 = kadaptation.attn_delta(as_jnp(shared), as_jnp(layer3), key, x, n_head=n_head)
    assert not np.allclose(np.asarray(dv1), np.asarray(dv3))


def test_kadaptation_identity_at_init():
    """Zero-initialised factors => delta == bias only (== 0) (quirk #2)."""
    spec_layers, width = 2, 64
    params = kadaptation.init_params(jax.random.PRNGKey(1), spec_layers, width)
    layer0 = jax.tree.map(lambda a: a[0], params["layers"])
    x = jnp.asarray(np.random.default_rng(2).standard_normal((B, N, width)), jnp.float32)
    dq, dv = kadaptation.attn_delta(
        params["shared"], layer0, jax.random.PRNGKey(0), x, n_head=2, train=False
    )
    np.testing.assert_allclose(np.asarray(dq), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dv), 0.0, atol=1e-7)


def test_lora_delta_matches_oracle(rng):
    a_q = rand(rng, WIDTH, lora.LORA_RANK) * 0.02
    b_q = rand(rng, lora.LORA_RANK, WIDTH)
    a_v = rand(rng, WIDTH, lora.LORA_RANK) * 0.02
    b_v = rand(rng, lora.LORA_RANK, WIDTH)
    x_nbc = rand(rng, N, B, WIDTH)

    want_q = oracles.np_lora_delta(x_nbc.astype(np.float64), a_q.astype(np.float64), b_q.astype(np.float64), N_HEAD)
    want_v = oracles.np_lora_delta(x_nbc.astype(np.float64), a_v.astype(np.float64), b_v.astype(np.float64), N_HEAD)

    layer = {"q_a": jnp.asarray(a_q), "q_b": jnp.asarray(b_q), "v_a": jnp.asarray(a_v), "v_b": jnp.asarray(b_v)}
    dq, dv = lora.attn_delta(None, layer, None, jnp.asarray(x_nbc.transpose(1, 0, 2)), n_head=N_HEAD)
    hd = WIDTH // N_HEAD
    np.testing.assert_allclose(np.asarray(dq).reshape(B * N_HEAD, N, hd), want_q, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv).reshape(B * N_HEAD, N, hd), want_v, rtol=1e-4, atol=1e-5)


def test_lora_identity_at_init():
    params = lora.init_params(jax.random.PRNGKey(0), 2, WIDTH)
    layer0 = jax.tree.map(lambda a: a[0], params["layers"])
    x = jnp.asarray(np.random.default_rng(1).standard_normal((B, N, WIDTH)), jnp.float32)
    dq, dv = lora.attn_delta(None, layer0, None, x, n_head=N_HEAD)
    np.testing.assert_allclose(np.asarray(dq), 0.0)
    np.testing.assert_allclose(np.asarray(dv), 0.0)


def test_adapter_matches_oracle(rng):
    width = 16
    m = rand(rng, B, N, width)
    layer = {
        "norm_scale": rand(rng, width),
        "norm_bias": rand(rng, width),
        "down_kernel": rand(rng, width, 8),
        "down_bias": rand(rng, 8),
        "up_kernel": rand(rng, 8, width),
        "up_bias": rand(rng, width),
    }
    want = oracles.np_adapter_block(
        m.astype(np.float64),
        layer["norm_scale"].astype(np.float64),
        layer["norm_bias"].astype(np.float64),
        layer["down_kernel"].astype(np.float64),
        layer["down_bias"].astype(np.float64),
        layer["up_kernel"].astype(np.float64),
        layer["up_bias"].astype(np.float64),
    )
    got = adapter.mlp_post(None, jax.tree.map(jnp.asarray, layer), None, jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_phm_linear_matches_oracle(rng):
    p, d_in, d_out = 4, 4, 2
    x = rand(rng, B, p * d_in)
    w_left = rand(rng, p, d_in, 1)
    w_right = rand(rng, p, 1, d_out)
    rule = rand(rng, p, p, p)
    bias = rand(rng, p * d_out)
    want = oracles.np_phm_linear(
        x.astype(np.float64), w_left.astype(np.float64), w_right.astype(np.float64),
        rule.astype(np.float64), bias.astype(np.float64),
    )
    got = compacter.phm_linear(jnp.asarray(x), jnp.asarray(w_left), jnp.asarray(w_right), jnp.asarray(rule), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_compacter_matches_oracle(rng):
    width, down = 16, 8
    p = compacter.PHM_DIM
    m = rand(rng, B, N, width)
    layer = {
        "norm_scale": rand(rng, width),
        "norm_bias": rand(rng, width),
        "down_w_left": rand(rng, p, width // p, 1),
        "down_w_right": rand(rng, p, 1, down // p),
        "down_b": rand(rng, down),
        "up_w_left": rand(rng, p, down // p, 1),
        "up_w_right": rand(rng, p, 1, width // p),
        "up_b": rand(rng, width),
    }
    rule = rand(rng, p, p, p)
    want = oracles.np_compacter_block(
        m.astype(np.float64),
        layer["norm_scale"].astype(np.float64),
        layer["norm_bias"].astype(np.float64),
        {k: v.astype(np.float64) for k, v in layer.items()},
        rule.astype(np.float64),
    )
    got = compacter.mlp_post(
        {"phm_rule": jnp.asarray(rule)}, jax.tree.map(jnp.asarray, layer), None, jnp.asarray(m)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_param_counts_vitb32():
    """Trainable-parameter counts must match the reference README tallies
    (backbone-side params; the linear head adds EMBED_DIM*K+K per dataset)."""
    # KAdaptation ViT-B/32: 12 layers x (4*32*24 + 768) + 4*32*32 = 50,176
    assert kadaptation.num_params(12, 768) == 50176
    # LoRA: 12 x 4 x 768 x 4 = 147,456
    assert lora.num_params(12, 768) == 147456
    # Adapter: 12 x (2*768 + 768*64+64 + 64*768+768) = 1,218,624
    assert adapter.num_params(12, 768) == 12 * (2 * 768 + 768 * 64 + 64 + 64 * 768 + 768)
    # Compacter tree total: 12 x (2*768 + (4*(192+16)+64) + (4*(16+192)+768)) + 64
    assert compacter.num_params(12, 768) == 12 * (1536 + 4 * 208 + 64 + 4 * 208 + 768) + 64
    # README cross-check: avg head over the 20 ELEVATER datasets is 29,523
    # params (README.md:89 linear probing row); backbone-side trainables:
    assert kadaptation.num_params(12, 768) + 29523 == 79699  # README.md:84
    assert lora.num_params(12, 768) + 29523 == 176979  # README.md:86
    # compacter: shared phm_rule (64) is frozen => trainable = total - 64
    assert compacter.num_params(12, 768) - 64 + 29523 == 77907  # README.md:87
    assert adapter.num_params(12, 768) + 29523 == 1237587  # README.md:85
