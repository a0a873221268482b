"""ops/fused_mlp.py — fused LN2->c_fc->QuickGELU->c_proj->residual kernel.

Runs in Pallas interpret mode on the CPU test mesh.  Checks, in fp32:

* forward == the XLA composite (layer_norm + mlp + residual),
* the dgrad-only VJP's dx == jax.grad of the XLA composite w.r.t. x,
* encode_image(use_fused_mlp=True) == encode_image(False) for a PEFT tower,
* weight cotangents are (symbolic) zeros — the documented frozen-weight
  contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pevit_tpu.core.layers import layer_norm, mlp
from pevit_tpu.ops.fused_mlp import fused_mlp_residual

B, N, C, F = 3, 12, 128, 512


def _params(seed=0):
    rng = np.random.default_rng(seed)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
    return {
        "ln_scale": 1.0 + 0.1 * f32(C),
        "ln_bias": 0.1 * f32(C),
        "wfc": f32(C, F),
        "bfc": f32(F),
        "wproj": f32(F, C),
        "bproj": f32(C),
    }


def _xla_ref(p, x):
    u = layer_norm(x, p["ln_scale"], p["ln_bias"])
    return x + mlp({"c_fc": {"kernel": p["wfc"], "bias": p["bfc"]},
                    "c_proj": {"kernel": p["wproj"], "bias": p["bproj"]}}, u)


def _fused(p, x):
    return fused_mlp_residual(
        x, p["ln_scale"], p["ln_bias"], p["wfc"], p["bfc"], p["wproj"], p["bproj"], True
    )


def test_forward_matches_xla():
    p = _params()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((B, N, C)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(_fused(p, x)), np.asarray(_xla_ref(p, x)), rtol=2e-5, atol=2e-5
    )


def test_forward_row_padding():
    """Row counts that don't divide the tile exercise the padding path."""
    p = _params()
    x = jnp.asarray(np.random.default_rng(2).standard_normal((5, 7, C)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(_fused(p, x)), np.asarray(_xla_ref(p, x)), rtol=2e-5, atol=2e-5
    )


def test_dx_matches_xla_grad():
    p = _params()
    x = jnp.asarray(np.random.default_rng(3).standard_normal((B, N, C)).astype(np.float32))

    g_ref = jax.grad(lambda x: (_xla_ref(p, x) ** 2).sum())(x)
    g_fused = jax.grad(lambda x: (_fused(p, x) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=5e-5, atol=5e-5)


def test_weight_cotangents_are_zero():
    """The documented frozen-weight contract: differentiating the fused op
    w.r.t. any weight yields exact zeros (callers must keep them frozen)."""
    p = _params()
    x = jnp.asarray(np.random.default_rng(4).standard_normal((B, N, C)).astype(np.float32))
    g = jax.grad(lambda wfc: (_fused({**p, "wfc": wfc}, x) ** 2).sum())(p["wfc"])
    assert not np.any(np.asarray(g))


@pytest.mark.slow
def test_encode_image_fused_matches():
    from pevit_tpu.core import CLIPSpec, TextSpec, VisionSpec, encode_image, init_clip_params
    from pevit_tpu.peft import PeftConfig, init_peft, make_hooks

    spec = CLIPSpec(
        embed_dim=64,
        vision=VisionSpec(input_resolution=32, patch_size=16, width=128, layers=2,
                          heads=2, output_dim=64),
        text=TextSpec(context_length=8, vocab_size=64, width=64, heads=1, layers=1,
                      output_dim=64),
    )
    params = init_clip_params(jax.random.PRNGKey(0), spec)
    cfg = PeftConfig(method="lora")
    peft = init_peft(jax.random.PRNGKey(1), cfg, spec)
    hooks = make_hooks(cfg, spec, train=False)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3), jnp.float32)

    run = lambda fused: encode_image(
        params, x, spec=spec, peft=peft, hooks=hooks, rng=None,
        compute_dtype=jnp.float32, use_fused_mlp=fused,
    )
    np.testing.assert_allclose(np.asarray(run(True)), np.asarray(run(False)),
                               rtol=2e-5, atol=2e-5)
