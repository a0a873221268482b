"""Golden parity vs the REFERENCE's actual torch modules (not transcriptions).

Loads /root/reference/vision_benchmark/evaluation/{model,adapter_model,
lora_model,compacter_model}.py directly (under a synthetic package so their
relative imports resolve, without importing the package __init__ which needs
timm/nltk), instantiates each method's VisionTransformer at tiny width, copies
the weights into our pytrees, and asserts forward AND gradient parity in
fp32 for all four PEFT methods.

This retires the round-1 risk that the numpy oracles in tests/oracles.py are
hand-transcriptions — a transcription error would pass its own oracle test
but fail here, because here the reference's quirky code itself
(model.py:423-834 MultiheadAttention with kattention, adapter_model.py:204-352,
lora_model.py:455-514, compacter_model.py:196-560) produces the expected
values.

Skips gracefully if torch or the reference tree is unavailable.
"""

import dataclasses
import importlib
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pevit_tpu.core import CLIPSpec, TextSpec, VisionSpec, encode_image
from pevit_tpu.peft import PeftConfig, make_hooks

REF_EVAL = Path("/root/reference/vision_benchmark/evaluation")

torch = pytest.importorskip("torch")


@dataclasses.dataclass(frozen=True)
class Geom:
    """Tower geometry; the builders below are geometry-parametric so the
    slow real-B/32 suite (test_real_geometry_parity.py) reuses them."""

    W: int = 64
    HEADS: int = 2
    LAYERS: int = 2
    PATCH: int = 16
    RES: int = 32
    OUT: int = 32

    @property
    def spec(self) -> CLIPSpec:
        return CLIPSpec(
            embed_dim=self.OUT,
            vision=VisionSpec(
                input_resolution=self.RES, patch_size=self.PATCH, width=self.W,
                layers=self.LAYERS, heads=self.HEADS, output_dim=self.OUT,
            ),
            text=TextSpec(),
        )


# tiny tower: width divisible by 32 (KAdaptation phm_dim) and by 4 (Compacter)
TOY = Geom()
W, HEADS, LAYERS, PATCH, RES, OUT = TOY.W, TOY.HEADS, TOY.LAYERS, TOY.PATCH, TOY.RES, TOY.OUT
SPEC = TOY.spec


def _load_ref(name):
    """Import a reference evaluation module without the package __init__."""
    if not REF_EVAL.exists():
        pytest.skip("reference tree not available")
    pkg_name = "_ref_eval_parity"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [str(REF_EVAL)]
        sys.modules[pkg_name] = pkg
    try:
        return importlib.import_module(f"{pkg_name}.{name}")
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference module {name} not importable: {e}")


def _t2j(t):
    return jnp.asarray(t.detach().numpy().astype(np.float32))


def _stack(tensors):
    return jnp.asarray(np.stack([t.detach().numpy().astype(np.float32) for t in tensors]))


def _visual_params(vt, n_layers):
    """Map a reference VisionTransformer state onto our visual pytree,
    through the same converter the real checkpoint path uses."""
    from pevit_tpu.ckpt.torch_loader import _ln, _stack_blocks

    sd = {f"visual.{k}": v.detach().numpy().astype(np.float32) for k, v in vt.state_dict().items()}
    conv = sd["visual.conv1.weight"]  # (width, 3, p, p)
    p_sz, width = conv.shape[-1], conv.shape[0]
    return {
        "visual": {
            "patch_embed": {
                "kernel": jnp.asarray(conv.transpose(2, 3, 1, 0).reshape(p_sz * p_sz * 3, width))
            },
            "class_embedding": jnp.asarray(sd["visual.class_embedding"]),
            "positional_embedding": jnp.asarray(sd["visual.positional_embedding"]),
            "ln_pre": _ln(sd, "visual.ln_pre"),
            "blocks": _stack_blocks(sd, "visual.transformer.resblocks", n_layers),
            "ln_post": _ln(sd, "visual.ln_post"),
            "proj": jnp.asarray(sd["visual.proj"]),
        }
    }


def _images(batch=3, g: Geom = TOY):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((batch, 3, g.RES, g.RES)).astype(np.float32)
    xt = torch.from_numpy(x)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))  # NCHW -> NHWC
    return xt, xj


def _run_jax(params, peft, method, xj, g: Geom = TOY):
    hooks = make_hooks(PeftConfig(method=method), g.spec, train=False)
    return encode_image(
        params, xj, spec=g.spec, peft=peft, hooks=hooks, rng=None,
        compute_dtype=jnp.float32,
    )


def _assert_close(ref, ours, what, rtol=2e-4, atol=3e-5):
    np.testing.assert_allclose(
        np.asarray(ours), ref.detach().numpy(), rtol=rtol, atol=atol,
        err_msg=f"{what} diverges from the reference torch module",
    )


# ---------------------------------------------------------------------------
# KAdaptation — the quirkiest math (Wq-for-v, raw-reshape scramble, post-scale
# add, weight-dropout); reference model.py:406-834, 983-1051
# ---------------------------------------------------------------------------

def _build_kadapt(g: Geom = TOY):
    ref = _load_ref("model")
    torch.manual_seed(0)
    vt = ref.VisionTransformer(g.RES, g.PATCH, g.W, g.LAYERS, g.HEADS, g.OUT)
    with torch.no_grad():
        # q/v factors are zero-init (the identity-at-init quirk) — randomize
        # them so the delta path actually contributes to the output.
        for n, p in vt.named_parameters():
            if "proj_adapter1" in n:
                p.copy_(0.05 * torch.randn_like(p))
    vt.eval()

    tr = vt.transformer
    blocks = [b.attn for b in tr.resblocks]
    peft = {
        "shared": {
            "phm_rule1_left": _t2j(tr.phm_rule1_left),
            "phm_rule1_right": _t2j(tr.phm_rule1_right),
            "phm_rule2_left": _t2j(tr.phm_rule2_left),
            "phm_rule2_right": _t2j(tr.phm_rule2_right),
        },
        "layers": {
            "q_left": _stack([a.q_proj_adapter1_left for a in blocks]),
            "q_right": _stack([a.q_proj_adapter1_right for a in blocks]),
            "v_left": _stack([a.v_proj_adapter1_left for a in blocks]),
            "v_right": _stack([a.v_proj_adapter1_right for a in blocks]),
            "b": _stack([a.b for a in blocks]),
        },
    }
    return vt, _visual_params(vt, g.LAYERS), peft


def test_kadaptation_forward_parity():
    vt, params, peft = _build_kadapt()
    xt, xj = _images()
    with torch.no_grad():
        ref_out = vt(xt)
    ours = _run_jax(params, peft, "kadaptation", xj)
    _assert_close(ref_out, ours, "kadaptation encode_image")


def test_kadaptation_grad_parity():
    """d(sum(out^2))/d(peft) matches the reference autograd."""
    vt, params, peft = _build_kadapt()
    xt, xj = _images()

    out = vt(xt)
    (out ** 2).sum().backward()
    tr = vt.transformer
    a0 = tr.resblocks[0].attn

    def loss(peft):
        o = _run_jax(params, peft, "kadaptation", xj)
        return (o ** 2).sum()

    g = jax.grad(loss)(peft)
    for ref_grad, ours, what in [
        (tr.phm_rule1_left.grad, g["shared"]["phm_rule1_left"], "phm_rule1_left"),
        (tr.phm_rule2_right.grad, g["shared"]["phm_rule2_right"], "phm_rule2_right"),
        (a0.q_proj_adapter1_left.grad, g["layers"]["q_left"][0], "layer0 q_left"),
        (a0.b.grad, g["layers"]["b"][0], "layer0 b"),
    ]:
        _assert_close(ref_grad, ours, f"grad({what})", rtol=5e-4, atol=1e-4)
    # the v factors are parameters-but-unused in the reference (quirk #1):
    # torch gives them no grad; ours must give exact zeros.
    assert a0.v_proj_adapter1_left.grad is None
    assert not np.any(np.asarray(g["layers"]["v_left"]))


# ---------------------------------------------------------------------------
# LoRA — reference lora_model.py:455-514 (params) + :718-733 (application)
# ---------------------------------------------------------------------------

def _build_lora(g: Geom = TOY):
    ref = _load_ref("lora_model")
    torch.manual_seed(1)
    vt = ref.VisionTransformer(g.RES, g.PATCH, g.W, g.LAYERS, g.HEADS, g.OUT)
    with torch.no_grad():
        for n, p in vt.named_parameters():
            if "proj_adapter2" in n:  # zero-init B side — randomize
                # width-scaled std: LoRA's scale-32 rank-4 delta explodes the
                # residual stream at real width with 0.05 (logits ~7e4, which
                # ill-conditions fp32 grad comparison); keep the toy magnitude
                # at W=64 and shrink ~W^-1 beyond it.
                p.copy_((0.05 * 64.0 / g.W) * torch.randn_like(p))
    vt.eval()

    blocks = [b.attn for b in vt.transformer.resblocks]
    peft = {
        "shared": None,
        "layers": {
            # torch Linear weight is (out, in); our kernels are (in, out)
            "q_a": _stack([a.q_proj_adapter1.weight.T for a in blocks]),
            "q_b": _stack([a.q_proj_adapter2.weight.T for a in blocks]),
            "v_a": _stack([a.v_proj_adapter1.weight.T for a in blocks]),
            "v_b": _stack([a.v_proj_adapter2.weight.T for a in blocks]),
        },
    }
    return vt, _visual_params(vt, g.LAYERS), peft


def test_lora_forward_parity():
    vt, params, peft = _build_lora()
    xt, xj = _images()
    with torch.no_grad():
        ref_out = vt(xt)
    ours = _run_jax(params, peft, "lora", xj)
    _assert_close(ref_out, ours, "lora encode_image")


def test_lora_grad_parity():
    vt, params, peft = _build_lora()
    xt, xj = _images()
    (vt(xt) ** 2).sum().backward()
    a0 = vt.transformer.resblocks[0].attn

    g = jax.grad(lambda pf: (_run_jax(params, pf, "lora", xj) ** 2).sum())(peft)
    for ref_grad, ours, what in [
        (a0.q_proj_adapter1.weight.grad.T, g["layers"]["q_a"][0], "layer0 q_a"),
        (a0.q_proj_adapter2.weight.grad.T, g["layers"]["q_b"][0], "layer0 q_b"),
        (a0.v_proj_adapter1.weight.grad.T, g["layers"]["v_a"][0], "layer0 v_a"),
        (a0.v_proj_adapter2.weight.grad.T, g["layers"]["v_b"][0], "layer0 v_b"),
    ]:
        _assert_close(ref_grad, ours, f"grad({what})", rtol=5e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Bottleneck adapter — reference adapter_model.py:204-352
# ---------------------------------------------------------------------------

def _build_adapter(g: Geom = TOY):
    ref = _load_ref("adapter_model")
    torch.manual_seed(2)
    vt = ref.VisionTransformer(g.RES, g.PATCH, g.W, g.LAYERS, g.HEADS, g.OUT)
    vt.eval()

    ads = [b.adapter for b in vt.transformer.resblocks]
    peft = {
        "shared": None,
        "layers": {
            "norm_scale": _stack([a.adapter_norm_before.weight for a in ads]),
            "norm_bias": _stack([a.adapter_norm_before.bias for a in ads]),
            "down_kernel": _stack([a.adapter_down[1].weight.T for a in ads]),
            "down_bias": _stack([a.adapter_down[1].bias for a in ads]),
            "up_kernel": _stack([a.adapter_up.weight.T for a in ads]),
            "up_bias": _stack([a.adapter_up.bias for a in ads]),
        },
    }
    return vt, _visual_params(vt, g.LAYERS), peft


def test_adapter_forward_parity():
    vt, params, peft = _build_adapter()
    xt, xj = _images()
    with torch.no_grad():
        ref_out = vt(xt)
    ours = _run_jax(params, peft, "adapter", xj)
    _assert_close(ref_out, ours, "adapter encode_image")


def test_adapter_grad_parity():
    vt, params, peft = _build_adapter()
    xt, xj = _images()
    (vt(xt) ** 2).sum().backward()
    a0 = vt.transformer.resblocks[0].adapter

    g = jax.grad(lambda pf: (_run_jax(params, pf, "adapter", xj) ** 2).sum())(peft)
    for ref_grad, ours, what in [
        (a0.adapter_norm_before.weight.grad, g["layers"]["norm_scale"][0], "layer0 norm_scale"),
        (a0.adapter_down[1].weight.grad.T, g["layers"]["down_kernel"][0], "layer0 down_kernel"),
        (a0.adapter_down[1].bias.grad, g["layers"]["down_bias"][0], "layer0 down_bias"),
        (a0.adapter_up.weight.grad.T, g["layers"]["up_kernel"][0], "layer0 up_kernel"),
        (a0.adapter_up.bias.grad, g["layers"]["up_bias"][0], "layer0 up_bias"),
    ]:
        _assert_close(ref_grad, ours, f"grad({what})", rtol=5e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Compacter — reference compacter_model.py:196-560
# ---------------------------------------------------------------------------

def _build_compacter(g: Geom = TOY):
    ref = _load_ref("compacter_model")
    torch.manual_seed(3)
    vt = ref.VisionTransformer(g.RES, g.PATCH, g.W, g.LAYERS, g.HEADS, g.OUT)
    vt.eval()

    cps = [b.compacter for b in vt.transformer.resblocks]
    peft = {
        "shared": {"phm_rule": _t2j(vt.transformer.phm_rule)},
        "layers": {
            "norm_scale": _stack([c.adapter_norm_before.weight for c in cps]),
            "norm_bias": _stack([c.adapter_norm_before.bias for c in cps]),
            "down_w_left": _stack([c.adapter_down[1].W_left for c in cps]),
            "down_w_right": _stack([c.adapter_down[1].W_right for c in cps]),
            "down_b": _stack([c.adapter_down[1].b for c in cps]),
            "up_w_left": _stack([c.adapter_up.W_left for c in cps]),
            "up_w_right": _stack([c.adapter_up.W_right for c in cps]),
            "up_b": _stack([c.adapter_up.b for c in cps]),
        },
    }
    return vt, _visual_params(vt, g.LAYERS), peft


def test_compacter_forward_parity():
    vt, params, peft = _build_compacter()
    xt, xj = _images()
    with torch.no_grad():
        ref_out = vt(xt)
    ours = _run_jax(params, peft, "compacter", xj)
    _assert_close(ref_out, ours, "compacter encode_image")


def test_compacter_grad_parity():
    vt, params, peft = _build_compacter()
    xt, xj = _images()
    (vt(xt) ** 2).sum().backward()
    c0 = vt.transformer.resblocks[0].compacter

    g = jax.grad(lambda pf: (_run_jax(params, pf, "compacter", xj) ** 2).sum())(peft)
    for ref_grad, ours, what in [
        (vt.transformer.phm_rule.grad, g["shared"]["phm_rule"], "shared phm_rule"),
        (c0.adapter_down[1].W_left.grad, g["layers"]["down_w_left"][0], "layer0 down_w_left"),
        (c0.adapter_down[1].b.grad, g["layers"]["down_b"][0], "layer0 down_b"),
        (c0.adapter_up.W_right.grad, g["layers"]["up_w_right"][0], "layer0 up_w_right"),
    ]:
        _assert_close(ref_grad, ours, f"grad({what})", rtol=5e-4, atol=1e-4)


def test_kadaptation_train_dropout_statistics():
    """Quirk #6 (Dropout(0.5) on the weight matrix H itself) in TRAIN mode.

    Exact equality is impossible across RNGs, so compare the output
    DISTRIBUTION over many dropout draws: mean and variance.  Variance is
    the discriminating statistic — dropping H's 576 entries (averaged away
    by x @ H) gives far lower output variance than dropping activations
    would, so a misplaced dropout shifts the ratio well outside the band.
    """
    vt, params, peft = _build_kadapt()
    xt, xj = _images(batch=2)
    n = 256

    vt.train()
    with torch.no_grad():
        ref = np.stack([vt(xt).numpy() for _ in range(n)])

    hooks = make_hooks(PeftConfig(method="kadaptation"), SPEC, train=True)
    fwd = jax.jit(
        lambda r: encode_image(
            params, xj, spec=SPEC, peft=peft, hooks=hooks, rng=r,
            compute_dtype=jnp.float32,
        )
    )
    ours = np.stack([np.asarray(fwd(jax.random.PRNGKey(i))) for i in range(n)])

    # identical architecture + weights => matching dropout statistics
    se = ref.std(0) / np.sqrt(n)
    np.testing.assert_allclose(
        ours.mean(0), ref.mean(0), atol=np.maximum(6 * se, 2e-3).max(), rtol=0,
        err_msg="train-mode output mean diverges (dropout misplaced or missing)",
    )
    ref_var, our_var = float(ref.var(0).mean()), float(ours.var(0).mean())
    assert ref_var > 0, "reference train mode shows no dropout variance?"
    assert 0.6 < our_var / ref_var < 1.6, (
        f"dropout-variance mismatch: ours {our_var:.3e} vs ref {ref_var:.3e} "
        "(dropout applied at the wrong place?)"
    )
