"""cls_swin golden parity: OUR swin_forward vs the reference's actual
``SwinTransformer`` (cls_swin.py:475-713), forward AND grads.

This is the classification-Swin counterpart of test_clip_swin_ckpt.py (which
covers the clip_swin pairing).  It was added after two real divergences were
found at trained-weight-visible magnitude but attenuated to ~1e-4 at random
init:

1. The reference clamps ``shift -> 0`` and ``window -> min(resolution)``
   whenever a stage's resolution is <= the window (cls_swin.py:198-201) —
   the LAST stage of every standard Swin (res 7 == window 7).
2. The reference builds the shifted-window region mask directly in the
   rolled frame and does NOT roll it (cls_swin.py:216-232).

Geometries here hit both: a shifted stage (res > window), a clamped-shift
stage (res == window), and a clamped-window stage (res < window, smaller
rel-bias table).  Tolerances are fp32-tight (observed ~1e-8).
"""

import dataclasses
import importlib
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pevit_tpu.models.swin import swin_forward, swin_state_dict_to_params

REF_MODELS = Path("/root/reference/vision_benchmark/models")


def load_ref_cls_swin():
    """Import the reference's cls_swin module with timm shimmed (DropPath is
    only exercised at rate 0 in parity tests, where it is Identity).  Raises
    on failure — test files wrap this in a fixture/skip."""
    if not REF_MODELS.exists():
        raise FileNotFoundError("reference tree not available")
    if "timm.models.layers" not in sys.modules:
        import importlib.machinery as _mach

        timm = sys.modules.setdefault("timm", types.ModuleType("timm"))
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        for name, m in [("timm", timm), ("timm.models", models), ("timm.models.layers", layers)]:
            m.__spec__ = _mach.ModuleSpec(name, None)
            m.__path__ = []

        class DropPath(torch.nn.Identity):
            def __init__(self, drop_prob=None):
                super().__init__()

        layers.DropPath = DropPath
        layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = models
        models.layers = layers
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    pkg_name = "_ref_cls_swin_pkg"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [str(REF_MODELS)]
        sys.modules[pkg_name] = pkg
    return importlib.import_module(f"{pkg_name}.cls_swin")


@pytest.fixture(scope="module")
def ref_cls_swin():
    try:
        return load_ref_cls_swin()
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference cls_swin not importable: {e}")


def _build(ref_cls_swin, *, img=56, window=7, depths=(2, 2), heads=(2, 4), embed=32, seed=0, **kw):
    torch.manual_seed(seed)
    model = ref_cls_swin.SwinTransformer(
        img_size=img, patch_size=4, in_chans=3, num_classes=5, embed_dim=embed,
        depths=list(depths), num_heads=list(heads), window_size=window,
        mlp_ratio=4.0, qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0,
        ape=kw.get("ape", False), patch_norm=True, layer_scale=kw.get("layer_scale", False),
    )
    model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, spec = swin_state_dict_to_params(sd)
    spec = dataclasses.replace(spec, img_size=img, window_size=window)
    return model, params, spec


def _forward_pair(model, params, spec, seed=1):
    torch.manual_seed(seed)
    x = torch.randn(2, 3, spec.img_size, spec.img_size)
    with torch.no_grad():
        ref = model(x).numpy()
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    ours = np.asarray(swin_forward(params, xj, spec=spec))
    return ref, ours


def test_forward_parity_shifted_and_clamped_shift(ref_cls_swin):
    # stage 0 res 14 > win 7 (real shifted block + mask); stage 1 res 7 == win
    # (reference clamps shift to 0 — bug site #1).
    model, params, spec = _build(ref_cls_swin, img=56, window=7)
    shifts = [b.shift_size for layer in model.layers for b in layer.blocks]
    assert shifts == [0, 3, 0, 0], "geometry must exercise shifted + clamped blocks"
    ref, ours = _forward_pair(model, params, spec)
    np.testing.assert_allclose(ours, ref, atol=5e-6, rtol=0)


def test_forward_parity_clamped_window(ref_cls_swin):
    # window 12 on img 48: stage 0 res 12 == win (clamped shift), stage 1
    # res 6 < 12 -> reference shrinks the window to 6 and its rel-bias table
    # to (2*6-1)^2 rows; our mapping/forward must follow.  (res > window
    # requires res % window == 0 in the reference — cls_swin.py:49 — so a
    # shrunken-window stage can only follow an exactly-divisible one.)
    model, params, spec = _build(ref_cls_swin, img=48, window=12)
    wins = [b.window_size for layer in model.layers for b in layer.blocks]
    assert wins == [12, 12, 6, 6]
    assert params["stages"][1]["blocks"][0]["rel_bias"].shape[0] == 11 ** 2
    ref, ours = _forward_pair(model, params, spec)
    np.testing.assert_allclose(ours, ref, atol=5e-6, rtol=0)


def test_forward_parity_ape_layer_scale(ref_cls_swin):
    model, params, spec = _build(ref_cls_swin, img=56, window=7, ape=True, layer_scale=True, seed=3)
    assert spec.ape and spec.layer_scale
    ref, ours = _forward_pair(model, params, spec)
    np.testing.assert_allclose(ours, ref, atol=5e-6, rtol=0)


def test_grad_parity(ref_cls_swin):
    """One CE step: input-grad + head/qkv weight-grads vs torch autograd."""
    model, params, spec = _build(ref_cls_swin, img=56, window=7, seed=5)
    torch.manual_seed(7)
    x = torch.randn(2, 3, 56, 56, requires_grad=True)
    y = torch.tensor([1, 3])
    loss = torch.nn.functional.cross_entropy(model(x), y)
    loss.backward()
    ref_dx = x.grad.numpy()
    ref_dhead = model.head.weight.grad.numpy()
    ref_dqkv = model.layers[0].blocks[1].attn.qkv.weight.grad.numpy()

    def loss_fn(p, xj):
        logits = swin_forward(p, xj, spec=spec)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -(logp[0, 1] + logp[1, 3]) / 2.0

    xj = jnp.asarray(np.transpose(x.detach().numpy(), (0, 2, 3, 1)))
    lj, (dp, dx) = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, xj)
    np.testing.assert_allclose(float(lj), float(loss.detach()), atol=1e-6, rtol=0)
    np.testing.assert_allclose(np.transpose(np.asarray(dx), (0, 3, 1, 2)), ref_dx, atol=1e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(dp["head"]["kernel"]).T, ref_dhead, atol=1e-6, rtol=0)
    np.testing.assert_allclose(
        np.asarray(dp["stages"][0]["blocks"][1]["qkv"]["kernel"]).T, ref_dqkv, atol=1e-6, rtol=0
    )


@pytest.mark.slow
def test_forward_parity_real_swin_tiny_geometry(ref_cls_swin):
    """Full Swin-Tiny at its true 224 operating point: stage resolutions
    56/28/14/7, so stages 0-2 run real shifted-window masks and stage 3 is
    the reference-clamped single-window case (cls_swin.py:198-201) — the
    production geometry of resources/model/clip_swin_tiny.yaml."""
    model, params, spec = _build(
        ref_cls_swin, img=224, window=7, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24), embed=96, seed=11
    )
    # reference clamps stage-3 (res 7) shifts to 0; stages 0-2 alternate 0/3
    stage3 = [b.shift_size for b in model.layers[3].blocks]
    assert stage3 == [0, 0]
    torch.manual_seed(13)
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref = model(x).numpy()
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    ours = np.asarray(swin_forward(params, xj, spec=spec))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=0)
