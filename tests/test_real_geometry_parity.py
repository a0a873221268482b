"""Golden parity vs the reference torch modules at the TRUE ViT-B/32 geometry.

The toy-geometry suite (test_reference_torch_parity.py, width 64 / 2 layers /
2 heads / res 32) proves the math; THIS suite proves it at the real operating
point — width 768, 12 layers, 12 heads, patch 32, res 224, embed 512, batch 4
— where the family's geometry-sensitive behaviors actually bite:

* the raw-reshape scramble (model.py:796) mixes tokens/batch/heads in a
  pattern that changes with (batch, heads, head_dim);
* KAdaptation's Kronecker dims become the real 32x24 split with scale 160
  against real magnitudes (model.py:564: 32/4*5*4 == lora_attn_alpha /
  lora_attn_dim * 5);
* Compacter's per-axis PHM factor dim is d=192 (768/4), not the toy d=16;
* r4 proved batch-COMPOSITION sensitivity at exactly this geometry — the
  one-step fwd+grad check here is the last offline-buildable rung of the
  accuracy-parity ladder (r4 VERDICT Next #1).

One fwd+bwd step per PEFT method against the reference's own
model.py/lora_model.py/adapter_model.py/compacter_model.py classes, plus the
full_finetune/linear_probe head path (full_model_finetune.py:144-156) on
features from the real tower.  fp32, slow-marked (torch eager runs ~1.3 img/s
on this host).

Tolerances: fp32 through 12 blocks of width 768.  Measured max deviations on
this host (torch fp32 vs jax fp32 'highest' matmuls) are ~1e-4 relative on
logits and grads; bounds below leave ~10x headroom while still catching any
structural mistake (wrong scramble, wrong scale, wrong GELU), which moves
outputs by percent-level or more.
"""

import numpy as np
import pytest

import jax

import torch  # noqa: F401  (importorskip happens in the toy module)

from tests.test_reference_torch_parity import (
    Geom,
    _build_adapter,
    _build_compacter,
    _build_kadapt,
    _build_lora,
    _images,
    _run_jax,
    torch,
)

pytestmark = pytest.mark.slow

# TRUE ViT-B/32: model.py:1210-1233 infers exactly this from the OpenAI ckpt
B32 = Geom(W=768, HEADS=12, LAYERS=12, PATCH=32, RES=224, OUT=512)
# TRUE ViT-L/14 (the repo's beyond-reference flagship): width 1024 flips the
# per-axis Kronecker dim to d=32 (1024/32) and N to 257 — a different tiling
# of every geometry-sensitive quirk than B/32's d=24 / N=50.
L14 = Geom(W=1024, HEADS=16, LAYERS=24, PATCH=14, RES=224, OUT=768)
BATCH = 4

_BUILDERS = {
    "kadaptation": _build_kadapt,
    "lora": _build_lora,
    "adapter": _build_adapter,
    "compacter": _build_compacter,
}

# per-method trainable-partition leaves to check grads on: (torch getter,
# jax pytree path) — the same representative selection as the toy suite
def _grad_checks(method, vt, g):
    tr = vt.transformer
    b0 = tr.resblocks[0]
    if method == "kadaptation":
        a0 = b0.attn
        return [
            (tr.phm_rule1_left, ("shared", "phm_rule1_left"), None),
            (tr.phm_rule2_right, ("shared", "phm_rule2_right"), None),
            (a0.q_proj_adapter1_left, ("layers", "q_left"), 0),
            (a0.b, ("layers", "b"), 0),
        ]
    if method == "lora":
        a0 = b0.attn
        return [
            (a0.q_proj_adapter1.weight, ("layers", "q_a"), 0, True),
            (a0.q_proj_adapter2.weight, ("layers", "q_b"), 0, True),
            (a0.v_proj_adapter1.weight, ("layers", "v_a"), 0, True),
            (a0.v_proj_adapter2.weight, ("layers", "v_b"), 0, True),
        ]
    if method == "adapter":
        a0 = b0.adapter
        return [
            (a0.adapter_norm_before.weight, ("layers", "norm_scale"), 0),
            (a0.adapter_down[1].weight, ("layers", "down_kernel"), 0, True),
            (a0.adapter_up.weight, ("layers", "up_kernel"), 0, True),
            (a0.adapter_up.bias, ("layers", "up_bias"), 0),
        ]
    if method == "compacter":
        c0 = b0.compacter
        return [
            (vt.transformer.phm_rule, ("shared", "phm_rule"), None),
            (c0.adapter_down[1].W_left, ("layers", "down_w_left"), 0),
            (c0.adapter_down[1].b, ("layers", "down_b"), 0),
            (c0.adapter_up.W_right, ("layers", "up_w_right"), 0),
        ]
    raise ValueError(method)


def _pick(tree, path, idx):
    node = tree
    for k in path:
        node = node[k]
    return node if idx is None else node[idx]


def _max_err(ref, ours):
    ref, ours = np.asarray(ref, np.float64), np.asarray(ours, np.float64)
    abs_err = np.max(np.abs(ours - ref))
    denom = np.maximum(np.abs(ref), 1e-6)
    return abs_err, np.max(np.abs(ours - ref) / denom)


@pytest.mark.parametrize("method", list(_BUILDERS))
def test_real_geometry_forward_and_grad_parity(method):
    vt, params, peft = _BUILDERS[method](B32)
    xt, xj = _images(batch=BATCH, g=B32)

    # --- forward ---
    out = vt(xt)
    ref_out = out.detach().numpy()
    ours = np.asarray(_run_jax(params, peft, method, xj, g=B32))
    scale = float(np.abs(ref_out).max())
    np.testing.assert_allclose(
        ours, ref_out, rtol=5e-5, atol=5e-5 * scale,
        err_msg=f"{method} B/32 real-geometry logits diverge",
    )

    # --- one backward step on the trainable partition ---
    (out ** 2).sum().backward()

    g = jax.grad(lambda pf: (_run_jax(params, pf, method, xj, g=B32) ** 2).sum())(peft)
    for check in _grad_checks(method, vt, B32):
        t, path, idx = check[0], check[1], check[2]
        transpose = len(check) > 3 and check[3]
        ref_g = t.grad.detach().numpy()
        if transpose:
            ref_g = ref_g.T
        ours_g = np.asarray(_pick(g, path, idx))
        gs = float(np.abs(ref_g).max())
        assert gs > 0, f"{method} reference grad at {path} is all-zero?"
        np.testing.assert_allclose(
            ours_g, ref_g, rtol=5e-4, atol=5e-4 * gs,
            err_msg=f"{method} B/32 grad({'.'.join(path)}) diverges",
        )

    if method == "kadaptation":
        # quirk #1 at real geometry: v factors are parameters-but-unused
        a0 = vt.transformer.resblocks[0].attn
        assert a0.v_proj_adapter1_left.grad is None
        assert not np.any(np.asarray(g["layers"]["v_left"]))


def test_l14_geometry_kadaptation_parity():
    """KAdaptation fwd+grad at the ViT-L/14 tower geometry (batch 2 — torch
    eager at L/14 is ~18x B/32 FLOPs/img on this 1-core host).  Covers the
    d=32 Kronecker split and the N=257 scramble tiling the B/32 test can't."""
    vt, params, peft = _build_kadapt(L14)
    xt, xj = _images(batch=2, g=L14)

    out = vt(xt)
    ref_out = out.detach().numpy()
    ours = np.asarray(_run_jax(params, peft, "kadaptation", xj, g=L14))
    scale = float(np.abs(ref_out).max())
    np.testing.assert_allclose(
        ours, ref_out, rtol=5e-5, atol=5e-5 * scale,
        err_msg="kadaptation L/14 real-geometry logits diverge",
    )

    (out ** 2).sum().backward()
    g = jax.grad(lambda pf: (_run_jax(params, pf, "kadaptation", xj, g=L14) ** 2).sum())(peft)
    for check in _grad_checks("kadaptation", vt, L14):
        t, path, idx = check[0], check[1], check[2]
        ref_g = t.grad.detach().numpy()
        ours_g = np.asarray(_pick(g, path, idx))
        gs = float(np.abs(ref_g).max())
        assert gs > 0, f"L/14 reference grad at {path} is all-zero?"
        np.testing.assert_allclose(
            ours_g, ref_g, rtol=5e-4, atol=5e-4 * gs,
            err_msg=f"kadaptation L/14 grad({'.'.join(path)}) diverges",
        )


def test_real_geometry_head_path_parity():
    """full_model_finetune.py:144-156 head math (BN affine=False -> Linear ->
    logit_scale.exp()) fwd+grad at embed 512 on REAL-tower features."""
    vt, params, peft = _build_kadapt(B32)  # natural zero-init deltas == plain CLIP
    # undo the builder's randomization so the tower is the plain B/32 forward
    with torch.no_grad():
        for n, p in vt.named_parameters():
            if "proj_adapter1" in n:
                p.zero_()
    import jax.numpy as jnp

    peft = jax.tree.map(
        lambda a: a * 0 if a.ndim >= 2 else a, peft
    )
    xt, xj = _images(batch=BATCH, g=B32)
    with torch.no_grad():
        feats_t = vt(xt)
    feats_j = _run_jax(params, peft, "kadaptation", xj, g=B32)
    np.testing.assert_allclose(
        np.asarray(feats_j), feats_t.numpy(), rtol=5e-5,
        atol=5e-5 * float(np.abs(feats_t.numpy()).max()),
    )

    n_cls = 7
    torch.manual_seed(11)
    bn = torch.nn.BatchNorm1d(B32.OUT, affine=False)  # full_model_finetune.py:128-131
    lin = torch.nn.Linear(B32.OUT, n_cls)
    logit_scale = torch.nn.Parameter(torch.tensor(float(np.log(1 / 0.07))))
    ft = feats_t.clone().requires_grad_(False)
    bn.train()
    logits_t = logit_scale.exp() * lin(bn(ft))  # :156
    (logits_t ** 2).sum().backward()

    from pevit_tpu.train.head import head_forward, init_bn_state

    head = {
        "linear": {
            "kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy()),
        },
        "logit_scale": jnp.asarray(float(np.log(1 / 0.07)), jnp.float32),
    }

    def jloss(head):
        logits, _ = head_forward(
            head, init_bn_state(B32.OUT), feats_j, train=True,
            use_bn=True, apply_logit_scale=True,
        )
        return (logits ** 2).sum(), logits

    (_, logits_j), grads = jax.value_and_grad(jloss, has_aux=True)(head)
    sc = float(np.abs(logits_t.detach().numpy()).max())
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.detach().numpy(), rtol=5e-5, atol=5e-5 * sc,
        err_msg="head-path logits diverge at real geometry",
    )
    for ref_g, ours_g, what in [
        (lin.weight.grad.numpy().T, grads["linear"]["kernel"], "linear.kernel"),
        (lin.bias.grad.numpy(), grads["linear"]["bias"], "linear.bias"),
        (logit_scale.grad.numpy(), grads["logit_scale"], "logit_scale"),
    ]:
        gs = float(np.abs(ref_g).max())
        np.testing.assert_allclose(
            np.asarray(ours_g), ref_g, rtol=5e-4, atol=5e-4 * max(gs, 1e-6),
            err_msg=f"head grad({what}) diverges at real geometry",
        )


def test_real_geometry_text_tower_parity():
    """encode_text vs the reference's ACTUAL CLIP.encode_text (model.py:1154-
    1168) at the TRUE B/32 text geometry: width 512, 8 heads, 12 layers,
    ctx 77, vocab 49408, argmax-EOT pooling.  The text transformer is built
    WITHOUT kattention (model.py:1093-1097) — vanilla nn.MultiheadAttention —
    so unlike the visual tower there is no scramble quirk; this pins that
    fact at real geometry (the zeroshot/few-shot text path end to end).
    The vision tower is kept tiny: its real-geometry parity is the tests
    above, and CLIP's two towers only meet after both projections."""
    import jax.numpy as jnp

    from tests.test_reference_torch_parity import _load_ref
    from pevit_tpu.ckpt import state_dict_to_params
    from pevit_tpu.core import encode_text

    ref = _load_ref("model")
    torch.manual_seed(0)
    m = ref.CLIP(
        embed_dim=512, image_resolution=224, vision_layers=2, vision_width=64,
        vision_patch_size=32, context_length=77, vocab_size=49408,
        transformer_width=512, transformer_heads=8, transformer_layers=12,
    )
    m.eval().float()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    # strip the KAdaptation additions the reference bolts onto the VISUAL
    # tower (identity at init, absent from real OpenAI checkpoints)
    for k in [k for k in sd if ("adapter" in k) or ("phm_rule" in k)
              or k.endswith(".attn.b") or ("kdropout" in k)]:
        del sd[k]
    params, spec = state_dict_to_params(sd)
    assert (spec.text.width, spec.text.heads, spec.text.layers) == (512, 8, 12)
    assert spec.text.vocab_size == 49408 and spec.text.context_length == 77

    rng = np.random.default_rng(3)
    toks = rng.integers(1, 49406, (8, 77))
    toks[:, 0] = 49406  # SOT
    for i, e in enumerate(rng.integers(5, 77, 8)):
        toks[i, e] = 49407  # EOT (max id -> argmax pooling position)
    with torch.no_grad():
        want = m.encode_text(torch.tensor(toks)).numpy()
    got = np.asarray(encode_text(params, jnp.asarray(toks.astype(np.int32)), spec=spec))
    scale = float(np.abs(want).max())
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5 * scale,
                               err_msg="real-geometry text tower diverges")
