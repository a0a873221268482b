"""Grad clipping + TWO_LR parity tests."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from pevit_tpu.train.optim import clip_grad_norm, make_optimizer


def test_clip_grad_norm_matches_torch():
    rng = np.random.default_rng(0)
    g1 = rng.standard_normal((4, 4)).astype(np.float32) * 3
    g2 = rng.standard_normal((7,)).astype(np.float32) * 3

    t1 = torch.nn.Parameter(torch.zeros(4, 4)); t1.grad = torch.tensor(g1.copy())
    t2 = torch.nn.Parameter(torch.zeros(7)); t2.grad = torch.tensor(g2.copy())
    torch.nn.utils.clip_grad_norm_([t1, t2], max_norm=1.0)

    clipped = clip_grad_norm({"a": jnp.asarray(g1), "b": jnp.asarray(g2)}, 1.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]), t1.grad.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(clipped["b"]), t2.grad.numpy(), rtol=1e-4, atol=1e-6)

    # under the norm: untouched
    small = clip_grad_norm({"a": jnp.asarray(g1) * 1e-4}, 1.0)
    np.testing.assert_allclose(np.asarray(small["a"]), g1 * 1e-4, rtol=1e-5)


def test_two_lr_sgd_matches_torch_param_groups():
    rng = np.random.default_rng(1)
    trunk0 = rng.standard_normal((3, 3)).astype(np.float32)
    head0 = rng.standard_normal((3,)).astype(np.float32)
    lr, wd, mom = 0.1, 0.01, 0.9

    tt = torch.nn.Parameter(torch.tensor(trunk0.copy()))
    th = torch.nn.Parameter(torch.tensor(head0.copy()))
    # reference optim/build.py:110-117: trunk at lr*0.1, head at lr
    opt = torch.optim.SGD(
        [{"params": [tt]}, {"params": [th], "lr": lr}],
        lr=lr * 0.1, momentum=mom, weight_decay=wd, nesterov=False,
    )

    scales = {"clip": 0.1, "head": 1.0}
    init, update = make_optimizer("sgd", momentum=mom, nesterov=False, lr_scales=scales)
    params = {"clip": jnp.asarray(trunk0), "head": jnp.asarray(head0)}
    state = init(params)

    for _ in range(3):
        gt = rng.standard_normal((3, 3)).astype(np.float32)
        gh = rng.standard_normal((3,)).astype(np.float32)
        opt.zero_grad(); tt.grad = torch.tensor(gt.copy()); th.grad = torch.tensor(gh.copy())
        opt.step()
        params, state = update({"clip": jnp.asarray(gt), "head": jnp.asarray(gh)}, params, state, lr, wd)

    np.testing.assert_allclose(np.asarray(params["clip"]), tt.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["head"]), th.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_wd_mask_rules_and_torch_group_parity():
    """WITHOUT_WD_LIST=['ln','bias'] reproduces torch's two-param-group
    behaviour (reference optim/build.py:18-85): ln scale/bias + all biases
    decay-free, everything else decays."""
    from pevit_tpu.train.optim import build_wd_mask, sgd_init

    rng = np.random.default_rng(2)
    params = {
        "head": {"kernel": jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32)),
                 "bias": jnp.asarray(rng.standard_normal(3).astype(np.float32))},
        "ln_final": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
    }
    mask = build_wd_mask(params, ["ln", "bias"])
    assert mask["head"]["kernel"] == 1.0
    assert mask["head"]["bias"] == 0.0
    assert mask["ln_final"]["scale"] == 0.0 and mask["ln_final"]["bias"] == 0.0
    assert build_wd_mask(params, []) is None  # reference default: no masking

    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.1, params)
    init, upd = make_optimizer("sgd", momentum=0.9, nesterov=False, wd_mask=mask)
    new_p, _ = upd(grads, params, init(params), 0.5, 0.7)

    # torch: decayed group [head.kernel], wd=0 group [head.bias, ln.*]
    tp = {k2: torch.nn.Parameter(torch.tensor(np.asarray(v)))
          for k, sub in params.items() for k2, v in [(f"{k}.{kk}", vv) for kk, vv in sub.items()]}
    for p in tp.values():
        p.grad = torch.full_like(p, 0.1)
    opt = torch.optim.SGD(
        [{"params": [tp["head.kernel"]]},
         {"params": [tp["head.bias"], tp["ln_final.scale"], tp["ln_final.bias"]], "weight_decay": 0.0}],
        lr=0.5, momentum=0.9, weight_decay=0.7)
    opt.step()
    np.testing.assert_allclose(np.asarray(new_p["head"]["kernel"]), tp["head.kernel"].detach().numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_p["head"]["bias"]), tp["head.bias"].detach().numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_p["ln_final"]["scale"]), tp["ln_final.scale"].detach().numpy(), rtol=1e-5)


def test_wd_mask_adamw_decoupled():
    """Masked adamw leaf takes the wd=0 trajectory exactly."""
    params = {"w": jnp.ones((3,)), "bias": jnp.ones((3,))}
    grads = {"w": jnp.full((3,), 0.2), "bias": jnp.full((3,), 0.2)}
    from pevit_tpu.train.optim import build_wd_mask

    mask = build_wd_mask(params, ["bias"])
    init, upd = make_optimizer("adamw", wd_mask=mask)
    p1, _ = upd(grads, params, init(params), 0.1, 0.5)
    init0, upd0 = make_optimizer("adamw")
    p_wd, _ = upd0(grads, params, init0(params), 0.1, 0.5)
    p_nowd, _ = upd0(grads, params, init0(params), 0.1, 0.0)
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p_wd["w"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p1["bias"]), np.asarray(p_nowd["bias"]), rtol=1e-6)


def test_timm_optimizer_resolution():
    """TRAIN.OPTIMIZER='timm' + OPTIMIZER_ARGS routes onto native optimizers
    (reference optim/build.py:89-95)."""
    from pevit_tpu.config import get_default_config
    from pevit_tpu.train.trainer import _resolve_optimizer

    cfg = get_default_config()
    cfg.TRAIN.OPTIMIZER = "timm"
    cfg.TRAIN.OPTIMIZER_ARGS.update({"opt": "adamw"})
    assert _resolve_optimizer(cfg)[0] == "adamw"
    assert _resolve_optimizer(cfg)[3] is True  # filter_bias_and_bn default

    cfg.TRAIN.OPTIMIZER_ARGS.update({"opt": "sgd", "momentum": 0.8})
    name, momentum, nesterov, _ = _resolve_optimizer(cfg)
    assert (name, momentum, nesterov) == ("sgd", 0.8, True)  # timm sgd IS nesterov

    cfg.TRAIN.OPTIMIZER_ARGS.update({"opt": "not_an_opt"})
    try:
        _resolve_optimizer(cfg)
        assert False, "unknown timm opt must raise"
    except ValueError:
        pass

    cfg.TRAIN.OPTIMIZER = "sgd"
    assert _resolve_optimizer(cfg)[0] == "sgd"
