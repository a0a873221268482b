"""Grad clipping + TWO_LR parity tests."""

import numpy as np
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
