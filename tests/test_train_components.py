"""Optimizer/BN torch-parity and metric correctness tests."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from pevit_tpu.evaluation import metrics
from pevit_tpu.train.head import batch_norm, init_bn_state
from pevit_tpu.train.optim import make_optimizer, step_decay_lr


@pytest.mark.parametrize("nesterov", [False, True])
def test_sgd_matches_torch(nesterov):
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((5, 3)).astype(np.float32)
    lr, wd, mom = 0.1, 0.01, 0.9

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt = torch.optim.SGD([tp], lr=lr, momentum=mom, weight_decay=wd, nesterov=nesterov)

    init, update = make_optimizer("sgd", momentum=mom, nesterov=nesterov)
    params = {"w": jnp.asarray(p0)}
    state = init(params)

    for step in range(5):
        g = rng.standard_normal((5, 3)).astype(np.float32)
        opt.zero_grad()
        tp.grad = torch.tensor(g.copy())
        opt.step()
        params, state = update({"w": jnp.asarray(g)}, params, state, lr, wd)
        np.testing.assert_allclose(
            np.asarray(params["w"]), tp.detach().numpy(), rtol=1e-5, atol=1e-6,
            err_msg=f"step {step}",
        )


def test_adam_matches_torch():
    rng = np.random.default_rng(1)
    p0 = rng.standard_normal((4, 4)).astype(np.float32)
    lr, wd = 1e-3, 0.01

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
    init, update = make_optimizer("adam")
    params = {"w": jnp.asarray(p0)}
    state = init(params)
    for _ in range(4):
        g = rng.standard_normal((4, 4)).astype(np.float32)
        opt.zero_grad()
        tp.grad = torch.tensor(g.copy())
        opt.step()
        params, state = update({"w": jnp.asarray(g)}, params, state, lr, wd)
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_batch_norm_matches_torch_train_and_eval():
    rng = np.random.default_rng(2)
    x1 = rng.standard_normal((16, 8)).astype(np.float32)
    x2 = rng.standard_normal((16, 8)).astype(np.float32)

    tbn = torch.nn.BatchNorm1d(8, affine=False)
    tbn.train()
    ty1 = tbn(torch.tensor(x1)).detach().numpy()
    ty2 = tbn(torch.tensor(x2)).detach().numpy()
    tbn.eval()
    tye = tbn(torch.tensor(x1)).detach().numpy()

    st = init_bn_state(8)
    y1, st = batch_norm(jnp.asarray(x1), st, train=True)
    y2, st = batch_norm(jnp.asarray(x2), st, train=True)
    ye, _ = batch_norm(jnp.asarray(x1), st, train=False)

    np.testing.assert_allclose(np.asarray(y1), ty1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), ty2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st["mean"]), tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st["var"]), tbn.running_var.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ye), tye, rtol=1e-4, atol=1e-5)


def test_batch_norm_masked_equals_unpadded():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((10, 4)).astype(np.float32)
    st = init_bn_state(4)
    y_ref, st_ref = batch_norm(jnp.asarray(x), st, train=True)

    pad = np.concatenate([x, 999.0 * np.ones((6, 4), np.float32)])
    mask = jnp.asarray(np.concatenate([np.ones(10), np.zeros(6)]).astype(np.float32))
    y_pad, st_pad = batch_norm(jnp.asarray(pad), init_bn_state(4), train=True, mask=mask)

    np.testing.assert_allclose(np.asarray(y_pad)[:10], np.asarray(y_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_pad["mean"]), np.asarray(st_ref["mean"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_pad["var"]), np.asarray(st_ref["var"]), rtol=1e-5, atol=1e-6)


def test_step_decay_lr():
    assert step_decay_lr(1.0, 0, [3, 6]) == 1.0
    assert step_decay_lr(1.0, 3, [3, 6]) == pytest.approx(0.1)
    assert step_decay_lr(1.0, 7, [3, 6]) == pytest.approx(0.01)
    assert step_decay_lr(1.0, 5, []) == 1.0


def test_accuracy_and_balanced():
    y = np.array([0, 1, 1, 2])
    p = np.eye(3)[[0, 1, 0, 2]]
    assert metrics.accuracy(y, p) == pytest.approx(0.75)
    # per-class recall: 1.0, 0.5, 1.0 -> balanced 0.8333
    assert metrics.balanced_accuracy_score(y, p) == pytest.approx(5 / 6)


def test_map_11_points_perfect_and_sklearn_consistency():
    y = np.array([[1, 0], [0, 1], [1, 0], [0, 1]])
    s = np.array([[0.9, 0.1], [0.2, 0.8], [0.7, 0.3], [0.4, 0.6]])
    assert metrics.map_11_points(y, s) == pytest.approx(1.0)
    # ranking with one inversion in class 0
    s2 = np.array([[0.9, 0.1], [0.8, 0.8], [0.7, 0.3], [0.4, 0.6]])
    v = metrics.map_11_points(y, s2)
    assert 0.5 < v < 1.0


def test_roc_auc_binary_uses_positive_column():
    y = np.array([0, 0, 1, 1])
    s = np.array([[0.9, 0.1], [0.6, 0.4], [0.35, 0.65], [0.2, 0.8]])
    assert metrics.roc_auc(y, s) == pytest.approx(1.0)


def test_map_11_points_matches_independent_sklearn_reconstruction():
    """Cross-check the hand-rolled VOC 11-point mAP against an independent
    construction from sklearn's precision_recall_curve (vision_evaluation
    itself is not installable offline; sklearn is the second opinion).
    Continuous random scores -> no tie-handling ambiguity."""
    from sklearn.metrics import precision_recall_curve

    rng = np.random.default_rng(5)
    y = (rng.random((64, 6)) < 0.3).astype(np.float32)
    y[:, 0] = 0.0  # one class with no positives: skipped on both sides
    s = rng.random((64, 6)).astype(np.float64)

    aps = []
    for c in range(6):
        if not y[:, c].any():
            continue
        prec, rec, _ = precision_recall_curve(y[:, c], s[:, c])
        ap = 0.0
        for r in np.linspace(0.0, 1.0, 11):
            m = rec >= r
            ap += float(prec[m].max()) if m.any() else 0.0
        aps.append(ap / 11.0)
    want = float(np.mean(aps))

    got = metrics.map_11_points(y, s)
    assert got == pytest.approx(want, abs=1e-9)


def test_map_11_points_multiclass_onehot_equivalence():
    rng = np.random.default_rng(7)
    labels = rng.integers(0, 4, 32)
    s = rng.random((32, 4))
    onehot = np.zeros_like(s)
    onehot[np.arange(32), labels] = 1
    assert metrics.map_11_points(labels, s) == pytest.approx(
        metrics.map_11_points(onehot, s), abs=1e-12
    )
