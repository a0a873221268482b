"""Whole-training-run golden parity vs the reference torch stack.

The strongest offline accuracy-parity evidence available: N epochs of the
reference's ACTUAL training semantics — its LoRA VisionTransformer
(lora_model.py), the Classifier head (BatchNorm1d(affine=False) + Linear,
kadaptation_clip.py:128-132), CE loss, torch SGD(momentum=0.9, wd) over the
name-matched trainable partition, batch-shuffled epochs — executed by torch
itself, against OUR whole-run jitted fit on the identical data, weights and
batch order.  Final logits (eval mode, trained BN stats included) and
trained weights must agree to fp32 tolerance.

All 4 PEFT methods run whole-training-run parity: LoRA, the bottleneck
adapter and Compacter have no dropout anywhere, so their trajectories are
deterministic as-is; KAdaptation's Dropout(0.5)-on-H is forced to p=0 on
BOTH stacks (train-mode semantics otherwise intact — the dropout behaviour
itself is covered by test_kadaptation_train_dropout_statistics).
The batch order is replicated by replaying the trainer's
RNG discipline (trainer.py:305-306: per-epoch ``rng, perm_rng, drop_rng =
split(rng, 3)``); if that discipline changes, update `_trainer_perms`.
Order matters MORE than floats here: the reference's raw-reshape scramble
(quirk #4, lora_model.py:724-733 (N,B,C)->(B*H,N,hd)) mixes batch and
token axes, so the forward is NOT batch-order equivariant — a faithfully
replicated property this test depends on (both sides must see identical
batch composition AND order).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pevit_tpu.config import get_default_config
from pevit_tpu.peft import PeftConfig
from pevit_tpu.train import TaskStatic, TrainTask
from pevit_tpu.train.optim import make_optimizer
from pevit_tpu.train.trainer import build_fit_fn

from tests.test_reference_torch_parity import (
    OUT,
    RES,
    SPEC,
    _build_adapter,
    _build_compacter,
    _build_kadapt,
    _build_lora,
    torch,
)

K, N, B, EPOCHS = 4, 16, 8, 3
LR, WD = 0.01, 1e-4


def _torch_trainable(method, vt):
    """The reference's name-substring freeze predicate
    (kadaptation_clip.py:118-122, adapter_tuning_clip.py:116,
    lora_clip.py:120, compacter_clip.py:122)."""
    if method == "compacter":
        pred = lambda n: "compacter" in n  # shared transformer.phm_rule stays frozen
    elif method == "kadaptation":
        pred = lambda n: ("adapter" in n) or ("phm_rule" in n) or ("attn.b" in n)
    else:
        pred = lambda n: "adapter" in n
    return [p for n, p in vt.named_parameters() if pred(n)]


def _trainer_perms(seed_key, n, epochs):
    """Replay the fit's per-epoch shuffle (trainer.py:305-306)."""
    rng = seed_key
    perms = []
    for _ in range(epochs):
        rng, perm_rng, _ = jax.random.split(rng, 3)
        perms.append(np.asarray(jax.random.permutation(perm_rng, n)))
    return perms


@pytest.mark.slow
@pytest.mark.parametrize(
    "method,builder",
    [
        ("lora", _build_lora),
        ("adapter", _build_adapter),
        ("compacter", _build_compacter),
        ("kadaptation", _build_kadapt),
    ],
)
def test_full_training_run_matches_reference_stack(tmp_path, method, builder):
    """LoRA, adapter and Compacter have no dropout anywhere; KAdaptation's
    only stochastic piece is Dropout(0.5) on the weight matrix H
    (model.py:516), which both sides force to p=0 here (train-mode semantics
    otherwise intact; the dropout itself is covered by
    test_kadaptation_train_dropout_statistics)."""
    vt, params, peft = builder()  # reference torch model + converted trees
    if method == "kadaptation":
        for blk in vt.transformer.resblocks:
            blk.attn.kdropout.p = 0.0

    cfg = get_default_config()
    cfg.defrost()
    cfg.DATASET.NUM_CLASSES = K
    cfg.TRAIN.BATCH_SIZE_PER_GPU = B
    cfg.TRAIN.IMAGE_SIZE = [RES, RES]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()

    peft_cfg = (
        PeftConfig(method="kadaptation", kadapt_dropout_p=0.0)
        if method == "kadaptation"
        else PeftConfig(method=method)
    )
    static = TaskStatic.from_config(cfg, SPEC, peft_cfg)
    task = TrainTask(cfg, static, params)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(1))
    # inject the reference's exact PEFT parameters into the right partitions
    trainable["peft"]["layers"] = peft["layers"]
    if method == "kadaptation":
        trainable["peft"]["shared"] = peft["shared"]
    elif method == "compacter":
        # the shared phm_rule is FROZEN (name 'transformer.phm_rule' misses
        # the 'compacter' substring match — peft/base.py docstring)
        frozen["peft"]["shared"] = peft["shared"]

    rng = np.random.default_rng(11)
    images_u8 = rng.integers(0, 255, (N, RES, RES, 3), dtype=np.uint8)
    labels = rng.integers(0, K, (N,)).astype(np.int64)

    # ---- our side: ONE whole-run dispatch -------------------------------
    fit = jax.jit(build_fit_fn(static, N, EPOCHS, task.preproc))
    opt_init, _ = make_optimizer("sgd")
    state = (trainable, opt_init(trainable), bn_state, jax.random.PRNGKey(2))
    lr_table = jnp.full((EPOCHS,), LR, jnp.float32)
    state = fit(
        frozen, jnp.asarray(images_u8), jnp.asarray(labels.astype(np.int32)),
        state, lr_table, jnp.float32(WD),
    )
    trained, _, bn_trained, _ = state

    # ---- reference side: eager torch, identical everything --------------
    mean = np.asarray(task.preproc["mean"], np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(task.preproc["std"], np.float32).reshape(1, 3, 1, 1)
    x_all = torch.from_numpy(
        (images_u8.astype(np.float32) / 255.0).transpose(0, 3, 1, 2)
    )
    x_all = (x_all - torch.from_numpy(mean)) / torch.from_numpy(std)
    y_all = torch.from_numpy(labels)

    bn = torch.nn.BatchNorm1d(OUT, affine=False)  # kadaptation_clip.py:128-131
    lin = torch.nn.Linear(OUT, K)
    with torch.no_grad():  # same head init as ours
        lin.weight.copy_(torch.from_numpy(np.asarray(trainable["head"]["linear"]["kernel"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(trainable["head"]["linear"]["bias"])))

    vt.train()
    bn.train()
    train_params = _torch_trainable(method, vt)
    train_params += list(lin.parameters())
    # mirror the fit's optimizer settings exactly (config defaults include
    # nesterov=True — reference config/default.py parity)
    opt = torch.optim.SGD(
        train_params, lr=LR, momentum=static.momentum,
        weight_decay=WD, nesterov=static.nesterov,
    )
    ce = torch.nn.CrossEntropyLoss()

    for perm in _trainer_perms(jax.random.PRNGKey(2), N, EPOCHS):
        for s in range(0, N, B):
            idx = perm[s : s + B]
            opt.zero_grad()
            logits = lin(bn(vt(x_all[idx])))
            ce(logits, y_all[idx]).backward()
            opt.step()

    # ---- compare trained state + eval logits ----------------------------
    np.testing.assert_allclose(
        np.asarray(trained["head"]["linear"]["kernel"]), lin.weight.detach().numpy().T,
        rtol=2e-3, atol=2e-4, err_msg="trained head kernel diverges",
    )
    if method == "lora":
        a0 = vt.transformer.resblocks[0].attn
        peft_compares = [
            ("q_b", trained["peft"]["layers"]["q_b"][0], a0.q_proj_adapter2.weight.detach().numpy().T),
            ("v_a", trained["peft"]["layers"]["v_a"][0], a0.v_proj_adapter1.weight.detach().numpy().T),
        ]
    elif method == "adapter":
        ad0 = vt.transformer.resblocks[0].adapter
        peft_compares = [
            ("down_kernel", trained["peft"]["layers"]["down_kernel"][0], ad0.adapter_down[1].weight.detach().numpy().T),
            ("up_bias", trained["peft"]["layers"]["up_bias"][0], ad0.adapter_up.bias.detach().numpy()),
        ]
    elif method == "compacter":
        c0 = vt.transformer.resblocks[0].compacter
        peft_compares = [
            ("down_w_left", trained["peft"]["layers"]["down_w_left"][0], c0.adapter_down[1].W_left.detach().numpy()),
            ("up_w_right", trained["peft"]["layers"]["up_w_right"][0], c0.adapter_up.W_right.detach().numpy()),
            # frozen shared phm_rule must be untouched on both sides
            ("shared phm_rule (frozen)", frozen["peft"]["shared"]["phm_rule"], vt.transformer.phm_rule.detach().numpy()),
        ]
    else:  # kadaptation — v factors are trained-but-unused (quirk #1): torch
        # gives them no grad at all (SGD skips them entirely, including weight
        # decay), ours decays them with exact-zero grads; both are
        # accuracy-irrelevant, so compare the leaves that DO move.
        a0 = vt.transformer.resblocks[0].attn
        tr = vt.transformer
        peft_compares = [
            ("layer0 b", trained["peft"]["layers"]["b"][0], a0.b.detach().numpy()),
            ("layer0 q_left", trained["peft"]["layers"]["q_left"][0], a0.q_proj_adapter1_left.detach().numpy()),
            ("shared phm_rule1_left", trained["peft"]["shared"]["phm_rule1_left"], tr.phm_rule1_left.detach().numpy()),
            ("shared phm_rule2_right", trained["peft"]["shared"]["phm_rule2_right"], tr.phm_rule2_right.detach().numpy()),
        ]
    for what, ours, ref in peft_compares:
        np.testing.assert_allclose(
            np.asarray(ours), ref, rtol=2e-3, atol=2e-4,
            err_msg=f"trained {what} diverges",
        )
    np.testing.assert_allclose(
        np.asarray(bn_trained["mean"]), bn.running_mean.detach().numpy(),
        rtol=2e-3, atol=2e-4, err_msg="BN running mean diverges",
    )

    vt.eval(); bn.eval()
    x_test = rng.integers(0, 255, (8, RES, RES, 3), dtype=np.uint8)
    with torch.no_grad():
        xt = torch.from_numpy((x_test.astype(np.float32) / 255.0).transpose(0, 3, 1, 2))
        xt = (xt - torch.from_numpy(mean)) / torch.from_numpy(std)
        ref_logits = lin(bn(vt(xt))).numpy()

    from pevit_tpu.train.partition import combine
    from pevit_tpu.train.trainer import model_forward

    bundle = combine(trained, frozen)
    ours_logits, _ = model_forward(
        static, bundle, bn_trained, jnp.asarray(x_test), task.preproc,
        train=False, rng=None, mask=None,
    )
    np.testing.assert_allclose(
        np.asarray(ours_logits), ref_logits, rtol=2e-3, atol=5e-4,
        err_msg="post-training eval logits diverge from the reference stack",
    )


@pytest.mark.slow
@pytest.mark.parametrize("method", ["full_finetune", "linear_probe"])
def test_full_finetune_whole_run_matches_reference_stack(method):
    """full_model_finetune semantics, whole run: the VISUAL tower trains
    (text/logit_scale frozen — full_model_finetune.py:85-99; for the
    linear-probe flavor TRAIN.FREEZE_IMAGE_BACKBONE freezes it all,
    :88-99, and only BN+Linear train), the
    Classifier forward multiplies by logit_scale.exp() (:156, here
    LOGIT_SCALE_INIT='clip' so the multiply actually bites), and global
    grad-norm clipping applies (:327-328, max_norm small enough to be
    ACTIVE every step).

    The reference backbone is model.py's VisionTransformer with every
    KAdaptation addition zeroed AND excluded from the optimizer: the
    identity-at-init quirk makes that bit-equal to the plain pip-clip ViT
    the reference's get_model builds (the pip `clip` package is absent
    offline), while the trainable set matches pip-clip's visual params
    exactly."""
    from tests.test_reference_torch_parity import (
        HEADS, LAYERS, PATCH, W, _load_ref, _visual_params,
    )

    ref = _load_ref("model")
    torch.manual_seed(3)
    vt = ref.VisionTransformer(RES, PATCH, W, LAYERS, HEADS, OUT)
    kad = lambda n: ("adapter" in n) or ("phm_rule" in n) or ("attn.b" in n)
    with torch.no_grad():
        for n, p in vt.named_parameters():
            if kad(n):
                p.zero_()
                p.requires_grad = False
    for blk in vt.transformer.resblocks:
        blk.attn.kdropout.p = 0.0  # dropout on an all-zero H is inert anyway
    if method == "linear_probe":
        for p_ in vt.parameters():  # FREEZE_IMAGE_BACKBONE: the whole tower
            p_.requires_grad = False

    params = _visual_params(vt, LAYERS)

    cfg = get_default_config()
    cfg.defrost()
    cfg.DATASET.NUM_CLASSES = K
    cfg.TRAIN.BATCH_SIZE_PER_GPU = B
    cfg.TRAIN.IMAGE_SIZE = [RES, RES]
    cfg.TRAIN.LOGIT_SCALE_INIT = "clip"   # exp(ln(1/0.07)) ~ 14.3x on logits
    cfg.TRAIN.CLIP_GRAD_NORM = 0.05       # small enough to clip EVERY step
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()

    static = TaskStatic.from_config(cfg, SPEC, PeftConfig(method=method))
    assert static.clip_grad_norm == 0.05
    task = TrainTask(cfg, static, params)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(1))
    if method == "full_finetune":
        assert "visual" in trainable["clip"], "full_finetune must train the visual tower"
    else:  # partition keeps structure with None leaves: none may be live
        assert not jax.tree.leaves(trainable.get("clip")), \
            "linear_probe must freeze the tower"

    rng = np.random.default_rng(13)
    images_u8 = rng.integers(0, 255, (N, RES, RES, 3), dtype=np.uint8)
    labels = rng.integers(0, K, (N,)).astype(np.int64)

    lr = 0.003  # logit-scale-amplified gradients: keep the trajectory sane
    fit = jax.jit(build_fit_fn(static, N, EPOCHS, task.preproc))
    opt_init, _ = make_optimizer("sgd")
    state = (trainable, opt_init(trainable), bn_state, jax.random.PRNGKey(2))
    lr_table = jnp.full((EPOCHS,), lr, jnp.float32)
    state = fit(
        frozen, jnp.asarray(images_u8), jnp.asarray(labels.astype(np.int32)),
        state, lr_table, jnp.float32(WD),
    )
    trained = state[0]

    # ---- reference side: eager torch, identical everything --------------
    mean = np.asarray(task.preproc["mean"], np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(task.preproc["std"], np.float32).reshape(1, 3, 1, 1)
    x_all = torch.from_numpy(
        (images_u8.astype(np.float32) / 255.0).transpose(0, 3, 1, 2)
    )
    x_all = (x_all - torch.from_numpy(mean)) / torch.from_numpy(std)
    y_all = torch.from_numpy(labels)

    bn = torch.nn.BatchNorm1d(OUT, affine=False)
    lin = torch.nn.Linear(OUT, K)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(trainable["head"]["linear"]["kernel"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(trainable["head"]["linear"]["bias"])))
    # TRAINABLE_LOGIT_SCALE=False -> logit_scale sits in the FROZEN partition
    logit_scale = float(np.exp(np.asarray(frozen["head"]["logit_scale"])))
    assert abs(logit_scale - 1 / 0.07) < 1e-3

    vt.train()
    bn.train()
    train_params = [p for _, p in vt.named_parameters() if p.requires_grad]
    train_params += list(lin.parameters())
    opt = torch.optim.SGD(
        train_params, lr=lr, momentum=static.momentum,
        weight_decay=WD, nesterov=static.nesterov,
    )
    ce = torch.nn.CrossEntropyLoss()

    for perm in _trainer_perms(jax.random.PRNGKey(2), N, EPOCHS):
        for s in range(0, N, B):
            idx = perm[s : s + B]
            opt.zero_grad()
            logits = logit_scale * lin(bn(vt(x_all[idx])))
            ce(logits, y_all[idx]).backward()
            torch.nn.utils.clip_grad_norm_(train_params, 0.05)
            opt.step()

    # ---- compare the trained state across the whole tree ----------------
    ref_after = _visual_params(vt, LAYERS)["visual"]
    ours_after = (trained if method == "full_finetune" else frozen)["clip"]["visual"]
    for what, ours, refv in [
        ("patch_embed kernel", ours_after["patch_embed"]["kernel"], ref_after["patch_embed"]["kernel"]),
        ("class_embedding", ours_after["class_embedding"], ref_after["class_embedding"]),
        ("block in_proj kernel", ours_after["blocks"]["attn"]["in_proj"]["kernel"], ref_after["blocks"]["attn"]["in_proj"]["kernel"]),
        ("block mlp c_fc kernel", ours_after["blocks"]["mlp"]["c_fc"]["kernel"], ref_after["blocks"]["mlp"]["c_fc"]["kernel"]),
        ("ln_post scale", ours_after["ln_post"]["scale"], ref_after["ln_post"]["scale"]),
        ("visual proj", ours_after["proj"], ref_after["proj"]),
        ("head kernel", trained["head"]["linear"]["kernel"], np.asarray(lin.weight.detach().numpy().T)),
    ]:
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(refv), rtol=2e-3, atol=2e-4,
            err_msg=f"full_finetune trained {what} diverges from the reference stack",
        )
    # the zeroed reference-only params stayed zero (excluded from the opt)
    for n, p in vt.named_parameters():
        if kad(n):
            assert not p.detach().abs().max().item(), f"{n} moved"


@pytest.mark.slow
@pytest.mark.parametrize("multilabel", [False, True])
def test_partial_batch_whole_run_parity(multilabel):
    """The MASKED tail-batch path gets golden coverage: N=12 with B=8 makes
    every epoch end in a 4-example batch, so the masked CE/BCE mean and the
    masked BatchNorm statistics (trainer._loss / the masked BN update) must
    reproduce torch's natural small-batch semantics (the reference keeps any
    tail batch larger than 1 — full_model_finetune.py:311).  The multilabel
    arm runs the BCEWithLogitsLoss path (kadaptation_clip.py:273-274) on
    multi-hot targets.  LoRA keeps the run deterministic."""
    n_part = 12
    vt, params, peft = _build_lora()

    cfg = get_default_config()
    cfg.defrost()
    cfg.DATASET.NUM_CLASSES = K
    if multilabel:
        cfg.DATASET.DATASET = "voc-2007-classification"  # flips static.multilabel
        cfg.TEST.METRIC = "11point_mAP"
    cfg.TRAIN.BATCH_SIZE_PER_GPU = B
    cfg.TRAIN.IMAGE_SIZE = [RES, RES]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()

    static = TaskStatic.from_config(cfg, SPEC, PeftConfig(method="lora"))
    assert static.multilabel == multilabel
    task = TrainTask(cfg, static, params)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(1))
    trainable["peft"]["layers"] = peft["layers"]

    rng = np.random.default_rng(17)
    images_u8 = rng.integers(0, 255, (n_part, RES, RES, 3), dtype=np.uint8)
    if multilabel:
        labels_np = (rng.random((n_part, K)) < 0.4).astype(np.float32)
        labels_np[:, 0] = 1.0  # no all-zero rows
        labels_dev = jnp.asarray(labels_np)
    else:
        labels_np = rng.integers(0, K, (n_part,)).astype(np.int64)
        labels_dev = jnp.asarray(labels_np.astype(np.int32))

    fit = jax.jit(build_fit_fn(static, n_part, EPOCHS, task.preproc))
    opt_init, _ = make_optimizer("sgd")
    state = (trainable, opt_init(trainable), bn_state, jax.random.PRNGKey(2))
    lr_table = jnp.full((EPOCHS,), LR, jnp.float32)
    state = fit(frozen, jnp.asarray(images_u8), labels_dev, state, lr_table, jnp.float32(WD))
    trained = state[0]

    # ---- torch side: natural small tail batches --------------------------
    mean = np.asarray(task.preproc["mean"], np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(task.preproc["std"], np.float32).reshape(1, 3, 1, 1)
    x_all = torch.from_numpy(
        (images_u8.astype(np.float32) / 255.0).transpose(0, 3, 1, 2)
    )
    x_all = (x_all - torch.from_numpy(mean)) / torch.from_numpy(std)
    y_all = torch.from_numpy(labels_np)

    bn = torch.nn.BatchNorm1d(OUT, affine=False)
    lin = torch.nn.Linear(OUT, K)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(trainable["head"]["linear"]["kernel"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(trainable["head"]["linear"]["bias"])))

    vt.train()
    bn.train()
    train_params = _torch_trainable("lora", vt) + list(lin.parameters())
    opt = torch.optim.SGD(train_params, lr=LR, momentum=static.momentum,
                          weight_decay=WD, nesterov=static.nesterov)
    crit = torch.nn.BCEWithLogitsLoss() if multilabel else torch.nn.CrossEntropyLoss()

    for perm in _trainer_perms(jax.random.PRNGKey(2), n_part, EPOCHS):
        for s in range(0, n_part, B):
            idx = perm[s : s + B]  # last batch has 4 rows
            opt.zero_grad()
            logits = lin(bn(vt(x_all[idx])))
            crit(logits, y_all[idx]).backward()
            opt.step()

    a0 = vt.transformer.resblocks[0].attn
    for what, ours, refv in [
        ("head kernel", trained["head"]["linear"]["kernel"], lin.weight.detach().numpy().T),
        ("lora q_b", trained["peft"]["layers"]["q_b"][0], a0.q_proj_adapter2.weight.detach().numpy().T),
    ]:
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(refv), rtol=2e-3, atol=2e-4,
            err_msg=f"partial-batch {what} diverges (multilabel={multilabel})",
        )


@pytest.mark.slow
def test_swin_backbone_whole_run_matches_reference_stack():
    """Whole-run golden parity with a SWIN backbone: N epochs of the
    reference's ACTUAL cls_swin SwinTransformer (cls_swin.py:475-681,
    num_classes=0 -> pooled features) under the full_model_finetune
    semantics (Classifier BN+Linear, logit_scale multiply, active global
    grad clip, SGD momentum+nesterov+wd), eager torch vs OUR whole-run
    jitted fit over the generic-Backbone path.

    The geometry exercises both r5 swin parity fix sites INSIDE a training
    loop at drifting (trained) magnitudes: stage 0 res 8 > window 4 has a
    real shifted block + region mask; stage 1 res 4 == window is the
    reference-clamped single-window case (cls_swin.py:198-201)."""
    from tests.test_cls_swin_parity import load_ref_cls_swin
    from pevit_tpu.models import Backbone
    from pevit_tpu.models.swin import swin_forward_features, swin_state_dict_to_params
    import dataclasses as _dc

    try:
        ref_cls_swin = load_ref_cls_swin()
    except Exception as e:
        pytest.skip(f"reference cls_swin not importable: {e}")

    IMG, KC, NS, BS, EP = 32, 4, 16, 8, 3
    torch.manual_seed(21)
    vt = ref_cls_swin.SwinTransformer(
        img_size=IMG, patch_size=4, in_chans=3, num_classes=0, embed_dim=16,
        depths=[2, 1], num_heads=[2, 2], window_size=4, mlp_ratio=4.0,
        qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0, ape=False, patch_norm=True,
    )
    assert [b.shift_size for layer in vt.layers for b in layer.blocks] == [0, 2, 0]
    sd = {k: v.detach().numpy() for k, v in vt.state_dict().items()}
    params, sspec = swin_state_dict_to_params(sd)
    sspec = _dc.replace(sspec, img_size=IMG)
    feat_dim = 32  # embed 16 * 2 stages

    bb = Backbone(
        name="cls_swin_parity", params=params, feat_dim=feat_dim,
        forward_features=lambda p, x: swin_forward_features(p, x, spec=sspec),
    )
    cfg = get_default_config()
    cfg.defrost()
    cfg.DATASET.NUM_CLASSES = KC
    cfg.TRAIN.BATCH_SIZE_PER_GPU = BS
    cfg.TRAIN.IMAGE_SIZE = [IMG, IMG]
    cfg.TRAIN.LOGIT_SCALE_INIT = "clip"
    cfg.TRAIN.CLIP_GRAD_NORM = 0.05
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()

    from pevit_tpu.core import CLIPSpec

    static = TaskStatic.from_config(
        cfg, CLIPSpec(embed_dim=feat_dim), PeftConfig(method="full_finetune"), feat_dim=feat_dim
    )
    task = TrainTask(cfg, static, None, backbone=bb, eval_chunk=16)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(1))
    assert trainable["clip"], "full_finetune must train the swin backbone"

    rng = np.random.default_rng(17)
    images_u8 = rng.integers(0, 255, (NS, IMG, IMG, 3), dtype=np.uint8)
    labels = rng.integers(0, KC, (NS,)).astype(np.int64)

    lr = 0.003
    fwd = task._forward_fn
    fit = jax.jit(build_fit_fn(static, NS, EP, task.preproc, forward_fn=fwd))
    opt_init, _ = make_optimizer("sgd")
    state = (trainable, opt_init(trainable), bn_state, jax.random.PRNGKey(2))
    lr_table = jnp.full((EP,), lr, jnp.float32)
    state = fit(
        frozen, jnp.asarray(images_u8), jnp.asarray(labels.astype(np.int32)),
        state, lr_table, jnp.float32(WD),
    )
    trained, _, bn_trained, _ = state

    # ---- reference side: eager torch, identical everything --------------
    logit_scale = float(np.exp(np.asarray(frozen["head"]["logit_scale"])))
    assert abs(logit_scale - 1 / 0.07) < 1e-3

    mean = np.asarray(task.preproc["mean"], np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(task.preproc["std"], np.float32).reshape(1, 3, 1, 1)
    x_all = torch.from_numpy(
        (images_u8.astype(np.float32) / 255.0).transpose(0, 3, 1, 2)
    )
    x_all = (x_all - torch.from_numpy(mean)) / torch.from_numpy(std)
    y_all = torch.from_numpy(labels)

    bn = torch.nn.BatchNorm1d(feat_dim, affine=False)
    lin = torch.nn.Linear(feat_dim, KC)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(trainable["head"]["linear"]["kernel"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(trainable["head"]["linear"]["bias"])))

    vt.train()
    bn.train()
    train_params = list(vt.parameters()) + list(lin.parameters())
    opt = torch.optim.SGD(
        train_params, lr=lr, momentum=static.momentum,
        weight_decay=WD, nesterov=static.nesterov,
    )
    ce = torch.nn.CrossEntropyLoss()
    for perm in _trainer_perms(jax.random.PRNGKey(2), NS, EP):
        for s in range(0, NS, BS):
            idx = perm[s : s + BS]
            opt.zero_grad()
            logits = logit_scale * lin(bn(vt(x_all[idx])))
            ce(logits, y_all[idx]).backward()
            torch.nn.utils.clip_grad_norm_(train_params, 0.05)
            opt.step()

    # ---- compare trained weights (shifted block = old bug site) ---------
    tsd = {k: v.detach().numpy() for k, v in vt.state_dict().items()}
    c = trained["clip"]
    for what, ours, refv in [
        ("patch_embed kernel", c["patch_embed"]["kernel"],
         tsd["patch_embed.proj.weight"].transpose(2, 3, 1, 0).reshape(4 * 4 * 3, 16)),
        ("stage0 SHIFTED block qkv", c["stages"][0]["blocks"][1]["qkv"]["kernel"],
         tsd["layers.0.blocks.1.attn.qkv.weight"].T),
        ("stage0 SHIFTED block rel_bias", c["stages"][0]["blocks"][1]["rel_bias"],
         tsd["layers.0.blocks.1.attn.relative_position_bias_table"]),
        ("downsample reduction", c["stages"][0]["downsample"]["reduction"]["kernel"],
         tsd["layers.0.downsample.reduction.weight"].T),
        ("final norm scale", c["norm"]["scale"], tsd["norm.weight"]),
        ("head kernel", trained["head"]["linear"]["kernel"],
         np.asarray(lin.weight.detach().numpy().T)),
    ]:
        np.testing.assert_allclose(
            np.asarray(ours), refv, rtol=2e-3, atol=2e-4,
            err_msg=f"swin whole-run trained {what} diverges",
        )
    np.testing.assert_allclose(
        np.asarray(bn_trained["mean"]), bn.running_mean.detach().numpy(),
        rtol=2e-3, atol=2e-4, err_msg="BN running mean diverges",
    )

    # ---- eval logits on fresh images ------------------------------------
    vt.eval(); bn.eval()
    x_test = rng.integers(0, 255, (8, IMG, IMG, 3), dtype=np.uint8)
    with torch.no_grad():
        xt = torch.from_numpy((x_test.astype(np.float32) / 255.0).transpose(0, 3, 1, 2))
        xt = (xt - torch.from_numpy(mean)) / torch.from_numpy(std)
        ref_logits = (logit_scale * lin(bn(vt(xt)))).numpy()

    from pevit_tpu.train.partition import combine
    from pevit_tpu.train.trainer import model_forward

    bundle = combine(trained, frozen)
    ours_logits, _ = model_forward(
        static, bundle, bn_trained, jnp.asarray(x_test), task.preproc,
        train=False, rng=None, mask=None, forward_fn=fwd,
    )
    np.testing.assert_allclose(
        np.asarray(ours_logits), ref_logits, rtol=2e-3, atol=5e-4,
        err_msg="swin whole-run eval logits diverge from the reference stack",
    )
