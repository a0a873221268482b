"""Linear probe / finetune over non-CLIP backbones + MERGE_ENCODER_AND_HEAD_PROJ."""

import numpy as np
import jax
import jax.numpy as jnp

from pevit_tpu.config import get_default_config
from pevit_tpu.core import CLIPSpec, TextSpec, VisionSpec, init_clip_params
from pevit_tpu.models import Backbone, ViTSpec, init_vit_params, vit_forward_features
from pevit_tpu.peft import PeftConfig
from pevit_tpu.train import TaskStatic, TrainTask


def synth(n, n_classes=3, size=32, seed=0):
    rng = np.random.default_rng(seed)
    base = np.array([[220, 40, 40], [40, 220, 40], [40, 40, 220]], np.float32)
    ys = rng.integers(0, n_classes, n)
    xs = np.clip(base[ys][:, None, None, :] + rng.normal(0, 25, (n, size, size, 3)), 0, 255)
    return jnp.asarray(xs.astype(np.uint8)), jnp.asarray(ys.astype(np.int32))


def _cfg(n_classes=3):
    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = n_classes
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 8
    cfg.TEST.METRIC = "accuracy"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.USE_PALLAS_ATTENTION = False
    return cfg


def test_linear_probe_over_generic_vit_backbone():
    spec = ViTSpec(input_resolution=32, patch_size=16, width=64, layers=2, heads=2)
    params = init_vit_params(jax.random.PRNGKey(0), spec)
    bb = Backbone(
        name="mocov3_test", params=params, feat_dim=64,
        forward_features=lambda p, x: vit_forward_features(p, x, spec=spec),
    )
    cfg = _cfg()
    static = TaskStatic.from_config(
        cfg, CLIPSpec(embed_dim=64), PeftConfig(method="linear_probe"), feat_dim=64
    )
    task = TrainTask(cfg, static, None, backbone=bb, eval_chunk=16)
    tx, ty = synth(24, seed=0)
    vx, vy = synth(12, seed=1)
    res = task.train_trials([(0.05, 1e-4)], tx, ty, vx, vy, end_epoch=6, seed=0)[0]
    assert res["best_score"] > 50.0, res
    info = task.model_info(task.init_bundle(jax.random.PRNGKey(0))[0])
    assert info["n_trainable_params"] == 64 * 3 + 3  # head only


def test_full_finetune_over_generic_backbone_trains_backbone():
    spec = ViTSpec(input_resolution=32, patch_size=16, width=64, layers=1, heads=2)
    params = init_vit_params(jax.random.PRNGKey(0), spec)
    bb = Backbone(
        name="vit_test", params=params, feat_dim=64,
        forward_features=lambda p, x: vit_forward_features(p, x, spec=spec),
    )
    cfg = _cfg()
    static = TaskStatic.from_config(
        cfg, CLIPSpec(embed_dim=64), PeftConfig(method="full_finetune"), feat_dim=64
    )
    task = TrainTask(cfg, static, None, backbone=bb, eval_chunk=16)
    trainable, frozen, _ = task.init_bundle(jax.random.PRNGKey(0))
    from pevit_tpu.train import count_params

    # all backbone params trainable
    assert count_params(trainable) > count_params({"head": trainable["head"]})
    tx, ty = synth(16, seed=2)
    res = task.train_trials([(0.01, 1e-4)], tx, ty, tx, ty, end_epoch=3, seed=0)[0]
    assert res["best_score"] > 40.0


def test_merge_encoder_and_head_proj():
    tiny = CLIPSpec(
        embed_dim=32,
        vision=VisionSpec(input_resolution=32, patch_size=16, width=64, layers=2, heads=2, output_dim=32),
        text=TextSpec(context_length=8, vocab_size=64, width=32, heads=2, layers=2, output_dim=32),
    )
    clip_params = init_clip_params(jax.random.PRNGKey(0), tiny)
    cfg = _cfg()
    cfg.TRAIN.MERGE_ENCODER_AND_HEAD_PROJ = True

    # text-init weights in embed space (E=32, K=3)
    zs = np.random.default_rng(0).standard_normal((32, 3)).astype(np.float32)
    static = TaskStatic.from_config(cfg, tiny, PeftConfig(method="linear_probe"))
    assert static.head_dim == 64  # width, not embed_dim
    task = TrainTask(cfg, static, clip_params, text_init_weights=zs, eval_chunk=16)
    trainable, frozen, bn = task.init_bundle(jax.random.PRNGKey(1))
    # folded kernel = proj @ zs
    want = np.asarray(clip_params["visual"]["proj"], np.float32) @ zs
    np.testing.assert_allclose(np.asarray(trainable["head"]["linear"]["kernel"]), want, rtol=1e-5)

    # merged forward == unmerged forward (identical logits at init)
    tx, ty = synth(8, seed=3)
    from pevit_tpu.train.trainer import model_forward
    from pevit_tpu.train.partition import combine

    logits_m, _ = model_forward(
        static, combine(trainable, frozen), bn, tx, task.preproc, train=False, rng=None, mask=None
    )
    cfg2 = _cfg()
    static2 = TaskStatic.from_config(cfg2, tiny, PeftConfig(method="linear_probe"))
    task2 = TrainTask(cfg2, static2, clip_params, text_init_weights=zs, eval_chunk=16)
    t2, f2, bn2 = task2.init_bundle(jax.random.PRNGKey(1))
    logits_u, _ = model_forward(
        static2, combine(t2, f2), bn2, tx, task2.preproc, train=False, rng=None, mask=None
    )
    # bn is identity-at-init (mean 0 var 1) ONLY in eval mode; both paths used
    # eval mode so pre-head features differ only by the folded projection
    np.testing.assert_allclose(np.asarray(logits_m), np.asarray(logits_u), rtol=2e-2, atol=2e-2)
