"""Pre-patchified uint8 fast input path (core.clip.patchify_images + fold).

The training path may feed the CLIP tower (B, G*G, p*p*3) RAW uint8 patches;
normalisation then folds into the patch-embedding GEMM (W' = W*s, b' = t @ W).
These tests pin (a) the byte shuffle, (b) numerical equivalence of the folded
GEMM with the reference normalise-then-patchify order, and (c) the TrainTask
gating rules that keep parity runs and non-CLIP backbones on the NHWC path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pevit_tpu.core import CLIPSpec, VisionSpec, encode_image, init_clip_params, patchify_images


def small_spec():
    return CLIPSpec(
        embed_dim=32,
        vision=VisionSpec(input_resolution=32, patch_size=8, width=48, layers=2, heads=4, output_dim=32),
    )


def test_patchify_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (3, 16, 16, 3), dtype=np.uint8)
    got = np.asarray(patchify_images(jnp.asarray(x), 8))
    assert got.shape == (3, 4, 192)
    # naive: patch (gy, gx) -> rows major, then (p, p, c) flattened
    for n in (0, 2):
        for gy in range(2):
            for gx in range(2):
                patch = x[n, gy * 8 : (gy + 1) * 8, gx * 8 : (gx + 1) * 8, :]
                np.testing.assert_array_equal(got[n, gy * 2 + gx], patch.reshape(-1))


def test_folded_gemm_matches_normalize_then_encode():
    spec = small_spec()
    params = init_clip_params(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073], jnp.float32)
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711], jnp.float32)

    x_norm = (jnp.asarray(imgs, jnp.float32) / 255.0 - mean) / std
    ref = encode_image(params, x_norm, spec=spec, compute_dtype=jnp.float32)

    packed = patchify_images(jnp.asarray(imgs), spec.vision.patch_size)
    fast = encode_image(
        params, packed, spec=spec, compute_dtype=jnp.float32, patch_fold=(mean, std)
    )
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_prepatchified_requires_fold():
    spec = small_spec()
    params = init_clip_params(jax.random.PRNGKey(0), spec)
    packed = jnp.zeros((2, 16, 192), jnp.uint8)
    with pytest.raises(ValueError):
        encode_image(params, packed, spec=spec)


def test_train_task_prepack_gating():
    from pevit_tpu.config import get_default_config
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.train import TaskStatic, TrainTask

    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = 5
    cfg.TRAIN.IMAGE_SIZE = [32, 32]
    spec = small_spec()
    clip_params = init_clip_params(jax.random.PRNGKey(0), spec)

    static = TaskStatic.from_config(cfg, spec, PeftConfig(method="lora"))
    task = TrainTask(cfg, static, clip_params)
    assert task.use_prepack
    imgs = np.zeros((2, 32, 32, 3), np.uint8)
    packed = task.prepack(imgs)
    assert packed.shape == (2, 16, 192)
    # idempotent on already-packed input
    assert task.prepack(packed) is packed

    # parity mode keeps the reference op order -> NHWC path
    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.TPU.PARITY_FP32 = True
    cfg2.freeze()
    static2 = TaskStatic.from_config(cfg2, spec, PeftConfig(method="lora"))
    task2 = TrainTask(cfg2, static2, clip_params)
    assert not task2.use_prepack
    assert task2.prepack(imgs).shape == (2, 32, 32, 3)


def test_train_trials_prepack_equals_nhwc_result():
    """End-to-end: training via the packed fast path reproduces the NHWC path
    (fp32 compute; the fold is associativity-exact up to float rounding)."""
    from pevit_tpu.config import get_default_config
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.train import TaskStatic, TrainTask

    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = 4
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 8
    cfg.TRAIN.IMAGE_SIZE = [32, 32]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TEST.METRIC = "accuracy"
    spec = small_spec()
    clip_params = init_clip_params(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(2)
    tr_x = rng.integers(0, 256, (16, 32, 32, 3), dtype=np.uint8)
    tr_y = rng.integers(0, 4, (16,)).astype(np.int32)
    va_x = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    va_y = rng.integers(0, 4, (8,)).astype(np.int32)

    logits = {}
    for parity in (False, True):
        c = cfg.clone()
        c.defrost()
        c.TPU.PARITY_FP32 = parity  # True => NHWC path, False => packed path
        c.freeze()
        static = TaskStatic.from_config(c, spec, PeftConfig(method="lora"))
        task = TrainTask(c, static, clip_params)
        res = task.train_trials(
            [(0.01, 1e-4)], tr_x, tr_y, va_x, va_y, end_epoch=2, seed=0, keep_logits=True
        )
        logits[parity] = res[0]["best_logits"]
    np.testing.assert_allclose(logits[False], logits[True], rtol=5e-3, atol=5e-3)
