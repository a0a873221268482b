"""TPU.FOLD_LN2: ln_2 affine folded ONCE into the frozen c_fc GEMMs
(core.clip.fold_ln2_params) is exact algebra — forward and input-grads
match the unfolded block — and the transform is idempotent + safe under
the standard (unfolded) block path."""

import numpy as np
import jax
import jax.numpy as jnp

from pevit_tpu.core.clip import fold_ln2_params
from pevit_tpu.core.layers import residual_attention_block, set_fold_ln2


def _params(rng, W=64):
    ks = jax.random.split(rng, 8)
    r = lambda k, *s: 0.02 * jax.random.normal(k, s, jnp.float32)
    return {
        "ln_1": {"scale": 1.0 + r(ks[0], W), "bias": r(ks[1], W)},
        "ln_2": {"scale": 1.0 + r(ks[2], W), "bias": r(ks[3], W)},
        "attn": {
            "in_proj": {"kernel": r(ks[4], W, 3 * W), "bias": jnp.zeros(3 * W)},
            "out_proj": {"kernel": r(ks[5], W, W), "bias": jnp.zeros(W)},
        },
        "mlp": {
            "c_fc": {"kernel": r(ks[6], W, 4 * W), "bias": 0.1 + jnp.zeros(4 * W)},
            "c_proj": {"kernel": r(ks[7], 4 * W, W), "bias": jnp.zeros(W)},
        },
    }


def _fold_block(params):
    """fold_ln2_params works on stacked (L, ...) towers; lift one block."""
    stacked = jax.tree.map(lambda a: a[None], params)
    folded = fold_ln2_params({"visual": {"blocks": stacked, "x": 0}})
    return jax.tree.map(lambda a: a[0], folded["visual"]["blocks"])


def test_fold_ln2_exact_fp32():
    params = _params(jax.random.PRNGKey(0))
    folded = _fold_block(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 64), jnp.float32)

    def run(p, x):
        return residual_attention_block(p, x, n_head=4)

    base = run(params, x)
    base_grad = jax.grad(lambda v: jnp.sum(run(params, v) ** 2))(x)
    try:
        set_fold_ln2(True)
        fold = run(folded, x)
        fold_grad = jax.grad(lambda v: jnp.sum(run(folded, v) ** 2))(x)
    finally:
        set_fold_ln2(False)
    np.testing.assert_allclose(np.asarray(fold), np.asarray(base), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fold_grad), np.asarray(base_grad), atol=1e-4, rtol=1e-4)


def test_folded_params_safe_under_standard_path():
    """After folding, ln_2 is the identity affine: the UNFOLDED block on
    folded params computes the same function (norm(x)*1+0 == norm(x)) —
    no code path can silently double-apply the affine."""
    params = _params(jax.random.PRNGKey(2))
    folded = _fold_block(params)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 64), jnp.float32)
    base = residual_attention_block(params, x, n_head=4)
    via_folded = residual_attention_block(folded, x, n_head=4)
    np.testing.assert_allclose(np.asarray(via_folded), np.asarray(base), atol=1e-5, rtol=1e-5)


def test_fold_idempotent():
    params = _params(jax.random.PRNGKey(4))
    once = _fold_block(params)
    twice = _fold_block(once)
    for a, b in zip(jax.tree.leaves(once), jax.tree.leaves(twice)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fold_ln2_config_consumed():
    """TPU.FOLD_LN2 reaches TaskStatic (no silent knob); parity mode and
    full_finetune (trainable visual tower) force it off."""
    from pevit_tpu.config import get_default_config
    from pevit_tpu.core import CLIPSpec
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.train import TaskStatic

    cfg = get_default_config()
    cfg.TPU.FOLD_LN2 = True
    st = TaskStatic.from_config(cfg, CLIPSpec.vit_b32(), PeftConfig(method="kadaptation"))
    assert st.fold_ln2
    st_ft = TaskStatic.from_config(cfg, CLIPSpec.vit_b32(), PeftConfig(method="full_finetune"))
    assert not st_ft.fold_ln2
    cfg.TPU.PARITY_FP32 = True
    st2 = TaskStatic.from_config(cfg, CLIPSpec.vit_b32(), PeftConfig(method="kadaptation"))
    assert not st2.fold_ln2  # parity mode keeps the reference LN->GEMM order


def test_fold_ln2_end_to_end_training():
    """Whole TrainTask path: FOLD_LN2 on vs off trains to near-identical
    eval logits (fp32 on CPU; rounding-only differences)."""
    import numpy as onp

    from pevit_tpu.config import get_default_config
    from pevit_tpu.core import CLIPSpec, init_clip_params
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.train import TaskStatic, TrainTask

    from pevit_tpu.core.clip import TextSpec, VisionSpec

    spec = CLIPSpec(
        embed_dim=32,
        vision=VisionSpec(
            input_resolution=64, patch_size=32, width=64, layers=2, heads=4, output_dim=32
        ),
        text=TextSpec(
            context_length=8, vocab_size=128, width=32, heads=4, layers=2, output_dim=32
        ),
    )
    clip = init_clip_params(jax.random.PRNGKey(0), spec)
    rng = onp.random.default_rng(0)
    images = rng.integers(0, 255, (8, 64, 64, 3), dtype=onp.uint8)
    labels = onp.arange(8) % 4

    outs = []
    for fold in (False, True):
        cfg = get_default_config()
        cfg.DATASET.NUM_CLASSES = 4
        cfg.TRAIN.BATCH_SIZE_PER_GPU = 4
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.TPU.FOLD_LN2 = fold
        static = TaskStatic.from_config(cfg, spec, PeftConfig(method="lora"))
        task = TrainTask(cfg, static, clip)
        if fold:
            ln2 = task.clip_params["visual"]["blocks"]["ln_2"]
            assert float(jnp.abs(ln2["scale"] - 1.0).max()) == 0.0
            assert float(jnp.abs(ln2["bias"]).max()) == 0.0
        res = task.train_trials(
            [(0.01, 1e-4)], images, labels, images, labels,
            end_epoch=2, seed=0, keep_logits=True,
        )
        outs.append(res[0])
    a, b = outs
    onp.testing.assert_allclose(
        onp.asarray(a["best_logits"], onp.float64),
        onp.asarray(b["best_logits"], onp.float64),
        atol=5e-3,
    )
