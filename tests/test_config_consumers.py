"""Anti-silent-knob tripwire (r3 VERDICT item 3 tail): every config key
either has a consumer somewhere in this repo's source, or sits on the
EXPLICIT ignore list below with a reason.

The yacs schema must accept every key the reference's YAMLs/scripts set
(unknown keys raise), so torch/CUDA-era keys are necessarily *accepted* —
the invariant enforced here is that none is *silently* accepted: a key is
either consumed, rejected loudly at use time, or documented dead.

Heuristic: a key "has a consumer" when its LEAF name appears anywhere in
non-defaults source.  That is deliberately loose (a comment mention passes)
— the test is a tripwire for NEW keys landing without wiring, not a proof
of semantics; semantics are covered by the per-feature tests.
"""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# Keys accepted for reference-YAML/script compatibility and DELIBERATELY
# not consumed.  Two classes:
#   runtime: torch/CUDA process plumbing with no TPU/JAX analogue —
#     ignoring them is the correct port (utils/comm.py-era knobs).
#   dead: defined in the reference's config/default.py but consumed
#     NOWHERE in the reference source either (HRNet-era schema baggage);
#     verified by grep over /root/reference at r4.
IGNORED = {
    # --- runtime (torch process/infra knobs; JAX handles these itself) ---
    "DATA_DIR", "GPUS", "MULTIPROCESSING_DISTRIBUTED", "PIN_MEMORY",
    "PRINT_FREQ", "RANK", "WORKERS", "USE_DEEPSPEED", "DEBUG.DEBUG",
    "AMP.ENABLED", "AMP.MEMORY_FORMAT",
    "CUDNN.BENCHMARK", "CUDNN.DETERMINISTIC", "CUDNN.ENABLED",
    # TRAIN.WD is the reference's INTERNAL mutable slot: the sweep writes
    # the current lambda into it right before optim/build.py reads it
    # (kadaptation_clip.py:198,500) — never a user-facing input.  Here the
    # (lr, wd) pair flows explicitly through train_trials.
    "TRAIN.WD",
    # --- dead in the reference too (no consumer in its source) ---
    "LOSS.LABEL_SMOOTHING", "LOSS.FOCAL.NORMALIZE", "LOSS.FOCAL.ALPHA",
    "LOSS.FOCAL.GAMMA",
    "DATASET.DATA_FORMAT", "DATASET.LABELMAP", "DATASET.TRAIN_TSV_LIST",
    "DATASET.TEST_TSV_LIST", "DATASET.COCO.SCALES",
    "DATASET.COCO.BALANCE_DATA", "DATASET.TARGET_SIZE",
    "AUG.RANDOM_CENTER_CROP", "AUG.RATIO", "AUG.COLOR_JITTER",
    "AUG.GRAY_SCALE", "AUG.GAUSSIAN_BLUR", "AUG.DROPBLOCK_LAYERS",
    "AUG.DROPBLOCK_KEEP_PROB", "AUG.DROPBLOCK_BLOCK_SIZE",
    "AUG.MIXUP_PROB", "AUG.MIXUP", "AUG.MIXCUT", "AUG.MIXCUT_MINMAX",
    "AUG.MIXUP_SWITCH_PROB", "AUG.MIXUP_MODE", "AUG.MIXCUT_AND_MIXUP",
    "AUG.TIMM_AUG.USE_LOADER", "AUG.TIMM_AUG.USE_TRANSFORM",
    "SWA.ENABLED", "SWA.LR_RATIO", "SWA.ANNEAL_EPOCHS",
    "SWA.ANNEAL_STRATEGY", "SWA.FROZEN_BN",
    "TRAIN.AUTO_RESUME", "TRAIN.CHECKPOINT", "TRAIN.GAMMA1",
    "TRAIN.GAMMA2", "TRAIN.SHUFFLE", "TRAIN.EMA_DECAY",
    "TRAIN.EVAL_BEGIN_EPOCH", "TRAIN.LARC", "TRAIN.DETECT_ANOMALY",
    "TRAIN.LOADER", "TRAIN.SAMPLER", "TRAIN.NUM_SAMPLES_CLASS",
    "TRAIN.SAVE_ALL_MODELS",
    "TEST.INTERPOLATION", "TEST.REAL_LABELS", "TEST.VALID_LABELS",
    "FINETUNE.FINETUNE", "FINETUNE.USE_TRAIN_AUG", "FINETUNE.BASE_LR",
    "FINETUNE.BATCH_SIZE", "FINETUNE.EVAL_EVERY", "FINETUNE.FROZEN_LAYERS",
}


def _flatten(node, prefix=""):
    out = []
    for k, v in node.items():
        p = f"{prefix}.{k}" if prefix else k
        if hasattr(v, "items"):
            out += _flatten(v, p)
        else:
            out.append(p)
    return out


def _repo_source() -> str:
    chunks = []
    for pat in ("pevit_tpu/**/*.py", "tools/*.py", "scripts/*.py", "*.py"):
        for f in REPO.glob(pat):
            if f.name == "defaults.py":
                continue
            chunks.append(f.read_text())
    return "\n".join(chunks)


def test_every_config_key_consumed_or_explicitly_ignored():
    from pevit_tpu.config import get_default_config

    keys = _flatten(get_default_config())
    src = _repo_source()
    unconsumed = {
        k for k in keys
        if not re.search(rf"\b{re.escape(k.split('.')[-1])}\b", src)
    }
    silent = sorted(unconsumed - IGNORED)
    assert not silent, (
        "config keys with NO consumer and NO ignore-list entry (wire them, "
        f"reject them loudly, or add them to IGNORED with a reason): {silent}"
    )


def test_ignore_list_stays_accurate():
    """Every ignore-list entry must still exist in the schema (catches
    renames leaving stale entries behind)."""
    from pevit_tpu.config import get_default_config

    keys = set(_flatten(get_default_config()))
    stale = sorted(IGNORED - keys)
    assert not stale, f"IGNORED entries no longer in the schema: {stale}"


def test_loss_loss_rejected_loudly(tmp_path):
    """LOSS.LOSS other than 'softmax' is rejected at command setup (the
    reference's 'contrast' branch is vestigial — feature.py:295-296)."""
    import argparse

    import pytest

    from pevit_tpu.commands._common import setup_config

    ds = tmp_path / "ds.yaml"
    ds.write_text("LOSS:\n  LOSS: 'contrast'\nDATASET:\n  DATASET: 'synthetic-x'\n")
    model = tmp_path / "model.yaml"
    model.write_text("MODEL:\n  NAME: 'ViT-B/32'\n")
    args = argparse.Namespace(ds=str(ds), model=str(model), cfg="", opts=[],
                              submit_predictions=False, submit_by="",
                              fix_seed=-1)
    with pytest.raises(ValueError, match="LOSS.LOSS"):
        setup_config(args)


def test_swin_init_weights_false_rejected():
    """MODEL.INIT_WEIGHTS=False has no JAX analogue (params are created
    with their init — cls_swin.py:706); must raise, not silently init."""
    import pytest

    from pevit_tpu.config import get_default_config
    from pevit_tpu.models.factory import get_model

    cfg = get_default_config()
    cfg.MODEL.NAME = "cls_swin"
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.TRAIN.IMAGE_SIZE = [224, 224]
    with pytest.raises(ValueError, match="INIT_WEIGHTS"):
        get_model(cfg)


# MODEL.SPEC is a free-form dict the schema walk above cannot see (the r4
# audit's structural blind spot — QK_SCALE survived it).  Enumerate the SPEC
# keys the reference's model builders actually read and tripwire each one.
REFERENCE_SPEC_KEYS = {
    # cls_swin.py:688-703 (top-level SPEC) / clip_swin.py:178-193 (SPEC.VISION)
    "PATCH_SIZE", "IN_CHANS", "EMBED_DIM", "DEPTHS", "NUM_HEADS",
    "WINDOW_SIZE", "MLP_RATIO", "QKV_BIAS", "QK_SCALE", "DROP_RATE",
    "DROP_PATH_RATE", "APE", "PATCH_NORM", "LAYER_SCALE",
    # clip_swin.py:157-170 (SPEC.TEXT + EMBED_DIM)
    "TOKENIZER", "CONTEXT_LENGTH", "WIDTH", "LAYERS", "HEADS",
    # mae.py:82-86 / mocov3.py:145-147
    "DEPTH", "GLOBAL_POOL",
}


def test_reference_spec_keys_consumed_or_rejected():
    """Every MODEL.SPEC key a reference builder reads must appear in this
    repo's source (consumed or loudly rejected) — closes the free-form-dict
    blind spot of the schema walk above."""
    src = _repo_source()
    silent = sorted(
        k for k in REFERENCE_SPEC_KEYS
        if not re.search(rf"\b{re.escape(k)}\b", src)
    )
    assert not silent, f"MODEL.SPEC keys the reference reads but this repo never mentions: {silent}"


def test_swin_qk_scale_changes_forward():
    """QK_SCALE must actually change the attention math (cls_swin.py:92:
    scale = qk_scale or head_dim ** -0.5), not just parse."""
    import jax
    import jax.numpy as jnp

    from pevit_tpu.config import get_default_config
    from pevit_tpu.models.factory import get_model

    x = jax.random.normal(jax.random.PRNGKey(7), (1, 224, 224, 3), jnp.float32)
    outs = []
    for qk in (None, 0.05):
        cfg = get_default_config()
        cfg.MODEL.NAME = "cls_swin_tiny"
        cfg.TRAIN.IMAGE_SIZE = [224, 224]
        if qk is not None:
            cfg.MODEL.SPEC.update({"QK_SCALE": qk})
        bb = get_model(cfg)
        outs.append(bb.forward_features(bb.params, x))
    assert not jnp.allclose(outs[0], outs[1]), "QK_SCALE=0.05 did not change the forward"
    # default scale equals the explicit head_dim ** -0.5 (tiny: hd=32)
    cfg = get_default_config()
    cfg.MODEL.NAME = "cls_swin_tiny"
    cfg.TRAIN.IMAGE_SIZE = [224, 224]
    cfg.MODEL.SPEC.update({"QK_SCALE": 32 ** -0.5})
    bb = get_model(cfg)
    assert jnp.allclose(outs[0], bb.forward_features(bb.params, x), atol=1e-6)


def test_vit_spec_shape_keys_consumed_on_random_init():
    """MAE/MoCo-v3 SPEC shape keys (mae.py:82-86) must drive the random-init
    tower geometry; MLP_RATIO != 4 and QKV_BIAS=False must raise."""
    import pytest

    from pevit_tpu.config import get_default_config
    from pevit_tpu.models.factory import get_model

    cfg = get_default_config()
    cfg.MODEL.NAME = "mae_vitb16"
    cfg.TRAIN.IMAGE_SIZE = [224, 224]
    cfg.MODEL.SPEC.update(
        {"EMBED_DIM": 192, "PATCH_SIZE": 32, "DEPTH": 2, "NUM_HEADS": 3,
         "MLP_RATIO": 4, "QKV_BIAS": True, "GLOBAL_POOL": True}
    )
    bb = get_model(cfg)
    assert bb.feat_dim == 192
    assert bb.params["blocks"]["attn"]["in_proj"]["kernel"].shape == (2, 192, 3 * 192)

    cfg.MODEL.SPEC.update({"MLP_RATIO": 2})
    with pytest.raises(ValueError, match="MLP_RATIO"):
        get_model(cfg)
    cfg.MODEL.SPEC.update({"MLP_RATIO": 4, "QKV_BIAS": False})
    with pytest.raises(ValueError, match="QKV_BIAS"):
        get_model(cfg)


def test_model_record_consumes_metadata_keys():
    """MODEL.AUTHOR / NUM_PARAMS_IN_M / PRETRAINED_DATA / CREATION_TIME feed
    the leaderboard model record (common/utils.py:29-37)."""
    from pevit_tpu.commands.prediction_submission import model_info_from_config
    from pevit_tpu.config import get_default_config

    cfg = get_default_config()
    cfg.MODEL.AUTHOR = "someone"
    cfg.MODEL.NUM_PARAMS_IN_M = 151.2
    cfg.MODEL.PRETRAINED_DATA = "wit400m"
    cfg.MODEL.CREATION_TIME = "2022-01-01"
    rec = model_info_from_config(cfg)
    assert rec["author"] == "someone"
    assert rec["num_params_in_millions"] == 151.2
    assert rec["pretrained_data"] == "wit400m"
    assert rec["creation_time"] == "2022-01-01"
