"""patch-camelyon full-shot restore for the FINAL run.

Reference semantics (kadaptation_clip.py:504-512): full-shot patch-camelyon
is searched on a 10000-shot subset (linear_probe.py:97-103 sets
NUM_SAMPLES_PER_CLASS=10000), then the final run REGENERATES the full
dataset (NUM_SAMPLES_PER_CLASS back to -1) before training.  The artifact
therefore records n_shot=-1, like the reference's in-place config defrost.

Synthetic pcam-shaped fixture: 2 classes x 10500 images (tiny 8x8 uint8),
so the 10000-shot subset genuinely subsets and the restored full set is
strictly larger.
"""

import numpy as np
import pytest

import jax

from pevit_tpu.commands._common import apply_shared_dataset_tweaks, load_device_data
from pevit_tpu.config import get_default_config
from pevit_tpu.core import CLIPSpec, TextSpec, VisionSpec, init_clip_params
from pevit_tpu.peft import PeftConfig
from pevit_tpu.train import TaskStatic, TrainTask, run_method

N_PER_CLASS = 10500
RES = 8


def _write_pcam(root):
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    n = 2 * N_PER_CLASS
    labels = np.repeat(np.arange(2), N_PER_CLASS).astype(np.int64)
    base = np.array([[60, 200, 60], [200, 60, 200]], np.uint8)
    images = np.clip(
        base[labels][:, None, None, :].astype(np.int16)
        + rng.integers(-40, 40, (n, RES, RES, 3)),
        0, 255,
    ).astype(np.uint8)
    np.savez_compressed(root / "train.npz", images=images, labels=labels)
    np.savez_compressed(
        root / "test.npz", images=images[::200].copy(), labels=labels[::200].copy()
    )


@pytest.mark.slow
def test_final_run_restores_full_shot(tmp_path):
    _write_pcam(tmp_path / "data")

    cfg = get_default_config()
    cfg.DATASET.DATASET = "patch-camelyon"
    cfg.DATASET.ROOT = str(tmp_path / "data")
    cfg.DATASET.NUM_CLASSES = 2
    cfg.DATASET.NUM_SAMPLES_PER_CLASS = -1  # full shot, as the CLI receives it
    cfg.TRAIN.IMAGE_SIZE = [RES, RES]
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 256
    cfg.TRAIN.END_EPOCH = 1
    cfg.TRAIN.EXTRA_FINAL_TRAIN_EPOCH = 0
    cfg.TEST.METRIC = "accuracy"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()

    # the shared command tweak swaps full shot -> 10000-shot for the search
    apply_shared_dataset_tweaks(cfg, "finetuning")
    assert cfg.DATASET.NUM_SAMPLES_PER_CLASS == 10000

    data = load_device_data(cfg)
    sweep_train = int(data[1].shape[0])
    # 10000-shot subset, minus the 0.2 class-balanced val split
    assert sweep_train == 2 * 10000 - 2 * 2000

    spec = CLIPSpec(
        embed_dim=16,
        vision=VisionSpec(input_resolution=RES, patch_size=4, width=32, layers=1,
                          heads=2, output_dim=16),
        text=TextSpec(context_length=8, vocab_size=64, width=16, heads=1, layers=1,
                      output_dim=16),
    )
    static = TaskStatic.from_config(cfg, spec, PeftConfig(method="linear_probe"))
    task = TrainTask(cfg, static, init_clip_params(jax.random.PRNGKey(0), spec),
                     eval_chunk=64)

    sizes = {}

    def rebuild():
        d = load_device_data(cfg)
        sizes["train"], sizes["val"] = int(d[1].shape[0]), int(d[3].shape[0])
        return d

    best, info = run_method(
        task, data, cfg, no_tuning=True, lr=0.01, l2=1e-4, seed=0,
        rebuild_data=rebuild,
    )

    # the final run saw the restored FULL train split (strictly larger than
    # the sweep subset) and the config now records n_shot=-1 for artifacts
    assert cfg.DATASET.NUM_SAMPLES_PER_CLASS == -1
    assert sizes["train"] > sweep_train
    assert sizes["train"] == 2 * N_PER_CLASS - 2 * 2100  # full minus 0.2 val
    assert np.isfinite(best)
    assert info["best_logits"] is not None
