"""End-to-end CLI tests: the reference command surface on synthetic data.

Exercises the full L5->L1 stack: argparse grammar -> config merge -> data ->
text-init head -> trainer -> prediction artifacts, exactly as the published
launch scripts invoke it (minus network/dataset downloads).
"""

import json
import os

import numpy as np
import pytest


def _write_cfgs(tmp_path, n_classes=4):
    ds = tmp_path / "ds.yaml"
    ds.write_text(
        f"""DATASET:
  DATASET: 'synthetic-cli'
  ROOT: '{tmp_path}/data'
  NUM_CLASSES: {n_classes}
TEST:
  METRIC: 'accuracy'
"""
    )
    model = tmp_path / "model.yaml"
    model.write_text(
        f"""OUTPUT_DIR: '{tmp_path}/out'
INPUT:
  MEAN: [0.48145466, 0.4578275, 0.40821073]
  STD: [0.26862954, 0.26130258, 0.27577711]
MODEL:
  NAME: 'ViT-B/32'
  PRETRAINED: 'random'
  SPEC:
    EMBED_DIM: 512
    TEXT:
      TOKENIZER: clip
      CONTEXT_LENGTH: 77
TEST:
  BATCH_SIZE_PER_GPU: 32
TRAIN:
  BATCH_SIZE_PER_GPU: 16
  END_EPOCH: 2
  EXTRA_FINAL_TRAIN_EPOCH: 0
  OPTIMIZER: sgd
  WD: 0.
  MOMENTUM: 0.9
  NESTEROV: false
"""
    )
    return str(ds), str(model)


def _argv(ds, model, extra=()):
    return [
        "--ds", ds, "--model", model,
        "--no-tuning", "True", "--lr", "0.01", "--l2", "0.0001",
        "DATASET.NUM_SAMPLES_PER_CLASS", "5",
        "DATASET.RANDOM_SEED_SAMPLING", "0",
        "TRAIN.IMAGE_SIZE", "[32,32]",  # tiny images: ViT-B/32 grid 1x1 (fast CPU test)
        "TEST.IMAGE_SIZE", "[32,32]",
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.REMAT", "False",
        "TPU.USE_PALLAS_ATTENTION", "False",
        *extra,
    ]


@pytest.mark.slow
def test_linear_probe_cli(tmp_path):
    from pevit_tpu.commands.linear_probe import main

    ds, model = _write_cfgs(tmp_path)
    best_acc, model_info = main(_argv(ds, model))
    assert best_acc > 0

    pred_dir = tmp_path / "out" / "predictions" / "linear_probe_5"
    jf = pred_dir / "seed0_synthetic-cli.json"
    tf = pred_dir / "seed0_synthetic-cli.txt"
    assert jf.exists() and tf.exists()
    data = json.loads(jf.read_text())
    assert data["model_name"] == "ViT-B/32"
    assert data["dataset_name"] == "synthetic-cli"
    assert data["n_shot"] == 5
    assert data["rnd_seeds"] == [0]
    preds = np.asarray(data["predictions"][0])
    assert preds.ndim == 2 and preds.shape[1] == 4
    np.testing.assert_allclose(preds.sum(-1), 1.0, atol=1e-3)
    assert "best acc is:" in tf.read_text()
    # linear probe trainable = head only: 512*4+4
    assert data["num_trainable_params"] == 512 * 4 + 4


@pytest.mark.slow
def test_kadaptation_cli_and_prepare_submit(tmp_path):
    from pevit_tpu.commands.kronecker_adaptation_clip import main
    from pevit_tpu.commands.prepare_submit import main as submit_main

    ds, model = _write_cfgs(tmp_path)
    for seed in (0, 1):
        main(_argv(ds, model, extra=["DATASET.RANDOM_SEED_SAMPLING", str(seed)]))
    pred_dir = str(tmp_path / "out" / "predictions" / "finetuning_5")
    files = sorted(os.listdir(pred_dir))
    assert "seed0_synthetic-cli.json" in files and "seed1_synthetic-cli.json" in files

    out_zip = submit_main(["--combine_path", pred_dir])
    assert os.path.exists(out_zip)
    import zipfile

    with zipfile.ZipFile(out_zip) as zf:
        combined = json.loads(zf.read("synthetic-cli.json"))
    assert combined["rnd_seeds"] == [0, 1]
    assert len(combined["predictions"]) == 2


@pytest.mark.slow
def test_zeroshot_cli(tmp_path):
    from pevit_tpu.commands.zeroshot import main

    ds, model = _write_cfgs(tmp_path, n_classes=10)
    # zeroshot needs class names: use cifar-10 name with synthetic data root
    dsf = tmp_path / "ds.yaml"
    dsf.write_text(dsf.read_text().replace("synthetic-cli", "cifar-10"))
    result = main([
        "--ds", str(dsf), "--model", model,
        "TRAIN.IMAGE_SIZE", "[32,32]", "TEST.IMAGE_SIZE", "[32,32]",
        "DATASET.ALLOW_SYNTHETIC", "True",  # real name + synthetic data opt-in
    ])
    assert np.isfinite(result)
    feat_dir = tmp_path / "out" / "features"
    assert any(f.endswith("_image.npy") for f in os.listdir(feat_dir))
