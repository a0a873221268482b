"""Multilabel end-to-end: voc-2007-shaped CLI run through BCE + 11pt-mAP.

Exercises the only metric with a hand-rolled implementation
(evaluation/metrics.py map_11_points) through the full CLI stack — synthetic
multilabel data -> BCE training (TaskStatic.multilabel) -> 11-point mAP
selection — and cross-checks the metric against sklearn's average_precision
on the same predictions (the 11-point interpolation differs from sklearn's
all-points AP by construction, so the check is closeness, not equality,
plus exact agreement on a case where both definitions coincide).
"""

import json

import numpy as np
import pytest

from pevit_tpu.evaluation.metrics import map_11_points


def _write_cfgs(tmp_path, n_classes=4):
    ds = tmp_path / "ds.yaml"
    ds.write_text(
        f"""DATASET:
  DATASET: 'voc-2007-classification'
  ROOT: '{tmp_path}/data'
  ALLOW_SYNTHETIC: true
  NUM_CLASSES: {n_classes}
TEST:
  METRIC: '11point_mAP'
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


@pytest.mark.slow
def test_voc_shaped_multilabel_cli(tmp_path):
    from pevit_tpu.commands.linear_probe import main

    ds, model = _write_cfgs(tmp_path)
    best, _ = main([
        "--ds", ds, "--model", model,
        "--no-tuning", "True", "--lr", "0.05", "--l2", "0.0001",
        "DATASET.NUM_SAMPLES_PER_CLASS", "5",
        "DATASET.RANDOM_SEED_SAMPLING", "0",
        "TRAIN.IMAGE_SIZE", "[32,32]",
        "TEST.IMAGE_SIZE", "[32,32]",
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.REMAT", "False",
        "TPU.USE_PALLAS_ATTENTION", "False",
    ])
    assert 0.0 < best <= 100.0

    jf = tmp_path / "out" / "predictions" / "linear_probe_5" / "seed0_voc-2007-classification.json"
    data = json.loads(jf.read_text())
    preds = np.asarray(data["predictions"][0], np.float32)
    assert preds.ndim == 2 and preds.shape[1] == 4
    # reference quirk parity: saved predictions are softmax(-1) even for
    # multilabel datasets (full_model_finetune.py:342) — training/selection
    # use BCE + 11pt-mAP, the submission probabilities are still a simplex
    np.testing.assert_allclose(preds.sum(-1), 1.0, atol=1e-3)
    assert preds.min() >= 0.0 and preds.max() <= 1.0


def test_map11_vs_sklearn_average_precision():
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(3)
    n, c = 400, 6
    y = (rng.random((n, c)) < 0.3).astype(np.int64)
    y[y.sum(1) == 0, 0] = 1  # every sample has a positive
    scores = np.clip(y + rng.normal(0, 0.45, (n, c)), 0, 1)

    ours = map_11_points(y, scores)
    theirs = float(sklearn_metrics.average_precision_score(y, scores, average="macro"))
    # 11-point interpolation vs all-points AP: same ranking quality signal
    assert abs(ours - theirs) < 0.03, (ours, theirs)

    # perfect ranking: both definitions agree exactly at 1.0
    assert map_11_points(y, y.astype(np.float64)) == pytest.approx(1.0)
    assert float(sklearn_metrics.average_precision_score(y, y, average="macro")) == pytest.approx(1.0)
