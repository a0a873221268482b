"""scripts/run_multi.sh — the env-driven batch-launch variant of run.sh
(reference scripts/run_multi.sh): one job per invocation, dataset/output
taken from the environment.

Runs the real script end-to-end (subprocess) against the repo CLI with a
tiny synthetic dataset + random weights; DATASET/MODEL_CFG resolve through
the script's ``resources/{datasets,model}/$name.yaml`` interpolation via
relative paths into the test tmpdir.
"""

import os
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_run_multi_linear_probe(tmp_path):
    ds = tmp_path / "ds.yaml"
    ds.write_text(
        f"""DATASET:
  DATASET: 'synthetic-multi'
  NUM_CLASSES: 4
TEST:
  METRIC: 'accuracy'
"""
    )
    model = tmp_path / "model.yaml"
    model.write_text(
        """MODEL:
  NAME: 'ViT-B/32'
  PRETRAINED: 'random'
  SPEC:
    EMBED_DIM: 512
    TEXT:
      TOKENIZER: clip
      CONTEXT_LENGTH: 77
INPUT:
  MEAN: [0.48145466, 0.4578275, 0.40821073]
  STD: [0.26862954, 0.26130258, 0.27577711]
TRAIN:
  BATCH_SIZE_PER_GPU: 16
  END_EPOCH: 1
  EXTRA_FINAL_TRAIN_EPOCH: 0
"""
    )
    out = tmp_path / "out"
    # the script interpolates resources/{datasets,model}/$NAME.yaml relative
    # to the repo root; point $NAME back into the tmpdir
    rel = os.path.relpath(tmp_path, REPO)
    env = dict(
        os.environ,
        # "resources/datasets/../../<rel>/ds.yaml" -> tmpdir yaml
        DATASET=f"../../{rel}/ds",
        MODEL_CFG=f"../../{rel}/model",
        OUTPUT_DIR=str(out),
        MODE="linear_probe",
        DISABLE_TUNING="True",
        LR="0.01",
        L2="0.0001",
        NUM_SHOTS="5",
        INIT_HEAD="False",
        EXTRA_OPTS=(
            "TRAIN.IMAGE_SIZE [32,32] TEST.IMAGE_SIZE [32,32] "
            "TPU.COMPUTE_DTYPE float32"
        ),
    )

    proc = subprocess.run(
        ["bash", str(REPO / "scripts" / "run_multi.sh")],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"

    # OUTPUT_DIR interpolates $model_cfg (which here traverses via ..), so
    # compute the literal directory the script wrote to
    expected = (out / f"../../{rel}/model" / "log").resolve()
    jsons = list(expected.rglob("seed0_synthetic-multi.json"))
    assert jsons, f"no prediction artifact under {expected}"


def test_run_multi_requires_env():
    proc = subprocess.run(
        ["bash", str(REPO / "scripts" / "run_multi.sh")],
        env={k: v for k, v in os.environ.items() if k not in ("DATASET", "OUTPUT_DIR")},
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode != 0
    assert "set DATASET and OUTPUT_DIR" in proc.stderr
