"""Day-1 online parity runbook: offline CI for the --plan path + the
aggregation/diff tooling (VERDICT r3 next #4)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_runbook_plan_mode_offline():
    out = subprocess.run(
        ["bash", str(REPO / "tools" / "run_full_parity.sh"), "--plan"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    text = out.stdout
    for stage in ["stage 1/5", "stage 2/5", "stage 3/5", "stage 4/5", "stage 5/5"]:
        assert stage in text, f"missing {stage}:\n{text[-2000:]}"
    # checkpoint plan lines name the sha256-pathed OpenAI URLs
    assert "openaipublic.azureedge.net/clip/models" in text
    # the full campaign is enumerated: 7 arms (6 training methods + the
    # eval-only zeroshot arm) x 20 datasets x 3 seeds
    assert text.count("run_multi.sh") == 7 * 20 * 3
    # the baseline diff excludes the zeroshot arm (no published average)
    assert "--methods kadaptation,lora,adapter,compacter,finetune,linear_probe" in text
    assert "PLAN COMPLETE" in text
    # nothing actually executed: no output tree was created
    assert not (REPO / "PARITY_OUT").exists()


def test_fetch_tool_plan_and_validation():
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "fetch_clip_checkpoints.py"),
         "--plan", "--models", "ViT-B/32,ViT-L/14"],
        cwd=REPO, capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "ViT-B-32.pt" in out.stdout and "ViT-L-14.pt" in out.stdout

    bad = subprocess.run(
        [sys.executable, str(REPO / "tools" / "fetch_clip_checkpoints.py"),
         "--plan", "--models", "ViT-Z/99"],
        cwd=REPO, capture_output=True, text=True, timeout=60,
    )
    assert bad.returncode == 1


def _write_artifacts(root: Path, datasets, seeds, acc):
    for ds in datasets:
        for s in seeds:
            p = root / "log" / "predictions"
            p.mkdir(parents=True, exist_ok=True)
            (p / f"seed{s}_{ds}.txt").write_text(
                f"best acc is:{acc}, num_params is:88, n_trainable_params is:0.08, "
                "backbone_params is:87."
            )


DATASETS_20 = [
    "cifar10", "cifar100", "dtd", "eurosat-clip", "fer2013",
    "fgvc-aircraft-2013b", "food101", "gtsrb", "flower102",
    "oxford-iiit-pets", "rendered-sst2", "resisc45-clip", "stanfordcar",
    "country211", "kitti-distance", "mnist", "patchcamelyon", "caltech101",
    "hateful-memes", "voc2007classification",
]


def test_check_parity_pass_and_fail(tmp_path):
    from tools.check_parity_vs_baseline import main

    # within ±0.3 of the published 68.92 -> pass
    _write_artifacts(tmp_path / "kadaptation", DATASETS_20, [0, 1, 2], 69.1)
    rc = main(["--out", str(tmp_path), "--methods", "kadaptation"])
    assert rc == 0

    # off by 1.0 -> fail
    _write_artifacts(tmp_path / "lora", DATASETS_20, [0, 1, 2], 60.48)
    assert main(["--out", str(tmp_path), "--methods", "lora"]) == 1

    # incomplete (missing seeds) -> fail even if the mean matches
    _write_artifacts(tmp_path / "adapter", DATASETS_20, [0], 65.08)
    assert main(["--out", str(tmp_path), "--methods", "adapter"]) == 1

    # fraction-scale artifacts are normalised to percent
    _write_artifacts(tmp_path / "compacter", DATASETS_20, [0, 1, 2], 0.6279)
    assert main(["--out", str(tmp_path), "--methods", "compacter"]) == 0

    # missing method dir -> fail
    assert main(["--out", str(tmp_path), "--methods", "finetune"]) == 1
