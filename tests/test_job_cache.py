"""Campaign resume: completed CLI jobs replay instead of retraining.

The reference's launch scripts (scripts/run.sh:68-85) loop 20 datasets x 3
seeds with no completion check — a campaign restart re-trains every job.
Our command layer records a fingerprint sidecar next to each prediction
artifact (commands/_common.py: job_fingerprint / mark_job_complete) and a
re-run of an identical job replays the recorded result.  These tests cover:
replay correctness, invalidation on hyperparameter change, the opt-out knob,
and sidecar/artifact deletion forcing a re-run.
"""

import json

import numpy as np
import pytest

from .test_cli_e2e import _argv, _write_cfgs


def _run(ds, model, extra=()):
    from pevit_tpu.commands.linear_probe import main

    return main(_argv(ds, model, extra))


def _trip(monkeypatch):
    """Make any training attempt explode."""
    import pevit_tpu.train as train_mod

    def boom(*a, **k):
        raise AssertionError("run_method called: job cache missed")

    monkeypatch.setattr(train_mod, "run_method", boom)


@pytest.mark.slow
def test_replay_and_invalidation(tmp_path, monkeypatch):
    ds, model = _write_cfgs(tmp_path)
    best1, info1 = _run(ds, model)

    pred_dir = tmp_path / "out" / "predictions" / "linear_probe_5"
    sidecar = pred_dir / "seed0_synthetic-cli.json.complete"
    assert sidecar.exists()
    rec = json.loads(sidecar.read_text())
    assert rec["best_acc"] == best1
    assert rec["model_info"]["n_trainable_params"] == info1["n_trainable_params"]

    # the sidecar must be invisible to artifact-globbing tools (regression:
    # a '.complete.json' name broke prepare_submit's seed*.json combine)
    from pevit_tpu.commands.prepare_submit import main as submit_main

    submit_main(["--combine_path", str(pred_dir)])

    # identical re-run: must replay without training
    _trip(monkeypatch)
    best2, info2 = _run(ds, model)
    assert best2 == best1
    assert info2["n_trainable_params"] == info1["n_trainable_params"]
    np.testing.assert_allclose(
        np.asarray(info2["best_logits"], np.float32),
        np.round(np.asarray(info1["best_logits"], np.float32), 6),
        atol=1e-6,
    )

    # a different hyperparameter is a different job -> trains again (and the
    # tripwire fires)
    with pytest.raises(AssertionError, match="job cache missed"):
        _run(ds, model, extra=("TRAIN.END_EPOCH", "3"))

    # opt-out knob forces training too
    with pytest.raises(AssertionError, match="job cache missed"):
        _run(ds, model, extra=("TPU.SKIP_COMPLETED_JOBS", "False"))

    # deleting the artifact (but not the sidecar) re-runs
    (pred_dir / "seed0_synthetic-cli.json").unlink()
    with pytest.raises(AssertionError, match="job cache missed"):
        _run(ds, model)


@pytest.mark.slow
def test_cli_lr_changes_fingerprint(tmp_path, monkeypatch):
    ds, model = _write_cfgs(tmp_path)
    _run(ds, model)
    _trip(monkeypatch)
    # --lr is CLI-level (not in the config tree): must still invalidate
    from pevit_tpu.commands.linear_probe import main

    argv = _argv(ds, model)
    argv[argv.index("--lr") + 1] = "0.02"
    with pytest.raises(AssertionError, match="job cache missed"):
        main(argv)
