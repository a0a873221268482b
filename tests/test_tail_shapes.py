"""Edge-shape coverage for the r4 natural-size tail machinery.

The r4 batch-composition finding (see trainer.build_epoch_fn) replaced
padded+masked tails with separately-traced NATURAL-size steps/chunks.
These tests pin the edge shapes that change meaning under that design:

* n_train < B        -> zero full steps, one natural tail step
* n_train == 1       -> everything skipped (reference skips size-1 batches,
                        kadaptation_clip.py:342 / full_model_finetune.py:311)
* n_val % chunk == 1 -> EVAL tails of 1 are NOT skipped (the skip is a
                        train-only rule; every val row must be scored)
* n_val < chunk      -> single natural chunk
* chunking invariance for a row-independent tower (linear probe): the
  chunk size is throughput-only there, so logits must be bit-stable
  across chunk sizes in fp32
"""

import numpy as np
import jax
import pytest

from pevit_tpu.config import get_default_config
from pevit_tpu.core import init_clip_params
from pevit_tpu.peft import PeftConfig
from pevit_tpu.train import TaskStatic, TrainTask

from .test_trainer_e2e import TINY, N_CLASSES, synth_data


def _task(method="linear_probe", batch_size=8, eval_chunk=32, optimizer="sgd"):
    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = N_CLASSES
    cfg.TRAIN.BATCH_SIZE_PER_GPU = batch_size
    cfg.TRAIN.OPTIMIZER = optimizer
    cfg.TEST.METRIC = "accuracy"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.REMAT = False
    cfg.TPU.USE_PALLAS_ATTENTION = False
    static = TaskStatic.from_config(cfg, TINY, PeftConfig(method=method))
    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY)
    return TrainTask(cfg, static, clip_params, eval_chunk=eval_chunk)


def _adam_steps(n_train, batch_size=8):
    from pevit_tpu.train.optim import AdamState

    task = _task(optimizer="adam", batch_size=batch_size)
    x, y = synth_data(12, seed=0)
    task.train_trials(
        [(0.01, 1e-4)], x[:n_train], y[:n_train], x[:8], y[:8], end_epoch=2, seed=0
    )
    opt = task._last_state[1]
    assert isinstance(opt, AdamState)
    return int(np.asarray(opt.step)[0])


def test_train_split_smaller_than_batch():
    """n_train=5 < B=8: zero full loop steps, ONE natural tail step/epoch."""
    assert _adam_steps(5) == 1 * 2


def test_train_split_of_one_skips_all_steps():
    """n_train=1: the only batch is size 1, which the reference skips —
    zero optimizer steps, but the run still completes and scores val."""
    assert _adam_steps(1) == 0
    task = _task()
    x, y = synth_data(12, seed=0)
    res = task.train_trials(
        [(0.01, 1e-4)], x[:1], y[:1], x[:9], y[:9], end_epoch=2, seed=0,
        keep_logits=True,
    )[0]
    assert res["best_logits"].shape == (9, N_CLASSES)
    assert np.isfinite(np.asarray(res["best_logits"])).all()


@pytest.mark.parametrize("n_val", [5, 33])
def test_eval_tails_are_scored_not_skipped(n_val):
    """Val splits of 5 (< chunk) and 33 (chunk 32 + tail of 1) must both
    come back fully scored — the size-1 skip is a TRAIN-only rule."""
    task = _task(eval_chunk=32)
    x, y = synth_data(12, seed=0)
    res = task.train_trials(
        [(0.01, 1e-4)], x[:16], y[:16], x[:n_val], y[:n_val], end_epoch=2,
        seed=0, keep_logits=True,
    )[0]
    logits = np.asarray(res["best_logits"])
    assert logits.shape == (n_val, N_CLASSES)
    assert np.isfinite(logits).all()
    np.testing.assert_allclose(logits.sum(-1), 1.0, rtol=1e-4)


def test_eval_chunking_invariant_for_row_independent_tower():
    """Linear probe runs the PLAIN tower (no PEFT scramble): rows are exactly
    independent, so the eval chunk size is throughput-only and the per-row
    logits must not depend on it.  chunk=7 forces a 33 = 4x7 + 5 split;
    chunk=64 runs the whole val split as one natural chunk."""
    x, y = synth_data(12, seed=0)

    def run(chunk):
        task = _task(eval_chunk=chunk)
        return np.asarray(
            task.train_trials(
                [(0.01, 1e-4)], x[:16], y[:16], x[:33], y[:33], end_epoch=2,
                seed=0, keep_logits=True,
            )[0]["best_logits"]
        )

    np.testing.assert_allclose(run(7), run(64), rtol=1e-6, atol=1e-7)


def test_natural_tail_training_is_deterministic():
    """Two identical runs over an n % B != 0 split (12 = 8 + tail 4) must
    agree bit-for-bit — the tail step derives its rng from the same
    fold_in(drop_rng, step) stream as the full steps."""
    x, y = synth_data(12, seed=0)
    runs = [
        np.asarray(
            _task(method="lora").train_trials(
                [(0.01, 1e-4)], x[:12], y[:12], x[:10], y[:10], end_epoch=2,
                seed=0, keep_logits=True,
            )[0]["best_logits"]
        )
        for _ in range(2)
    ]
    np.testing.assert_array_equal(runs[0], runs[1])
