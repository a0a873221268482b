"""Sweep grid-walk selection must match the reference algorithm exactly.

Reimplementation of the reference's sequential walk
(kadaptation_clip.py:188-243, 446-466) driven by a deterministic fake scorer;
our staged/vmapped driver must select the identical (lr, wd).
"""

import numpy as np
import pytest

from pevit_tpu.config import get_default_config
from pevit_tpu.train import sweep as sweep_mod


class FakeTask:
    """Stands in for TrainTask: deterministic score per (lr, wd)."""

    def __init__(self, config, score_fn):
        self.config = config
        self.score_fn = score_fn
        self.calls = []

    def max_parallel_trials(self):
        return max(1, self.config.TPU.SWEEP_PARALLEL_TRIALS)

    def train_trials(self, hparams, *a, end_epoch=None, seed=0, **k):
        self.calls.append(list(hparams))
        return [
            {"best_score": self.score_fn(lr, wd), "last_score": self.score_fn(lr, wd), "best_logits": None}
            for lr, wd in hparams
        ]


def reference_walk(score_fn, config):
    """Literal transcription of the reference's sequential selection."""
    grid = np.logspace(config.TRAIN.SEARCH_WD_LOG_LOWER, config.TRAIN.SEARCH_WD_LOG_UPPER, 97).tolist()
    seed_vals = set(np.logspace(config.TRAIN.SEARCH_WD_LOG_LOWER, config.TRAIN.SEARCH_WD_LOG_UPPER, 7))
    init_idx = [i for i, v in enumerate(grid) if v in seed_vals]

    def sweep_one_lr(lr):
        peak_idx, peak_score = -1, 0.0
        for idx in init_idx:
            s = score_fn(lr, grid[idx])
            if s > peak_score:
                peak_idx, peak_score = idx, s
        step_span = 8
        while step_span > 0:
            left, right = max(peak_idx - step_span, 0), min(peak_idx + step_span, len(grid) - 1)
            search = [i for i in (left, right) if i != peak_idx]
            for idx in search:
                wd = grid[left] if config.TRAIN.WD_SEARCH_LEFT else grid[idx]
                s = score_fn(lr, wd)
                if s > peak_score:
                    peak_idx, peak_score = idx, s
            step_span //= 2
        return grid[peak_idx], peak_score

    best_lr, best_wd, best = 0.0, 0.0, 0.0
    for lr in np.logspace(-6, -1, 6).tolist():
        wd, score = sweep_one_lr(lr)
        if score > best:
            best, best_lr, best_wd = score, lr, wd
    return best_lr, best_wd


@pytest.mark.parametrize("wd_search_left", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_staged_sweep_matches_reference_walk(seed, wd_search_left):
    rng = np.random.default_rng(seed)
    # smooth deterministic score surface with a bump
    lr_star = 10 ** rng.uniform(-6, -1)
    wd_star = 10 ** rng.uniform(-6, 6)

    def score_fn(lr, wd):
        d = (np.log10(lr / lr_star)) ** 2 + 0.1 * (np.log10(wd / wd_star)) ** 2
        return float(100 * np.exp(-d / 4))

    cfg = get_default_config()
    cfg.TRAIN.WD_SEARCH_LEFT = wd_search_left
    cfg.TPU.SWEEP_PARALLEL_TRIALS = 16
    want = reference_walk(score_fn, cfg)

    task = FakeTask(cfg, score_fn)
    data = (None, None, None, None)
    got = sweep_mod.hyperparameter_sweep_lr(task, data, cfg)
    assert got == pytest.approx(want), (got, want)

    # stage structure: 1 coarse (42 jobs, chunked) + 4 refinement stages
    total_jobs = sum(len(c) for c in task.calls)
    assert total_jobs <= 6 * 15
    assert total_jobs >= 6 * 7


def test_sweep_failure_scores_zero():
    cfg = get_default_config()

    class BoomTask(FakeTask):
        def train_trials(self, hparams, *a, **k):
            raise RuntimeError("boom")

    task = BoomTask(cfg, lambda lr, wd: 0.0)
    scores = sweep_mod._run_stage(task, [(0.1, 1.0), (0.2, 2.0)], (None,) * 4, 1, 0, 8)
    assert scores == [0.0, 0.0]


def test_run_chunk_halves_on_device_error():
    """An oversized-program failure splits the chunk instead of aborting;
    a single-trial device failure still raises (never silently zeroed)."""

    class JaxRuntimeError(RuntimeError):
        pass

    class FlakyTask(FakeTask):
        def __init__(self, config, score_fn, max_width):
            super().__init__(config, score_fn)
            self.max_width = max_width

        def train_trials(self, hparams, *a, **k):
            if len(hparams) > self.max_width:
                raise JaxRuntimeError("remote_compile: HTTP 413")
            return super().train_trials(hparams, *a, **k)

    cfg = get_default_config()
    score = lambda lr, wd: lr + wd
    jobs = [(float(i), float(i) / 10) for i in range(8)]
    data = (None, None, None, None)

    task = FlakyTask(cfg, score, max_width=2)
    scores = sweep_mod._run_stage(task, jobs, data, end_epoch=1, seed=0, max_parallel=8)
    assert scores == [score(lr, wd) for lr, wd in jobs]
    # 8 -> 4+4 -> 2+2+2+2: only width<=2 calls ever run
    assert all(len(c) <= 2 for c in task.calls)

    # single-trial device error must abort, not score 0
    task1 = FlakyTask(cfg, score, max_width=0)
    with pytest.raises(JaxRuntimeError):
        sweep_mod._run_stage(task1, jobs[:1], data, end_epoch=1, seed=0, max_parallel=8)


def test_fast_ln_sweep_stages_use_clone():
    """TPU.FAST_LN_SWEEP routes sweep STAGES through a fast-LN clone while
    the caller's task (the final run) keeps reference fp32 LN (sweep.py)."""
    import types

    cfg = get_default_config()
    cfg.TPU.FAST_LN_SWEEP = True
    log = []

    class LnTask(FakeTask):
        def __init__(self, config, score_fn, fast_ln=False):
            super().__init__(config, score_fn)
            self.static = types.SimpleNamespace(
                fast_ln=fast_ln, highest_precision=False, compute_dtype="bfloat16"
            )

        def clone_with(self, **overrides):
            return LnTask(self.config, self.score_fn, fast_ln=overrides["fast_ln"])

        def train_trials(self, hparams, *a, **k):
            log.append(self.static.fast_ln)
            return super().train_trials(hparams, *a, **k)

    task = LnTask(cfg, lambda lr, wd: lr + wd)
    sweep_mod.hyperparameter_sweep_lr(task, (None, None, None, None), cfg, seed=0)
    assert log and all(log), "every sweep stage must run on the fast-LN clone"
    assert not task.static.fast_ln, "the caller's task (final run) stays fp32-LN"

    # fp32 compute never engages the scheme (fast LN == fp32 LN there)
    log.clear()
    t32 = LnTask(cfg, lambda lr, wd: lr + wd)
    t32.static.compute_dtype = "float32"
    sweep_mod.hyperparameter_sweep_lr(t32, (None, None, None, None), cfg, seed=0)
    assert log and not any(log)
