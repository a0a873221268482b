"""Sweep trial-score cache: crash/preemption resume (train/sweep_cache.py).

The reference has no fault handling beyond score-0-on-failure
(kadaptation_clip.py:200-205) and never persists sweep progress; these tests
cover our beyond-reference resume path: identical selection on replay, zero
retraining on a full cache, partial resume after a simulated crash, and
fingerprint invalidation on config/data changes.
"""

import numpy as np
import pytest

from pevit_tpu.config import get_default_config
from pevit_tpu.train import sweep as sweep_mod
from pevit_tpu.train.sweep_cache import SweepCache, open_sweep_cache, sweep_fingerprint

from .test_sweep_semantics import FakeTask


def _score_fn(lr, wd):
    d = (np.log10(lr / 1e-3)) ** 2 + 0.1 * (np.log10(wd / 10.0)) ** 2
    return float(100 * np.exp(-d / 4))


def _data(seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, 255, (16, 8, 8, 3), dtype=np.uint8),
        rng.integers(0, 4, (16,)).astype(np.int32),
        rng.integers(0, 255, (4, 8, 8, 3), dtype=np.uint8),
        rng.integers(0, 4, (4,)).astype(np.int32),
    )


def _cfg(tmp_path):
    cfg = get_default_config()
    cfg.TPU.SWEEP_CACHE_DIR = str(tmp_path / "cache")
    cfg.TPU.SWEEP_PARALLEL_TRIALS = 16
    return cfg


def test_full_resume_zero_retraining(tmp_path):
    cfg = _cfg(tmp_path)
    data = _data()

    task1 = FakeTask(cfg, _score_fn)
    got1 = sweep_mod.hyperparameter_sweep_lr(task1, data, cfg)
    assert sum(len(c) for c in task1.calls) > 0

    # second run: the scorer is a tripwire — any training call would return
    # garbage and shift selection; with the cache it must never be consulted
    task2 = FakeTask(cfg, lambda lr, wd: 1.0 / 0.0)
    got2 = sweep_mod.hyperparameter_sweep_lr(task2, data, cfg)
    assert got2 == got1
    assert task2.calls == []


def test_partial_resume_trains_only_remainder(tmp_path):
    cfg = _cfg(tmp_path)
    data = _data()

    task1 = FakeTask(cfg, _score_fn)
    got1 = sweep_mod.hyperparameter_sweep_lr(task1, data, cfg)
    total1 = sum(len(c) for c in task1.calls)

    # simulate a crash: keep only the first half of the persisted trials
    cache_dir = tmp_path / "cache"
    (cache_file,) = list(cache_dir.iterdir())
    lines = cache_file.read_text().splitlines()
    cache_file.write_text("\n".join(lines[: len(lines) // 2]) + "\n")

    task2 = FakeTask(cfg, _score_fn)
    got2 = sweep_mod.hyperparameter_sweep_lr(task2, data, cfg)
    total2 = sum(len(c) for c in task2.calls)
    assert got2 == got1
    assert 0 < total2 < total1


def test_corrupt_tail_line_tolerated(tmp_path):
    cfg = _cfg(tmp_path)
    data = _data()
    task1 = FakeTask(cfg, _score_fn)
    got1 = sweep_mod.hyperparameter_sweep_lr(task1, data, cfg)

    (cache_file,) = list((tmp_path / "cache").iterdir())
    with open(cache_file, "a") as f:
        f.write('{"lr": "1e-3", "wd"')  # killed mid-write

    task2 = FakeTask(cfg, lambda lr, wd: 1.0 / 0.0)
    got2 = sweep_mod.hyperparameter_sweep_lr(task2, data, cfg)
    assert got2 == got1
    assert task2.calls == []


def test_fingerprint_invalidation():
    cfg = get_default_config()
    data = _data()
    base = sweep_fingerprint(cfg, data, end_epoch=10, seed=0)

    assert sweep_fingerprint(cfg, data, end_epoch=10, seed=1) != base
    assert sweep_fingerprint(cfg, data, end_epoch=11, seed=0) != base
    assert sweep_fingerprint(cfg, _data(seed=5), end_epoch=10, seed=0) != base

    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.TRAIN.BATCH_SIZE_PER_GPU = cfg.TRAIN.BATCH_SIZE_PER_GPU + 1
    assert sweep_fingerprint(cfg2, data, end_epoch=10, seed=0) != base

    # pure-output paths must NOT invalidate (re-run in a fresh output dir)
    cfg3 = cfg.clone()
    cfg3.defrost()
    cfg3.OUTPUT_DIR = "/somewhere/else"
    cfg3.TPU.CHECKPOINT_DIR = "/ckpts"
    assert sweep_fingerprint(cfg3, data, end_epoch=10, seed=0) == base


def test_fingerprint_sees_code_semantics(monkeypatch):
    """A trainer-numerics code change (SEMANTICS_VERSION bump) must
    invalidate every cached score/job even with identical config + data —
    otherwise an upgraded framework silently replays pre-upgrade numbers
    from old campaign caches."""
    from pevit_tpu.train import sweep_cache as sc

    cfg = get_default_config()
    data = _data()
    base = sweep_fingerprint(cfg, data, end_epoch=10, seed=0)
    assert base == sweep_fingerprint(cfg, data, end_epoch=10, seed=0)  # stable
    monkeypatch.setattr(sc, "SEMANTICS_VERSION", sc.SEMANTICS_VERSION + 1)
    assert sweep_fingerprint(cfg, data, end_epoch=10, seed=0) != base


def test_auto_and_empty_disable_cache():
    cfg = get_default_config()
    data = _data()
    assert cfg.TPU.SWEEP_CACHE_DIR == "auto"
    assert open_sweep_cache(cfg, data, 10, 0) is None
    cfg.defrost()
    cfg.TPU.SWEEP_CACHE_DIR = ""
    assert open_sweep_cache(cfg, data, 10, 0) is None


def test_cache_handles_device_arrays(tmp_path):
    import jax.numpy as jnp

    cfg = get_default_config()
    data = tuple(jnp.asarray(a) for a in _data())
    fp = sweep_fingerprint(cfg, data, 10, 0)
    fp_np = sweep_fingerprint(cfg, _data(), 10, 0)
    assert fp == fp_np  # content-addressed, not placement-addressed

    c = SweepCache(str(tmp_path), fp)
    c.put(1e-3, 0.5, 42.0)
    assert SweepCache(str(tmp_path), fp).get(1e-3, 0.5) == 42.0
