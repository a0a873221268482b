"""Hyperparameter sweep: the reference grid walk, executed as vmapped stages.

The reference sweep (kadaptation_clip.py:188-243, 446-466) is, per learning
rate: 7 coarse weight-decay probes over a 97-point log grid, then a binary
refinement with step spans 8/4/2/1 (2 probes each) — every probe a FULL
10-epoch training, all strictly sequential: up to 6 x 15 = 90 trainings per
(dataset, seed).

TPU redesign: trials are data-independent, so each *stage* of the walk runs
as ONE vmapped batch across all candidates AND all learning rates (the walks
for different LRs are independent and advance in lockstep).  Sequential
stages: 1 coarse + 4 refinement = 5, instead of 90 trainings.  Selection
semantics (strict >, iteration order, WD_SEARCH_LEFT, score-0-on-failure) are
reproduced exactly so the same (lr, wd) wins as in the reference.
"""

from __future__ import annotations

import logging
import time

import numpy as np

from .trainer import TrainTask


def wd_grid(config):
    """The 97-point grid + 7 coarse seed indices (kadaptation_clip.py:191-192)."""
    lo, hi = config.TRAIN.SEARCH_WD_LOG_LOWER, config.TRAIN.SEARCH_WD_LOG_UPPER
    grid = np.logspace(lo, hi, num=97).tolist()
    seed_vals = set(np.logspace(lo, hi, num=7))
    init_idx = [i for i, v in enumerate(grid) if v in seed_vals]
    return grid, init_idx


def _run_chunk(task: TrainTask, chunk: list, data, end_epoch: int, seed: int, begin_epoch: int = 0) -> list:
    """Scores for one vmapped trial chunk, with width-halving fallback.

    A JaxRuntimeError on a multi-trial chunk is retried as two half-width
    chunks: the dominant cause at high trial width is the remote compiler's
    program-size limit (HTTP 413), which shrinks with the vmap width — and
    the split doubles as one retry for transient relay failures.  A runtime
    error on a SINGLE trial is a real device problem and aborts the sweep
    (never silently zeroed — that would corrupt selection).  Non-runtime
    per-trial failures score 0.0, mirroring the reference's try/except-0.0
    (kadaptation_clip.py:200-205)."""
    train_x, train_y, val_x, val_y = data
    try:
        res = task.train_trials(
            chunk, train_x, train_y, val_x, val_y, end_epoch=end_epoch,
            begin_epoch=begin_epoch, seed=seed
        )
        use_last = task.config.TRAIN.SEARCH_RESULT_ON_LAST_EPOCH
        out = []
        for r in res:
            v = r["last_score"] if use_last else r["best_score"]
            out.append(0.0 if not np.isfinite(v) else float(v))
        return out
    except Exception as e:  # noqa: BLE001 — parity with reference failure handling
        if type(e).__name__ in ("JaxRuntimeError", "XlaRuntimeError"):
            if len(chunk) > 1:
                mid = len(chunk) // 2
                logging.warning(
                    "sweep chunk of %d failed on device (%s); splitting to %d+%d",
                    len(chunk), e, mid, len(chunk) - mid,
                )
                return (
                    _run_chunk(task, chunk[:mid], data, end_epoch, seed, begin_epoch)
                    + _run_chunk(task, chunk[mid:], data, end_epoch, seed, begin_epoch)
                )
            logging.error("DEVICE error in sweep stage (%s: %s) — aborting sweep", type(e).__name__, e)
            raise
        logging.warning("sweep stage chunk failed (%s); scoring 0", e)
        return [0.0] * len(chunk)


def _run_stage(task: TrainTask, jobs: list, data, end_epoch: int, seed: int, max_parallel: int, cache=None, begin_epoch: int = 0):
    """Run a stage of (lr, wd) trials, chunked to ``max_parallel`` per vmap.

    With a ``SweepCache`` (train/sweep_cache.py), finished trials replay
    from disk and only the misses train; every fresh score is persisted
    before the stage returns, so a crash mid-sweep loses at most the
    in-flight chunk.
    """
    if cache is None:
        scores = []
        for s in range(0, len(jobs), max_parallel):
            scores.extend(_run_chunk(task, jobs[s : s + max_parallel], data, end_epoch, seed, begin_epoch))
        return scores

    scores = [cache.get(lr, wd) for lr, wd in jobs]
    miss_pos = [i for i, v in enumerate(scores) if v is None]
    # a (lr, wd) pair can repeat within one stage (duplicate grid values);
    # train it once and fan the score out to every occurrence
    pending: dict = {}
    for i in miss_pos:
        pending.setdefault(tuple(jobs[i]), []).append(i)
    miss_jobs = list(pending)
    if miss_jobs:
        logging.info("sweep stage: %d/%d trials from cache", len(jobs) - len(miss_pos), len(jobs))
    fresh = []
    for s in range(0, len(miss_jobs), max_parallel):
        fresh.extend(_run_chunk(task, miss_jobs[s : s + max_parallel], data, end_epoch, seed, begin_epoch))
    for (lr, wd), sc in zip(miss_jobs, fresh):
        cache.put(lr, wd, sc)
        for i in pending[(lr, wd)]:
            scores[i] = sc
    return scores


def hyperparameter_sweep_lr(task: TrainTask, data, config, *, seed: int = 0):
    """Joint (lr, wd) search (kadaptation_clip.py:446-466 + :188-243).

    All learning rates advance through the wd-walk in lockstep; each stage is
    one (chunked) vmapped trial batch.
    """
    start = time.time()
    lrs = np.logspace(-6, -1, num=6).tolist()
    grid, init_idx = wd_grid(config)
    end_epoch = config.TRAIN.END_EPOCH
    # epochs run = range(BEGIN_EPOCH, END_EPOCH), like every reference trainer
    # loop (kadaptation_clip.py:291 etc.); nonzero BEGIN shortens training
    begin_epoch = config.TRAIN.BEGIN_EPOCH
    # per-device cap x trial-mesh width (trials shard across devices as SPMD)
    max_parallel = task.max_parallel_trials()
    wd_search_left = config.TRAIN.WD_SEARCH_LEFT

    # Sweep-only FAST_LN: the sweep needs only the RELATIVE ordering of
    # trials, so its stages may run LayerNorm stats in the activation dtype
    # (+~5% at B/32 — ARCHITECTURE.md perf notes) while the FINAL run keeps
    # the reference's fp32 LN islands (model.py:154-160).  Gated by
    # TPU.FAST_LN_SWEEP; selection equality validated by
    # tools/fast_ln_gate.py.  Irrelevant (and skipped) when the whole run is
    # already fast-LN, fp32, or on a non-CLIP backbone.
    if (
        bool(config.TPU.get("FAST_LN_SWEEP", False))
        and not task.static.fast_ln
        and not task.static.highest_precision
        and task.static.compute_dtype == "bfloat16"
    ):
        task = task.clone_with(fast_ln=True)
        logging.info("sweep stages run with FAST_LN (final run keeps fp32 LN)")

    # crash/preemption resume: completed trials replay from disk
    # (train/sweep_cache.py; enabled by TPU.SWEEP_CACHE_DIR)
    from .sweep_cache import open_sweep_cache

    cache = open_sweep_cache(config, data, end_epoch, seed)

    # per-LR walk state
    peak_idx = {lr: -1 for lr in lrs}
    peak_score = {lr: 0.0 for lr in lrs}

    # --- stage 0: coarse grid, all LRs at once -----------------------------
    jobs = [(lr, grid[idx]) for lr in lrs for idx in init_idx]
    scores = _run_stage(task, jobs, data, end_epoch, seed, max_parallel, cache, begin_epoch)
    k = 0
    for lr in lrs:
        for idx in init_idx:
            if scores[k] > peak_score[lr]:
                peak_idx[lr], peak_score[lr] = idx, scores[k]
            k += 1
        logging.info(
            "=> LR %.1e coarse: peak wd %s score %.3f",
            lr, grid[peak_idx[lr]], peak_score[lr],
        )

    # --- refinement stages: step_span 8,4,2,1 -------------------------------
    step_span = 8
    while step_span > 0:
        jobs, meta = [], []
        for lr in lrs:
            p = peak_idx[lr]
            left, right = max(p - step_span, 0), min(p + step_span, len(grid) - 1)
            search = [i for i in (left, right) if i != p]
            for idx in search:
                # WD_SEARCH_LEFT trains list[left] but credits list[idx]
                # (kadaptation_clip.py:221-225) — legacy mode kept verbatim
                wd = grid[left] if wd_search_left else grid[idx]
                jobs.append((lr, wd))
                meta.append((lr, idx))
        scores = _run_stage(task, jobs, data, end_epoch, seed, max_parallel, cache, begin_epoch)
        for (lr, idx), sc in zip(meta, scores):
            if sc > peak_score[lr]:
                peak_idx[lr], peak_score[lr] = idx, sc
        step_span //= 2

    # --- pick best LR (strict >, iteration order; :453-462) -----------------
    best_lr, best_wd, best_score = 0.0, 0.0, 0.0
    for lr in lrs:
        if peak_score[lr] > best_score:
            best_score = peak_score[lr]
            best_lr = lr
            best_wd = grid[peak_idx[lr]]
    logging.info(
        "Hyper parameter tuning result: learning rate %s, l2_lambda %s (%.1fs)",
        best_lr, best_wd, time.time() - start,
    )
    return best_lr, best_wd


def run_method(task: TrainTask, data, config, *, no_tuning: bool, lr: float, l2: float, seed: int = 0, rebuild_data=None):
    """Full method driver (reference ``kadapt_clip`` et al.,
    kadaptation_clip.py:488-520): optional sweep -> final run on merged
    train+val with END_EPOCH + EXTRA_FINAL_TRAIN_EPOCH.

    ``rebuild_data()`` regenerates the full split tuple under the CURRENT
    config — used by the patch-camelyon restore below."""
    train_x, train_y, val_x, val_y, test_x, test_y = data

    if no_tuning:
        best_lr, best_wd = lr, l2
    else:
        best_lr, best_wd = hyperparameter_sweep_lr(
            task, (train_x, train_y, val_x, val_y), config, seed=seed
        )

    logging.info("=> The final classifier is on training ...")
    logging.info("Hyperparameters: learning_rate = %s, l2_lambda = %s", best_lr, best_wd)
    end_epoch = config.TRAIN.END_EPOCH + config.TRAIN.EXTRA_FINAL_TRAIN_EPOCH

    if (
        config.DATASET.DATASET == "patch-camelyon"
        and config.DATASET.NUM_SAMPLES_PER_CLASS == 10000
        and rebuild_data is not None
    ):
        # the sweep searched on the 10000-shot subset; the FINAL run trains
        # on the regenerated full dataset (kadaptation_clip.py:504-512).
        # The mutated config also makes the artifact record n_shot=-1, like
        # the reference's in-place defrost does.
        logging.info("Used the subset to train the model, regenerating the full set for final run.")
        config.defrost()
        config.DATASET.NUM_SAMPLES_PER_CLASS = -1
        config.freeze()
        logging.info(
            "Old: len(train)=%d, len(val)=%d, len(test)=%d.",
            train_y.shape[0], val_y.shape[0], test_y.shape[0],
        )
        train_x, train_y, val_x, val_y, test_x, test_y = rebuild_data()
        logging.info(
            "Generated: len(train)=%d, len(val)=%d, len(test)=%d.",
            train_y.shape[0], val_y.shape[0], test_y.shape[0],
        )

    if config.DATASET.MERGE_TRAIN_VAL_FINAL_RUN:
        import numpy as _np

        if isinstance(train_x, _np.ndarray) or isinstance(val_x, _np.ndarray):
            # host-resident (streaming) data stays on host after the merge
            final_x = _np.concatenate([_np.asarray(train_x), _np.asarray(val_x)], axis=0)
            final_y = _np.concatenate([_np.asarray(train_y), _np.asarray(val_y)], axis=0)
        else:
            import jax.numpy as jnp

            final_x = jnp.concatenate([train_x, val_x], axis=0)
            final_y = jnp.concatenate([train_y, val_y], axis=0)
        logging.info("Using the full trainval set to train final model. len=%d", final_y.shape[0])
    else:
        final_x, final_y = train_x, train_y
        logging.info("Using the train set only to train final model. len=%d", final_y.shape[0])

    res = task.train_trials(
        [(best_lr, best_wd)],
        final_x,
        final_y,
        test_x,
        test_y,
        end_epoch=end_epoch,
        begin_epoch=config.TRAIN.BEGIN_EPOCH,
        seed=seed,
        keep_logits=True,
        log_every=1,
    )[0]

    import jax

    final_trainable = jax.tree.map(lambda a: a[0], task._last_state[0])
    model_info = task.model_info(final_trainable)
    model_info["best_lr"] = float(best_lr)
    model_info["best_l2_lambda"] = float(best_wd)

    # Checkpoint the tiny trainable state (the reference never saves training
    # state — SURVEY.md §5.4; we add proper save/resume via Orbax)
    if config.TPU.CHECKPOINT_DIR:
        from ..ckpt import save_trainable

        save_trainable(config.TPU.CHECKPOINT_DIR, final_trainable, step=end_epoch)
    model_info["best_logits"] = res["best_logits"]
    logging.info(
        "=> Learning rate %s, L2 lambda %s: Best score: Acc@1 %.3f",
        best_lr, best_wd, res["best_score"],
    )
    return res["best_score"], model_info
