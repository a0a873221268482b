"""Streaming training path for datasets too large to preload into HBM.

The fused whole-run jit (trainer.build_fit_eval_fn) assumes the train split
lives on device as uint8 — true for every few-shot regime and most full-shot
ELEVATER datasets, but NOT for e.g. full-shot patch-camelyon (262K images
~= 39GB uint8).  The reference streams from disk via DataLoader workers
(feature.py:76-98); here the host keeps the uint8 arrays in RAM and streams
shuffled batches with a one-batch transfer-ahead pipeline, while the
per-STEP computation reuses the very same jitted step the fused path uses.

Selection between paths is automatic: TrainTask.train_trials falls back to
streaming when the train split exceeds ``TPU.MAX_DEVICE_DATA_GB``.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np

from .optim import make_optimizer
from .partition import combine
from .trainer import TaskStatic, _loss, model_forward


def build_step_fn(static: TaskStatic, preproc: dict, lr_scales=None, forward_fn=None, batch_sharding=None):
    """One training step over an explicit (padded) batch; vmappable over
    trials with the batch broadcast.  ``batch_sharding`` shards the batch
    over a "data" mesh axis (same DP semantics as trainer.build_epoch_fn)."""
    _, opt_update = make_optimizer(
        static.optimizer,
        momentum=static.momentum,
        nesterov=static.nesterov,
        lr_scales=lr_scales,
    )
    from .optim import clip_grad_norm as _clip

    def loss_fn(trainable, frozen, bn_state, imgs, labels, mask, rng):
        bundle = combine(trainable, frozen)
        logits, new_bn = model_forward(
            static, bundle, bn_state, imgs, preproc, train=True, rng=rng, mask=mask,
            forward_fn=forward_fn,
        )
        return _loss(static, logits, labels, mask), new_bn

    def step(frozen, state, imgs, labels, mask, lr, wd):
        trainable, opt_state, bn_state, rng = state
        if batch_sharding is not None:
            imgs = jax.lax.with_sharding_constraint(imgs, batch_sharding)
            labels = jax.lax.with_sharding_constraint(labels, batch_sharding)
            mask = jax.lax.with_sharding_constraint(mask, batch_sharding)
        rng, step_rng = jax.random.split(rng)
        # Size-1-batch skip (kadaptation_clip.py:342) happens HOST-side in
        # run_epoch — the tail size is known before dispatch, so no lax.cond
        # wraps the fwd+bwd (same static resolution as trainer.build_epoch_fn).
        (_, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, bn_state, imgs, labels, mask, step_rng
        )
        if static.clip_grad_norm > 0:
            grads = _clip(grads, static.clip_grad_norm)
        trainable, opt_state = opt_update(grads, trainable, opt_state, lr, wd)
        return trainable, opt_state, new_bn, rng

    return step


class StreamingEpochRunner:
    """Host-side epoch loop with one-batch transfer-ahead prefetch."""

    def __init__(self, task, n_trials: int, peft_axis=None):
        self.task = task
        st = task.static
        mesh, _, n_d = task._mesh_plan(n_trials)
        step = build_step_fn(
            st, task.preproc, task._lr_scales(), task._forward_fn,
            batch_sharding=task._batch_sharding(mesh, n_d),
        )
        batched = jax.vmap(
            step, in_axes=(task._frozen_axes(peft_axis), 0, None, None, None, 0, 0)
        )
        self._step = jax.jit(batched, donate_argnums=(1,))
        self.batch = st.batch_size

    def run_epoch(self, frozen, state, images_np: np.ndarray, labels_np: np.ndarray, lrs, wds, seed: int):
        """One epoch over host-resident data; returns the new state."""
        n = len(labels_np)
        B = self.batch
        rng = np.random.default_rng(seed)
        perm = rng.permutation(n)
        steps = math.ceil(n / B)
        if n - (steps - 1) * B == 1:
            steps -= 1  # reference skips size-1 batches (kadaptation_clip.py:342)
        if steps <= 0:
            return state

        def make_batch(i):
            idx = perm[i * B : (i + 1) * B]
            imgs = images_np[idx]
            labs = labels_np[idx]
            # The tail batch ships at its NATURAL size — padding + masking is
            # not reference-equivalent (the PEFT scramble quirk mixes batch
            # rows; see build_epoch_fn).  The jit retraces once for the tail
            # shape: one extra compile per distinct dataset size.
            mask = np.ones(len(idx), np.float32)
            return (
                # per-batch device-side prepack keeps streaming numerics
                # identical to the preloaded fast path (same folded GEMM)
                self.task.prepack(jax.device_put(imgs)),
                jax.device_put(labs),
                jax.device_put(mask),
            )

        next_batch = make_batch(0)
        for i in range(steps):
            imgs, labs, mask = next_batch
            if i + 1 < steps:
                next_batch = make_batch(i + 1)  # transfer overlaps compute
            state = self._step(frozen, state, imgs, labs, mask, lrs, wds)
        return state
