"""Optimizers with torch-update semantics, vmappable over hyperparameters.

The reference trains with ``torch.optim.SGD`` (momentum 0.9, nesterov False
per resources/model/vitb32_CLIP.yaml:40-42, coupled weight decay) built by
vision_benchmark/optim/build.py:88-127.  We re-implement the exact update
rules as pure functions where ``lr`` and ``wd`` are *traced scalars*: this is
what lets the hyperparameter sweep vmap whole training runs over a batch of
(lr, wd) candidates on one chip — the rebuild's main performance lever
(SURVEY.md §2.9 "HP-sweep parallelism").

torch SGD (dampening=0):
    g   = grad + wd * p
    buf = momentum * buf + g          (buf starts at 0 => first step buf = g)
    p  -= lr * (g + momentum * buf)   if nesterov else   lr * buf

torch Adam / AdamW follow torch semantics (bias correction, eps outside
sqrt); Adam couples wd into the gradient, AdamW decays decoupled.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class SgdState(NamedTuple):
    momentum_buf: Any


class AdamState(NamedTuple):
    step: jax.Array
    m: Any
    v: Any


class RmspropState(NamedTuple):
    sq: Any
    momentum_buf: Any


def _zeros_like_tree(params):
    return jax.tree.map(jnp.zeros_like, params)


# --- SGD -------------------------------------------------------------------

def sgd_init(params) -> SgdState:
    return SgdState(momentum_buf=_zeros_like_tree(params))


def sgd_update(grads, params, state: SgdState, *, lr, wd, momentum=0.9, nesterov=False):
    def upd(g, p, b):
        g = g + wd * p
        b_new = momentum * b + g
        step = g + momentum * b_new if nesterov else b_new
        return p - lr * step, b_new

    flat = jax.tree.map(upd, grads, params, state.momentum_buf)
    new_params = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
    new_buf = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
    return new_params, SgdState(momentum_buf=new_buf)


# --- Adam / AdamW ----------------------------------------------------------

def adam_init(params) -> AdamState:
    return AdamState(step=jnp.zeros((), jnp.int32), m=_zeros_like_tree(params), v=_zeros_like_tree(params))


def adam_update(
    grads, params, state: AdamState, *, lr, wd, b1=0.9, b2=0.999, eps=1e-8, decoupled=False
):
    t = state.step + 1
    bc1 = 1.0 - b1 ** t.astype(jnp.float32)
    bc2 = 1.0 - b2 ** t.astype(jnp.float32)

    def upd(g, p, m, v):
        if not decoupled:
            g = g + wd * p
        m_new = b1 * m + (1 - b1) * g
        v_new = b2 * v + (1 - b2) * g * g
        step = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
        if decoupled:
            step = step + wd * p
        return p - lr * step, m_new, v_new

    flat = jax.tree.map(upd, grads, params, state.m, state.v)
    is_tup = lambda t: isinstance(t, tuple)
    return (
        jax.tree.map(lambda t: t[0], flat, is_leaf=is_tup),
        AdamState(
            step=t,
            m=jax.tree.map(lambda t: t[1], flat, is_leaf=is_tup),
            v=jax.tree.map(lambda t: t[2], flat, is_leaf=is_tup),
        ),
    )


# --- RMSprop ---------------------------------------------------------------

def rmsprop_init(params) -> RmspropState:
    return RmspropState(sq=_zeros_like_tree(params), momentum_buf=_zeros_like_tree(params))


def rmsprop_update(grads, params, state: RmspropState, *, lr, wd, alpha=0.99, eps=1e-8, momentum=0.9):
    def upd(g, p, sq, b):
        g = g + wd * p
        sq_new = alpha * sq + (1 - alpha) * g * g
        step = g / (jnp.sqrt(sq_new) + eps)
        b_new = momentum * b + step
        return p - lr * b_new, sq_new, b_new

    flat = jax.tree.map(upd, grads, params, state.sq, state.momentum_buf)
    is_tup = lambda t: isinstance(t, tuple)
    return (
        jax.tree.map(lambda t: t[0], flat, is_leaf=is_tup),
        RmspropState(
            sq=jax.tree.map(lambda t: t[1], flat, is_leaf=is_tup),
            momentum_buf=jax.tree.map(lambda t: t[2], flat, is_leaf=is_tup),
        ),
    )


# --- gradient clipping ------------------------------------------------------

def clip_grad_norm(grads, max_norm):
    """torch.nn.utils.clip_grad_norm_ semantics (full_model_finetune.py:327)."""
    leaves = jax.tree.leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
    return jax.tree.map(lambda g: g * scale.astype(g.dtype), grads)


# --- dispatch --------------------------------------------------------------

def make_optimizer(name: str, *, momentum=0.9, nesterov=False, lr_scales=None):
    """Return (init_fn, update_fn(grads, params, state, lr, wd)).

    ``lr_scales``: optional pytree of per-leaf LR multipliers implementing
    TRAIN.TWO_LR (reference optim/build.py:100-117 — backbone params train at
    0.1x the head LR).
    """
    name = name.lower()
    if name == "sgd":
        if lr_scales is not None:
            def upd(g, p, s, lr, wd):
                def leaf(gl, pl, bl, sc):
                    gl = gl + wd * pl
                    b_new = momentum * bl + gl
                    step = gl + momentum * b_new if nesterov else b_new
                    return pl - lr * sc * step, b_new
                flat = jax.tree.map(leaf, g, p, s.momentum_buf, lr_scales)
                is_tup = lambda t: isinstance(t, tuple)
                return (
                    jax.tree.map(lambda t: t[0], flat, is_leaf=is_tup),
                    SgdState(momentum_buf=jax.tree.map(lambda t: t[1], flat, is_leaf=is_tup)),
                )
            return sgd_init, upd
        return sgd_init, lambda g, p, s, lr, wd: sgd_update(
            g, p, s, lr=lr, wd=wd, momentum=momentum, nesterov=nesterov
        )
    if name == "adam":
        return adam_init, lambda g, p, s, lr, wd: adam_update(g, p, s, lr=lr, wd=wd)
    if name == "adamw":
        return adam_init, lambda g, p, s, lr, wd: adam_update(
            g, p, s, lr=lr, wd=wd, decoupled=True
        )
    if name == "rmsprop":
        return rmsprop_init, lambda g, p, s, lr, wd: rmsprop_update(
            g, p, s, lr=lr, wd=wd, momentum=momentum
        )
    raise ValueError(f"Unknown optimizer: {name}")


def step_decay_lr(base_lr: float, epoch: int, schedule) -> float:
    """Step decay on milestone epochs (reference kadaptation_clip.py:420-426)."""
    lr = base_lr
    for milestone in schedule or []:
        lr *= 0.1 if epoch >= milestone else 1.0
    return lr
