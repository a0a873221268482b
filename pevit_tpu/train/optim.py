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


# --- weight-decay masks ------------------------------------------------------

def _path_keys(kp) -> list:
    return [str(k.key) if hasattr(k, "key") else str(getattr(k, "idx", k)) for k in kp]


def build_wd_mask(params, without_wd_list, *, timm_filter: bool = False):
    """Per-leaf 0/1 weight-decay multipliers.

    Mirrors reference optim/build.py:18-85 (_set_wd): 'ln'/'bn' rules zero
    decay on normalisation scale+bias, 'bias' on every *.bias leaf ('gn' and
    'depthwise' have no counterpart in these trees).  ``timm_filter``
    reproduces timm create_optimizer's default filter_bias_and_bn: no decay
    on any rank<=1 parameter.  Returns None when nothing masks (so callers
    keep the specialised fast path).
    """
    rules = set(without_wd_list or [])

    def is_ln(k: str) -> bool:
        return (
            k.startswith("ln")
            or k in ("norm", "norm1", "norm2", "patch_norm")
            or k.startswith("norm_")  # peft adapter norm_scale/norm_bias
            or k.startswith("adapter_norm")
        )

    def leaf_mask(kp, leaf):
        keys = _path_keys(kp)
        last = keys[-1] if keys else ""
        if timm_filter and getattr(leaf, "ndim", 2) <= 1:
            return 0.0
        if "ln" in rules and any(is_ln(k) for k in keys):
            return 0.0
        if "bn" in rules and any(k.startswith("bn") for k in keys):
            return 0.0
        if "bias" in rules and last in ("bias", "norm_bias"):
            return 0.0
        return 1.0

    mask = jax.tree_util.tree_map_with_path(leaf_mask, params)
    if all(m == 1.0 for m in jax.tree.leaves(mask)):
        return None
    return mask


# --- dispatch --------------------------------------------------------------

def make_optimizer(name: str, *, momentum=0.9, nesterov=False, lr_scales=None, wd_mask=None):
    """Return (init_fn, update_fn(grads, params, state, lr, wd)).

    ``lr_scales``: optional pytree of per-leaf LR multipliers implementing
    TRAIN.TWO_LR (reference optim/build.py:100-117 — backbone params train at
    0.1x the head LR).

    ``wd_mask``: optional pytree of per-leaf 0/1 weight-decay multipliers
    implementing TRAIN.WITHOUT_WD_LIST (reference optim/build.py:18-85 puts
    ln/bn/gn/bias leaves in a wd=0 param group) and the timm
    filter_bias_and_bn behaviour.  ``wd`` stays a traced scalar so the
    hyperparameter sweep can still vmap over it: the mask is folded into the
    gradient (coupled decay) or the decoupled step (adamw), both exactly
    equivalent to per-group wd=0.
    """
    name = name.lower()
    if wd_mask is not None:
        inner_init, inner_upd = make_optimizer(
            name, momentum=momentum, nesterov=nesterov, lr_scales=lr_scales
        )
        if name == "adamw":
            # decoupled: p -= lr*(adam_step + wd*p)  ==  wd=0 update then
            # subtracting lr*wd*mask*p_old
            def upd(g, p, s, lr, wd):
                new_p, new_s = inner_upd(g, p, s, lr, 0.0)
                new_p = jax.tree.map(
                    lambda np_, po, mk: np_ - lr * wd * mk * po, new_p, p, wd_mask
                )
                return new_p, new_s
        else:
            # coupled: g' = g + wd*mask*p, then a wd=0 update
            def upd(g, p, s, lr, wd):
                g2 = jax.tree.map(lambda gl, pl, mk: gl + wd * mk * pl, g, p, wd_mask)
                return inner_upd(g2, p, s, lr, 0.0)

        return inner_init, upd
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
