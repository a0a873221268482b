"""Path-based pytree partitioning.

Replaces the reference's name-substring ``requires_grad`` freezing
(kadaptation_clip.py:104-123) with explicit partition/combine over the model
bundle ``{"clip": ..., "peft": ..., "head": ...}``: gradients are taken only
w.r.t. the trainable partition, so XLA never materialises weight-gradients
for the frozen 88M-param backbone — only activation gradients flow through it.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np


def _key_name(k) -> str:
    if isinstance(k, jax.tree_util.DictKey):
        return str(k.key)
    if isinstance(k, jax.tree_util.GetAttrKey):
        return str(k.name)
    if isinstance(k, jax.tree_util.SequenceKey):
        return str(k.idx)
    return str(k)


def path_of(keypath) -> tuple:
    return tuple(_key_name(k) for k in keypath)


def partition(tree, pred: Callable[[tuple], bool]):
    """Split ``tree`` into (matching, rest); non-selected leaves become None."""

    def sel(kp, leaf):
        return leaf if pred(path_of(kp)) else None

    def unsel(kp, leaf):
        return None if pred(path_of(kp)) else leaf

    match = jax.tree_util.tree_map_with_path(sel, tree)
    rest = jax.tree_util.tree_map_with_path(unsel, tree)
    return match, rest


def combine(a, b):
    """Merge two same-structure trees where exactly one side is non-None."""

    def pick(x, y):
        return y if x is None else x

    return jax.tree.map(pick, a, b, is_leaf=lambda x: x is None)


def count_params(tree) -> int:
    if tree is None:
        return 0
    return int(sum(np.prod(l.shape) if hasattr(l, "shape") else 1 for l in jax.tree.leaves(tree)))


def tree_paths(tree) -> list:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [path_of(kp) for kp, _ in flat]
