"""Orbax save/restore round trip of a trainable tree."""

import numpy as np
import jax
import jax.numpy as jnp

from pevit_tpu.ckpt import restore_trainable, save_trainable


def test_save_restore_roundtrip(tmp_path):
    tree = {
        "peft": {"layers": {"q_a": jnp.arange(12.0).reshape(3, 4)}},
        "head": {"linear": {"kernel": jnp.ones((4, 2)), "bias": jnp.zeros((2,))}},
    }
    save_trainable(str(tmp_path / "ckpt"), tree, step=3)
    target = jax.tree.map(jnp.zeros_like, tree)
    restored = restore_trainable(str(tmp_path / "ckpt"), target)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # latest-step selection
    tree2 = jax.tree.map(lambda x: x + 1, tree)
    save_trainable(str(tmp_path / "ckpt"), tree2, step=7)
    restored2 = restore_trainable(str(tmp_path / "ckpt"), target)
    np.testing.assert_array_equal(
        np.asarray(restored2["head"]["linear"]["bias"]), np.ones(2)
    )
