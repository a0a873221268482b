"""MLM token corruption (pevit_tpu/data/mlm.py) vs the reference sampler's
contract (mask_tokens.py:5-37): selection rate, 80/10/10 split, special-token
protection, label semantics, and jit/vmap safety."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pevit_tpu.data.mlm import IGNORE_INDEX, mask_tokens

VOCAB = 49409
MASK = 49408
SOT, EOT = 49406, 49407


def _batch(n=512, length=77, seed=0):
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, 49000, (n, length))
    toks[:, 0] = SOT
    toks[:, -1] = EOT
    return jnp.asarray(toks)


def test_special_tokens_never_touched():
    toks = _batch()
    inputs, labels = mask_tokens(
        jax.random.PRNGKey(0), toks, mask_token=MASK, vocab_size=VOCAB,
        special_tokens=(SOT, EOT, MASK),
    )
    assert (np.asarray(inputs[:, 0]) == SOT).all()
    assert (np.asarray(inputs[:, -1]) == EOT).all()
    assert (np.asarray(labels[:, 0]) == IGNORE_INDEX).all()
    assert (np.asarray(labels[:, -1]) == IGNORE_INDEX).all()


def test_label_semantics_and_shapes():
    toks = _batch()
    inputs, labels = mask_tokens(
        jax.random.PRNGKey(1), toks, mask_token=MASK, vocab_size=VOCAB,
        special_tokens=(SOT, EOT),
    )
    inputs, labels, toks = map(np.asarray, (inputs, labels, toks))
    sel = labels != IGNORE_INDEX
    # labels carry the ORIGINAL ids exactly where selected
    assert (labels[sel] == toks[sel]).all()
    # unselected inputs are untouched
    assert (inputs[~sel] == toks[~sel]).all()
    assert inputs.shape == labels.shape == toks.shape


def test_80_10_10_statistics():
    toks = _batch(n=2048)
    inputs, labels = mask_tokens(
        jax.random.PRNGKey(2), toks, mask_token=MASK, vocab_size=VOCAB,
        special_tokens=(SOT, EOT),
    )
    inputs, labels, toks = map(np.asarray, (inputs, labels, toks))
    sel = labels != IGNORE_INDEX
    n_sel = sel.sum()
    n_maskable = (toks != SOT).sum() - (toks == EOT).sum()
    assert n_sel / n_maskable == pytest.approx(0.15, rel=0.05)
    frac_masked = (inputs[sel] == MASK).mean()
    kept = (inputs[sel] == toks[sel]).mean()
    assert frac_masked == pytest.approx(0.80, rel=0.02)
    # 10% kept + ~10% random (a random draw collides with the original
    # with prob 1/VOCAB — negligible)
    assert kept == pytest.approx(0.10, rel=0.15)
    randomized = 1.0 - frac_masked - kept
    assert randomized == pytest.approx(0.10, rel=0.15)


def test_explicit_special_tokens_mask_and_jit():
    toks = _batch(n=8)
    protect_all = jnp.ones(toks.shape, jnp.int32)
    f = jax.jit(lambda r, t, m: mask_tokens(
        r, t, mask_token=MASK, vocab_size=VOCAB, special_tokens_mask=m))
    inputs, labels = f(jax.random.PRNGKey(3), toks, protect_all)
    assert (np.asarray(inputs) == np.asarray(toks)).all()
    assert (np.asarray(labels) == IGNORE_INDEX).all()
