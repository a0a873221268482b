"""Masked-language-model token corruption (BERT 80/10/10), TPU-native.

The reference ships this as an eager torch helper used by the DeCLIP
family's text side during pre-training
(models/declip_model/utils/text_utils/mask_tokens.py:5-37, called from
text_encoder/text_transformer.py:160 when ``text_mask_type='MLM'``); the
benchmark's evaluation paths never enable it.  It is ported for inventory
completeness as a pure function: explicit PRNG key, fully vectorized
(no per-token Python loop), jit/vmap-safe — the idiomatic JAX shape of
the same sampler so a DeCLIP pre-training loop can run on TPU.

Semantics match the reference exactly:
  * each non-special token is selected with prob ``mlm_probability``;
  * labels are the ORIGINAL ids at selected positions, -100 elsewhere
    (the standard ignore_index — only masked positions contribute loss);
  * of the selected: 80% -> ``mask_token``, 10% -> uniform-random vocab
    id, 10% kept unchanged (the reference draws the 10/10 split as an
    independent p=0.5 coin on the non-replaced half, reproduced here).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["mask_tokens"]

IGNORE_INDEX = -100


def mask_tokens(
    rng: jax.Array,
    tokens: jax.Array,
    *,
    mask_token: int,
    vocab_size: int,
    special_tokens: Sequence[int] = (),
    mlm_probability: float = 0.15,
    special_tokens_mask: jax.Array | None = None,
):
    """Corrupt ``tokens`` for MLM training; returns ``(inputs, labels)``.

    ``tokens`` is any integer array (a sequence or a batch of sequences).
    ``special_tokens`` positions are never selected; pass
    ``special_tokens_mask`` (same shape, 1 = protected) to override the
    membership test, mirroring the reference's optional argument.
    """
    tokens = jnp.asarray(tokens)
    if special_tokens_mask is None:
        protected = jnp.zeros(tokens.shape, bool)
        for t in special_tokens:
            protected |= tokens == t
    else:
        protected = jnp.asarray(special_tokens_mask).astype(bool)

    k_sel, k_rep, k_coin, k_word = jax.random.split(rng, 4)
    selected = (
        jax.random.bernoulli(k_sel, mlm_probability, tokens.shape) & ~protected
    )
    labels = jnp.where(selected, tokens, IGNORE_INDEX)

    replaced = jax.random.bernoulli(k_rep, 0.8, tokens.shape) & selected
    randomized = (
        jax.random.bernoulli(k_coin, 0.5, tokens.shape) & selected & ~replaced
    )
    random_words = jax.random.randint(k_word, tokens.shape, 0, vocab_size, tokens.dtype)

    inputs = jnp.where(replaced, jnp.asarray(mask_token, tokens.dtype), tokens)
    inputs = jnp.where(randomized, random_words, inputs)
    return inputs, labels
