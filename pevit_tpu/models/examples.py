"""Backbone plugin templates.

Reference: models/cls_example.py and models/clip_example.py — stubs showing
the plugin contract for adding a new backbone to the benchmark.  Here the
contract is the ``Backbone`` facade (factory.py): provide a parameter pytree
plus jittable forward functions.

Classifier-only plugin (cls_example):

    def get_cls_model(config) -> Backbone:
        params = ...            # your pytree
        def forward_features(params, images):  # (B, H, W, 3) float -> (B, D)
            ...
        return Backbone(name="my_model", params=params, feat_dim=D,
                        forward_features=forward_features)

Dual-tower (CLIP-style) plugin (clip_example) additionally supplies

    def encode_text(params, tokens):  # (B, L) int32 -> (B, D)
        ...

and sets ``encode_text=`` on the Backbone, which makes the model usable for
zero-shot evaluation and text-initialised classifier heads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .factory import Backbone


def get_cls_example(config) -> Backbone:
    """Minimal working classifier plugin (random projection features)."""
    dim = 64
    size = config.TRAIN.IMAGE_SIZE[0]
    params = {
        "proj": 0.02
        * jax.random.normal(jax.random.PRNGKey(0), (size * size * 3, dim), jnp.float32)
    }

    def forward_features(p, x):
        return x.reshape(x.shape[0], -1) @ p["proj"]

    return Backbone(name="cls_example", params=params, feat_dim=dim, forward_features=forward_features)


def get_clip_example(config) -> Backbone:
    """Minimal working dual-tower plugin."""
    dim = 64
    size = config.TRAIN.IMAGE_SIZE[0]
    ctx = config.MODEL.SPEC.TEXT.CONTEXT_LENGTH
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "img_proj": 0.02 * jax.random.normal(k1, (size * size * 3, dim), jnp.float32),
        "tok_embed": 0.02 * jax.random.normal(k2, (49408, dim), jnp.float32),
    }

    def forward_features(p, x):
        return x.reshape(x.shape[0], -1) @ p["img_proj"]

    def encode_text(p, tokens):
        return jnp.mean(p["tok_embed"][tokens], axis=1)

    return Backbone(
        name="clip_example", params=params, feat_dim=dim,
        forward_features=forward_features, encode_text=encode_text,
    )
