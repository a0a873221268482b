"""Device mesh + sharding specs.

The reference carries idle torch.distributed scaffolding (utils/comm.py,
DIST_BACKEND='nccl' — never exercised; SURVEY.md §2.9).  Here multi-chip is
first-class and declarative: a ("data", "model") mesh over ICI, batch sharded
on "data" (the primary parallelism — few-shot ViT-B fits per-chip), and
Megatron-style tensor-parallel specs on the transformer weights so TP is a
config knob rather than a rewrite:

* attn in_proj / mlp c_fc: column-parallel (output features on "model"),
* attn out_proj / mlp c_proj: row-parallel (input features on "model"),
* everything else replicated.

XLA/GSPMD inserts the all-reduces; the LR x world-size rule
(config/default.py:257) maps to the "data" axis size.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, n_model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model]
    return Mesh(np.asarray(devices).reshape(n_data, n_model), ("data", "model"))


def _block_leaf_spec(path: tuple) -> P:
    """Tensor-parallel spec for a stacked-block leaf (leading layer axis)."""
    leaf = path[-1]
    parent = path[-2] if len(path) >= 2 else ""
    grand = path[-3] if len(path) >= 3 else ""
    if leaf == "kernel":
        if grand == "attn" and parent == "in_proj":
            return P(None, None, "model")  # (L, C, 3C) column-parallel
        if grand == "attn" and parent == "out_proj":
            return P(None, "model", None)  # (L, C, C) row-parallel
        if grand == "mlp" and parent == "c_fc":
            return P(None, None, "model")
        if grand == "mlp" and parent == "c_proj":
            return P(None, "model", None)
    if leaf == "bias" and parent in ("in_proj", "c_fc"):
        return P(None, "model")
    return P()


def clip_param_specs(params: dict) -> dict:
    """PartitionSpec tree for a CLIP parameter pytree."""

    def spec(keypath, leaf):
        path = tuple(
            str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k)))) for k in keypath
        )
        if "blocks" in path:
            return _block_leaf_spec(path)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = clip_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_batch(batch, mesh: Mesh):
    """Shard leading (batch) axis over the "data" mesh axis."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
