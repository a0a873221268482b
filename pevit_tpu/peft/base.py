"""PEFT method registry: parameter injection + forward hooks + trainability.

Replaces the reference's four vendored CLIP copies and its name-substring
freezing protocol (vision_benchmark/evaluation/kadaptation_clip.py:104-123)
with explicit parameter-tree partitioning: a method contributes

* an ``init(rng, n_layers, width) -> {"shared":..., "layers":...}`` tree
  (``layers`` leaves carry a leading layer axis, matching the scanned core),
* ``BlockHooks`` callbacks wired into the visual tower only (the text tower
  never carries PEFT params — reference model.py:956/1029),
* a trainability rule (for PEFT methods the whole PEFT tree is trainable,
  which reproduces the reference's 'adapter'/'phm_rule'/'attn.b'/'compacter'
  substring matches exactly).

Methods: kadaptation | lora | adapter | compacter | linear_probe |
full_finetune | zeroshot.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax

from ..core.clip import BlockHooks, CLIPSpec
from . import adapter as _adapter
from . import compacter as _compacter
from . import kadaptation as _kadaptation
from . import lora as _lora

PEFT_METHODS = ("kadaptation", "lora", "adapter", "compacter")
ALL_METHODS = PEFT_METHODS + ("linear_probe", "full_finetune", "zeroshot")


@dataclasses.dataclass(frozen=True)
class PeftConfig:
    """Static (hashable) PEFT configuration threaded through jit."""

    method: str = "linear_probe"
    reference_compat: bool = True
    # KAdaptation Dropout(0.5)-on-H override (model.py:516); parity tests set
    # 0.0 to make the whole training trajectory deterministic on both stacks
    kadapt_dropout_p: float = _kadaptation.KDROPOUT_P

    def __post_init__(self):
        if self.method not in ALL_METHODS:
            raise ValueError(f"Unknown PEFT method: {self.method}")

    @property
    def has_peft_params(self) -> bool:
        return self.method in PEFT_METHODS


_INITS = {
    "kadaptation": _kadaptation.init_params,
    "lora": _lora.init_params,
    "adapter": _adapter.init_params,
    "compacter": _compacter.init_params,
}


def init_peft(rng: jax.Array, cfg: PeftConfig, spec: CLIPSpec) -> Optional[dict]:
    """Initialise the PEFT parameter tree for the visual tower (or None)."""
    if not cfg.has_peft_params:
        return None
    if spec.vision_rn is not None:
        raise ValueError(
            f"PEFT method {cfg.method!r} requires a ViT visual tower; the RN "
            "towers load frozen (reference model.py:1076-1084 has no kattention)"
        )
    return _INITS[cfg.method](rng, spec.vision.layers, spec.vision.width)


def make_hooks(cfg: PeftConfig, spec: CLIPSpec, train: bool) -> Optional[BlockHooks]:
    """Build the per-block callbacks for the visual tower."""
    n_head = spec.vision.heads
    if cfg.method == "kadaptation":
        return BlockHooks(
            attn_delta=partial(
                _kadaptation.attn_delta,
                n_head=n_head,
                train=train,
                reference_compat=cfg.reference_compat,
                dropout_p=cfg.kadapt_dropout_p,
            )
        )
    if cfg.method == "lora":
        return BlockHooks(
            attn_delta=partial(
                _lora.attn_delta,
                n_head=n_head,
                train=train,
                reference_compat=cfg.reference_compat,
            )
        )
    if cfg.method == "adapter":
        return BlockHooks(mlp_post=partial(_adapter.mlp_post, train=train))
    if cfg.method == "compacter":
        return BlockHooks(mlp_post=partial(_compacter.mlp_post, train=train))
    return None


def peft_num_params(cfg: PeftConfig, spec: CLIPSpec) -> int:
    if not cfg.has_peft_params:
        return 0
    mod = {
        "kadaptation": _kadaptation,
        "lora": _lora,
        "adapter": _adapter,
        "compacter": _compacter,
    }[cfg.method]
    return mod.num_params(spec.vision.layers, spec.vision.width)


def peft_trainable_filter(cfg: PeftConfig):
    """Return ``pred(path_tuple) -> bool`` over the PEFT tree.

    Reproduces the reference's name-substring freezing exactly:
    * kadaptation: 'adapter' (q/v factors) + 'phm_rule' (shared rules) +
      'attn.b' (per-layer bias) all trainable (kadaptation_clip.py:118-122),
    * lora / adapter: 'adapter' => whole tree trainable
      (lora_clip.py:120-121, adapter_tuning_clip.py:116-117),
    * compacter: only 'compacter' matches (compacter_clip.py:121-122) — the
      SHARED phm_rule lives at ``visual.transformer.phm_rule`` and therefore
      stays FROZEN at its U(-1,1) init.  This is why the README reports
      77,907 trainable params (48,384 backbone-side), not 48,448.
    """
    if cfg.method == "compacter":
        return lambda path: len(path) > 0 and path[0] != "shared"
    return lambda path: True


def method_from_command(name: str) -> str:
    """Map the reference command names to method keys."""
    return {
        "kronecker_adaptation_clip": "kadaptation",
        "adapter_clip": "adapter",
        "lora_clip": "lora",
        "compacter_clip": "compacter",
        "linear_probe": "linear_probe",
        "finetune": "full_finetune",
        "zeroshot": "zeroshot",
    }[name]
