"""Adapter/head checkpoint save + resume.

The reference never saves training state (SURVEY.md §5.4 — best-epoch logits
are held in memory and dumped as JSON).  This rebuild adds proper
checkpointing of the tiny trainable state (PEFT params + head + optimiser +
bn stats: ~80KB-5MB) via Orbax, with resume.  The frozen backbone is NOT
saved — it is reproducible from the upstream CLIP checkpoint.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        out[prefix[:-1] + "__none__"] = np.zeros(0)
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_trainable(path: str, trainable: Any, step: int = 0) -> None:
    """Save the trainable pytree; prefers Orbax, falls back to npz."""
    os.makedirs(path, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckpter = ocp.StandardCheckpointer()
        ckpter.save(os.path.join(os.path.abspath(path), f"step_{step}"), trainable, force=True)
        ckpter.wait_until_finished()
        logging.info("=> saved checkpoint (orbax) to %s/step_%d", path, step)
    except Exception as e:  # pragma: no cover
        logging.warning("orbax save failed (%s); using npz fallback", e)
        np.savez(os.path.join(path, f"step_{step}.npz"), **_flatten(trainable))


def restore_trainable(path: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore a trainable pytree saved by ``save_trainable``."""
    import orbax.checkpoint as ocp

    if step is None:
        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(path) if d.startswith("step_")
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        step = steps[-1]
    ckpter = ocp.StandardCheckpointer()
    restored = ckpter.restore(os.path.join(os.path.abspath(path), f"step_{step}"), target)
    logging.info("=> restored checkpoint from %s/step_%d", path, step)
    return restored
