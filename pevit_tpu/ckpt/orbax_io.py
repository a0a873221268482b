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


def _unflatten_into(target: Any, flat: dict, prefix=""):
    """Rebuild a pytree with ``target``'s structure from a ``_flatten`` dict."""
    if isinstance(target, dict):
        return {k: _unflatten_into(v, flat, f"{prefix}{k}/") for k, v in target.items()}
    if isinstance(target, (list, tuple)):
        seq = [_unflatten_into(v, flat, f"{prefix}{i}/") for i, v in enumerate(target)]
        return type(target)(seq)
    if target is None:
        return None
    key = prefix[:-1]
    if key not in flat:
        raise KeyError(f"checkpoint is missing leaf {key!r}")
    leaf = flat[key]
    ref = np.asarray(target)
    return leaf.reshape(ref.shape).astype(ref.dtype)


def restore_trainable(path: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore a trainable pytree saved by ``save_trainable``.

    Handles BOTH formats ``save_trainable`` can produce: Orbax ``step_N``
    directories and the ``step_N.npz`` fallback (save-with-fallback →
    restore must work, whichever path the save took).
    """
    if step is None:
        steps = set()
        for d in os.listdir(path):
            if d.startswith("step_"):
                tail = d[len("step_"):]
                if tail.endswith(".npz"):
                    tail = tail[: -len(".npz")]
                try:
                    steps.add(int(tail))
                except ValueError:
                    continue
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        step = max(steps)
    npz_path = os.path.join(path, f"step_{step}.npz")
    orbax_path = os.path.join(os.path.abspath(path), f"step_{step}")
    if os.path.isdir(orbax_path):
        import orbax.checkpoint as ocp

        ckpter = ocp.StandardCheckpointer()
        restored = ckpter.restore(orbax_path, target)
        logging.info("=> restored checkpoint (orbax) from %s/step_%d", path, step)
        return restored
    if os.path.exists(npz_path):
        with np.load(npz_path) as z:
            flat = {k: z[k] for k in z.files}
        restored = _unflatten_into(target, flat)
        logging.info("=> restored checkpoint (npz fallback) from %s", npz_path)
        return restored
    raise FileNotFoundError(f"no step_{step} checkpoint (orbax dir or npz) under {path}")
