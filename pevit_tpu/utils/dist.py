"""Process-identity and collective helpers.

TPU-native replacement for the reference's ``utils/comm.py`` ``Comm``
singleton over ``torch.distributed`` (reference: vision_benchmark/utils/
comm.py:12-154).  In JAX the runtime owns process identity, and collectives
are expressed inside jitted/shard_mapped functions (``jax.lax.psum`` /
``all_gather``) rather than as eager library calls, so this module is thin:

* ``rank()`` / ``world_size()`` / ``local_rank()`` map to
  ``jax.process_index()`` / ``jax.process_count()``.
* ``initialize()`` wires multi-host via ``jax.distributed.initialize`` when
  coordinator env vars are present (no-op single-process, matching the
  reference where dist.init_process_group is never called in practice).
* object all_gather / reduce_dict equivalents used by logging paths.
"""

from __future__ import annotations

import os
from typing import Any

_INITIALIZED = False


def initialize() -> None:
    """Initialize multi-host JAX if a coordinator is configured; else no-op."""
    global _INITIALIZED
    if _INITIALIZED:
        return
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if coord:
        import jax

        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    _INITIALIZED = True


def rank() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def world_size() -> int:
    try:
        import jax

        return jax.process_count()
    except Exception:
        return 1


def local_rank() -> int:
    return rank()


def is_main_process() -> bool:
    return rank() == 0


def head() -> bool:  # reference Comm.head parity
    return is_main_process()


def reduce_dict(input_dict: dict, average: bool = True) -> dict:
    """Reduce scalar-dict values across processes (reference utils/comm.py:
    111-137).  Single-process fast path returns the input."""
    if world_size() == 1:
        return dict(input_dict)
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    keys = sorted(input_dict)
    vals = np.asarray([float(input_dict[k]) for k in keys])
    summed = multihost_utils.process_allgather(vals).sum(axis=0)
    if average:
        summed = summed / world_size()
    return dict(zip(keys, summed.tolist()))


def all_gather_object(obj: Any) -> list:
    """Gather arbitrary picklable objects from every process.

    Reference equivalent: utils/comm.py:68-108 (pickle-based all_gather).
    Single-process fast path returns ``[obj]``; multi-host uses
    ``jax.experimental.multihost_utils``.
    """
    if world_size() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    return list(multihost_utils.process_allgather(obj, tiled=False))
