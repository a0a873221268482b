"""On-disk sweep trial-score cache: crash/preemption resume for the HP sweep.

The reference sweep is up to ~90 FULL trainings per (dataset, seed), run
strictly serially with no persistence (kadaptation_clip.py:188-243,446-466)
— an interrupted job restarts from zero.  Our sweep already collapses the
walk into 5 vmapped stages (train/sweep.py); this module adds fault
tolerance on top: every finished trial's score is appended to a JSONL file
keyed by a fingerprint of (config, data digest, epochs, seed), so a re-run
after a crash or preemption replays completed trials from disk and trains
only the remainder.  With every trial cached, the whole sweep replays in
milliseconds and selects the identical (lr, wd) — selection is recomputed
from scores, never cached, so the walk semantics stay the single source of
truth.  Beyond-reference fault-tolerance feature (SURVEY.md §5.3/§5.4: the
reference has no retries and no training-state persistence).

Safety model: the fingerprint covers the full config dump (minus pure-output
paths), the split shapes/dtypes, all labels, and a strided pixel sample of
the images — any change to method, model, data, precision, or sweep knobs
changes the key and the stale file is simply not consulted.  CODE-semantics
changes are invisible to a config+data hash, so the fingerprint also salts
in ``SEMANTICS_VERSION`` below: bump it whenever a trainer/eval change can
alter the numbers a cached score or completed job recorded (otherwise an
upgraded framework replays pre-upgrade numerics from old campaign caches —
nearly happened with the r4 natural-tail rework, where invalidation only
occurred incidentally because new config keys changed ``cfg.dump()``).
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
from typing import Optional

import numpy as np

# config keys that name OUTPUT locations: they cannot affect trial scores,
# and blanking them lets a re-run in a fresh output dir still hit the cache
# when pointed at the same cache file.
_VOLATILE_KEYS = (("OUTPUT_DIR",), ("TPU", "CHECKPOINT_DIR"), ("TPU", "SWEEP_CACHE_DIR"))

# Training/eval SEMANTICS version: part of every sweep/job fingerprint.
# Bump on any code change that can alter trial scores, best-epoch selection,
# or final accuracies under an unchanged config + data (numerics, batch/tail
# handling, eval chunking, loss/optimizer semantics).  History:
#   4  r5: 11-point mAP rebuilt on sklearn's precision_recall_curve with
#      the (r=0, p=1) sentinel + distinct-threshold tie handling, matching
#      vision-evaluation (changes voc-2007 trial scores/selection)
#   3  r5: swin shifted-window mask frame + res<=window clamp fixes (any
#      cached score from a swin-tower run predates correct attention)
#   2  r4: natural-size tail steps + natural eval chunks, method-aware
#      eval_chunk default (batch-composition parity with the reference)
#   1  r1-r3 (implicit)
SEMANTICS_VERSION = 4


def _sample_bytes(arr, max_rows: int = 64) -> bytes:
    """Cheap content digest input: a strided row sample, host-transfer bounded.

    Slicing before ``np.asarray`` keeps the device->host transfer to
    ``max_rows`` leading-axis rows even for multi-GB device-resident splits.
    """
    n = int(arr.shape[0]) if arr.ndim else 1
    stride = max(1, n // max_rows)
    return np.ascontiguousarray(np.asarray(arr[::stride])).tobytes()


def data_fingerprint(data) -> str:
    h = hashlib.sha256()
    for arr in data:
        if arr is None:
            h.update(b"none")
            continue
        h.update(str(tuple(arr.shape)).encode())
        h.update(str(arr.dtype).encode())
        # labels are tiny: hash them fully; images get the strided sample
        full = arr.ndim <= 2 and arr.size <= 1_000_000
        h.update(np.ascontiguousarray(np.asarray(arr)).tobytes() if full else _sample_bytes(arr))
    return h.hexdigest()


def sweep_fingerprint(config, data, end_epoch: int, seed: int) -> str:
    cfg = config.clone()
    cfg.defrost()
    for path in _VOLATILE_KEYS:
        node = cfg
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = ""
    h = hashlib.sha256()
    h.update(f"semantics={SEMANTICS_VERSION};".encode())
    h.update(cfg.dump().encode())
    h.update(f"end_epoch={end_epoch};seed={seed};".encode())
    h.update(data_fingerprint(data).encode())
    return h.hexdigest()[:24]


class SweepCache:
    """Append-only JSONL score store for one sweep fingerprint.

    Keys are exact-repr (lr, wd) pairs — the grid values are bit-identical
    across runs because both runs derive them from the same ``np.logspace``.
    """

    def __init__(self, directory: str, fingerprint: str):
        self.path = os.path.join(directory, f"sweep_{fingerprint}.jsonl")
        self._scores: dict[tuple[str, str], float] = {}
        os.makedirs(directory, exist_ok=True)
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        rec = json.loads(line)
                        self._scores[(rec["lr"], rec["wd"])] = float(rec["score"])
                    except (ValueError, KeyError):
                        # a run killed mid-write leaves one truncated tail
                        # line; everything before it is still good
                        logging.warning("sweep cache %s: skipping corrupt line", self.path)
            if self._scores:
                logging.info(
                    "sweep cache %s: resuming with %d finished trials",
                    self.path, len(self._scores),
                )

    @staticmethod
    def _key(lr: float, wd: float) -> tuple[str, str]:
        return (repr(float(lr)), repr(float(wd)))

    def __len__(self) -> int:
        return len(self._scores)

    def get(self, lr: float, wd: float) -> Optional[float]:
        return self._scores.get(self._key(lr, wd))

    def put(self, lr: float, wd: float, score: float) -> None:
        k = self._key(lr, wd)
        self._scores[k] = float(score)
        with open(self.path, "a") as f:
            f.write(json.dumps({"lr": k[0], "wd": k[1], "score": float(score)}) + "\n")
            f.flush()
            os.fsync(f.fileno())


def open_sweep_cache(config, data, end_epoch: int, seed: int) -> Optional[SweepCache]:
    """Build the cache when ``TPU.SWEEP_CACHE_DIR`` is set; else None."""
    directory = str(config.TPU.get("SWEEP_CACHE_DIR", "") or "")
    if not directory or directory == "auto":
        # 'auto' is resolved to <run output dir>/sweep_cache by the CLI
        # (commands/_common.py); library callers that never resolved it get
        # no cache rather than a literal ./auto directory
        return None
    fp = sweep_fingerprint(config, data, end_epoch, seed)
    return SweepCache(directory, fp)
