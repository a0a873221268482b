#!/usr/bin/env python
"""Diff a finished ELEVATER campaign against BASELINE.md at a tolerance.

Final step of the day-1 online parity runbook (tools/run_full_parity.sh):
walks each method's OUTPUT tree (the ``seed{S}_{dataset}.txt`` artifacts the
commands write — same scraping contract as read_results.py), averages the
3-seed accuracy over the 20 ELEVATER datasets, and compares to the
published per-method averages (reference README.md:84-89, mirrored in
BASELINE.md) at ±tolerance (default 0.3 pts, the BASELINE.json bar).

    python tools/check_parity_vs_baseline.py --out OUT \
        --methods kadaptation,lora,adapter,compacter,linear_probe,finetune

Layout: OUT/<method>/... (any depth).  Exit 0 iff every requested method is
within tolerance AND has all 20 datasets x 3 seeds; 1 otherwise.
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import defaultdict
from pathlib import Path

# reference README.md:84-89 (avg top-1 over the 20 ELEVATER datasets, 5-shot)
PUBLISHED = {
    "kadaptation": 68.92,
    "adapter": 65.08,
    "lora": 61.48,
    "compacter": 62.79,
    "finetune": 65.49,
    "linear_probe": 66.32,
}

EXPECTED_DATASETS = 20
EXPECTED_SEEDS = 3

LINE_RE = re.compile(r"best acc is:([0-9.eE+-]+),")
NAME_RE = re.compile(r"seed(\d+)_(.*)\.txt")


def scrape(root: Path) -> dict:
    """dataset -> {seed: acc} from all seed*_*.txt under root."""
    results: dict = defaultdict(dict)
    for txt in root.rglob("seed*_*.txt"):
        m = LINE_RE.search(txt.read_text())
        nm = NAME_RE.match(txt.name)
        if not m or not nm:
            continue
        results[nm.group(2)][int(nm.group(1))] = float(m.group(1))
    return results


def check_method(method: str, root: Path, tol: float) -> tuple:
    """Returns (ok, message)."""
    if method not in PUBLISHED:
        return False, f"{method}: no published baseline (choices: {sorted(PUBLISHED)})"
    if not root.exists():
        return False, f"{method}: output dir {root} does not exist"
    results = scrape(root)
    accs = []
    missing = []
    for ds, seeds in sorted(results.items()):
        if len(seeds) < EXPECTED_SEEDS:
            missing.append(f"{ds} has {len(seeds)}/{EXPECTED_SEEDS} seeds")
        accs.append(sum(seeds.values()) / len(seeds))
    if len(results) < EXPECTED_DATASETS:
        missing.append(f"only {len(results)}/{EXPECTED_DATASETS} datasets present")
    if not accs:
        return False, f"{method}: no artifacts under {root}"
    mean = sum(accs) / len(accs)
    if mean <= 1.5:  # fraction-scale artifacts -> percent
        mean *= 100.0
    pub = PUBLISHED[method]
    delta = mean - pub
    ok = abs(delta) <= tol and not missing
    msg = (f"{method}: mean {mean:.2f} vs published {pub:.2f} "
           f"(delta {delta:+.2f}, tol ±{tol})")
    if missing:
        msg += " | INCOMPLETE: " + "; ".join(missing)
    return ok, msg


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="campaign output root")
    ap.add_argument("--methods", default="kadaptation,lora,adapter,compacter,linear_probe")
    ap.add_argument("--tol", type=float, default=0.3)
    args = ap.parse_args(argv)
    all_ok = True
    for method in [m.strip() for m in args.methods.split(",") if m.strip()]:
        ok, msg = check_method(method, Path(args.out) / method, args.tol)
        print(("[PASS] " if ok else "[FAIL] ") + msg)
        all_ok &= ok
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
