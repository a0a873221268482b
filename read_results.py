#!/usr/bin/env python
"""Aggregate per-(dataset, seed) results from prediction artifacts.

Result-scraping tool in the spirit of the reference's root-level
read_results.py/read_txt.py: walks an OUTPUT tree, parses the
``best acc is:...`` summary TXTs (schema written by
pevit_tpu/commands/_common.py:dump_artifacts), and prints a per-dataset
table + the 20-dataset average used by the README headline numbers.

Usage: python read_results.py <output_root> [--csv out.csv]
"""

from __future__ import annotations

import argparse
import re
from collections import defaultdict
from pathlib import Path

LINE_RE = re.compile(r"best acc is:([0-9.eE+-]+), num_params is:(\S+), n_trainable_params is:([0-9.eE+-]+),")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", type=str)
    ap.add_argument("--csv", type=str, default=None)
    args = ap.parse_args()

    name_re = re.compile(r"seed(\d+)_(.*)\.txt")
    results = defaultdict(dict)  # dataset -> seed -> acc
    trainable = {}
    for txt in Path(args.root).rglob("seed*_*.txt"):
        m = LINE_RE.search(txt.read_text())
        nm = name_re.match(txt.name)
        if not m or not nm:
            continue
        seed, dataset = int(nm.group(1)), nm.group(2)
        results[dataset][seed] = float(m.group(1))
        trainable[dataset] = float(m.group(3)) * 1e6

    rows = []
    for dataset in sorted(results):
        accs = list(results[dataset].values())
        rows.append((dataset, sum(accs) / len(accs), len(accs), trainable.get(dataset, 0)))

    width = max((len(r[0]) for r in rows), default=10)
    print(f"{'dataset':<{width}}  mean_acc  n_seeds  trainable_params")
    for dataset, acc, n, tp in rows:
        print(f"{dataset:<{width}}  {acc:8.3f}  {n:7d}  {tp:16.0f}")
    if rows:
        avg = sum(r[1] for r in rows) / len(rows)
        avg_tp = sum(r[3] for r in rows) / len(rows)
        print(f"{'AVERAGE':<{width}}  {avg:8.3f}  {'':7}  {avg_tp:16.0f}")
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("dataset,mean_acc,n_seeds,trainable_params\n")
            for r in rows:
                f.write(",".join(str(x) for x in r) + "\n")


if __name__ == "__main__":
    main()
