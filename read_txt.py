#!/usr/bin/env python
"""Per-dataset result table from prediction TXT artifacts.

Companion scraper to read_results.py (reference repo ships both
read_txt.py:38-136 and read_results.py:39-122); this one walks a single
``predictions/<exp_name>/`` folder and prints per-seed accuracy plus the
trainable-parameter count per dataset.

Usage: python read_txt.py <predictions_folder>
"""

from __future__ import annotations

import argparse
import re
from collections import defaultdict
from pathlib import Path

LINE_RE = re.compile(
    r"best acc is:([0-9.eE+-]+), num_params is:(\S+?), n_trainable_params is:([0-9.eE+-]+), backbone_params is:(\S+?)\."
)
NAME_RE = re.compile(r"seed(\d+)_(.*)\.txt")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("folder", type=str)
    args = ap.parse_args()

    table = defaultdict(dict)
    info = {}
    for txt in sorted(Path(args.folder).glob("seed*_*.txt")):
        nm = NAME_RE.match(txt.name)
        m = LINE_RE.search(txt.read_text())
        if not (nm and m):
            continue
        seed, dataset = int(nm.group(1)), nm.group(2)
        table[dataset][seed] = float(m.group(1))
        info[dataset] = (m.group(2), float(m.group(3)), m.group(4))

    for dataset in sorted(table):
        accs = table[dataset]
        mean = sum(accs.values()) / len(accs)
        n_params, trainable_m, backbone = info[dataset]
        seeds = ",".join(f"{s}:{a:.2f}" for s, a in sorted(accs.items()))
        print(f"{dataset}: mean={mean:.3f} ({seeds}) trainable={trainable_m}M params={n_params}")
    if table:
        overall = sum(sum(a.values()) / len(a) for a in table.values()) / len(table)
        print(f"AVERAGE over {len(table)} datasets: {overall:.3f}")


if __name__ == "__main__":
    main()
