#!/usr/bin/env python
"""Diff two profile traces: find ops whose TOTAL time grows with batch size.

At fixed n_train, doubling the batch halves the step count; an op doing
per-image work keeps a ~constant total. Ops whose total grows are superlinear
in batch — the batch-scaling culprits.

Usage: python scripts/diff_traces.py TRACE_A_DIR TRACE_B_DIR
"""
import collections
import glob
import gzip
import json
import sys


def load(trace_dir):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names = {
        e["pid"]: e["args"]["name"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu_pids = {p for p, nm in pid_names.items() if "TPU" in nm.upper()}
    agg = collections.defaultdict(float)
    shapes = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        if not name or name[0].isdigit() or name.startswith(("while", "conditional", "jit_", "body")):
            continue
        agg[name] += e.get("dur", 0)
        ln = (e.get("args") or {}).get("long_name", "")
        if ln:
            shapes[name] = ln[:140]
    return agg, shapes


a, sa = load(sys.argv[1])
b, sb = load(sys.argv[2])
rows = []
for name, tb in b.items():
    ta = a.get(name, 0.0)
    rows.append((tb - ta, ta, tb, name))
rows.sort(reverse=True)
print(f"{'delta_ms':>9} {'A_ms':>8} {'B_ms':>8}  op | B-shape")
for d, ta, tb, name in rows[:20]:
    print(f"{d/1e3:>9.2f} {ta/1e3:>8.2f} {tb/1e3:>8.2f}  {name} | {sb.get(name,'')[:110]}")
print("\ntotals: A =", round(sum(a.values())/1e3, 1), "ms  B =", round(sum(b.values())/1e3, 1), "ms")
