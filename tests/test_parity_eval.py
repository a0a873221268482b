"""Structural checks for tools/parity_eval.py (the connected-machine
accuracy-parity harness; full smoke run is minutes — exercised manually,
see tools/parity_eval.py --smoke).

Reference grid: /root/reference/README.md:84-89 (published 20-dataset
5-shot averages per method).
"""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load():
    spec = importlib.util.spec_from_file_location(
        "parity_eval", REPO / "tools" / "parity_eval.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_methods_resolve_and_datasets_exist():
    pe = _load()
    assert len(pe.ALL_DATASETS) == 20
    for ds in pe.ALL_DATASETS:
        assert (REPO / "resources" / "datasets" / f"{ds}.yaml").exists(), ds
    for name, (modpath, avg, params) in pe.METHODS.items():
        mod = importlib.import_module(modpath)
        assert callable(mod.main), name
        if name == "zeroshot":
            # eval-only arm: no published 20-dataset average, no trainables
            assert avg is None and params == 0
        else:
            assert 50.0 < avg < 80.0
            assert params > 0


def test_cli_parses_and_defaults():
    pe = _load()
    import argparse
    # --smoke forces no-tuning fixed HPs; plain run defaults to the sweep
    ns = None
    orig = pe.main
    try:
        parsed = []

        def fake_run(method, dataset, seed, args):
            parsed.append((method, dataset, seed))
            return 0.0, {}

        pe.run_one = fake_run
        rep = pe.main(["--methods", "lora", "--datasets", "cifar10",
                       "--seeds", "0,1", "--report", "/tmp/_pe_test.json"])
        assert parsed == [("lora", "cifar10", 0), ("lora", "cifar10", 1)]
        assert rep["methods"]["lora"]["published_average_top1"] == 61.48
    finally:
        pe.main = orig
