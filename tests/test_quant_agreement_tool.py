"""CLI smoke for tools/quant_agreement.py (r4 VERDICT next #5).

The quant math itself is bounded in tests/test_quant_serving.py; this
exercises the TOOL end-to-end — argument parsing, the serving-path pair
(fp vs weight-only int8), and the report contract docs/serving.md cites.
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


def test_quant_agreement_cli_smoke(tmp_path):
    import quant_agreement

    out = tmp_path / "qa.json"
    report = quant_agreement.main(
        ["--cpu", "--models", "b32", "--n", "8", "--batch", "8",
         "--out", str(out)]
    )
    assert report["backend"] == "cpu"
    m = report["b32"]
    assert m["n_images"] == 8
    assert 0.0 <= m["top1_agreement"] <= 1.0
    assert m["max_rel_logit_err"] >= 0.0
    assert m["weights"] == "random-init"
    # top-2 margin context fields present (near-tie headroom)
    assert m["p5_top2_margin"] <= m["median_top2_margin"]
    on_disk = json.loads(out.read_text())
    assert on_disk["b32"]["top1_agreement"] == m["top1_agreement"]
