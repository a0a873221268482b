"""The README's "Python API" example must actually run.

Extracts the python code block under ``## Python API`` from README.md and
executes it verbatim, with three size-only substitutions (flagship spec ->
tiny test spec, 224 -> 32 px, 5 -> 2 epochs) so it finishes in seconds on
the CPU test host.  Every substitution is asserted to have matched, so any
README edit that breaks the example (or silently drifts away from the
library surface) fails here.
"""

import re
from pathlib import Path

from .test_trainer_e2e import TINY

README = Path(__file__).resolve().parents[1] / "README.md"


def _example_block() -> str:
    text = README.read_text()
    m = re.search(r"## Python API.*?```python\n(.*?)```", text, re.S)
    assert m, "README.md lost its '## Python API' python block"
    return m.group(1)


def test_readme_python_api_example_runs():
    code = _example_block()
    subs = [
        ("CLIPSpec.vit_b32()", "TINY_SPEC"),
        ("(80, 224, 224, 3)", "(80, 32, 32, 3)"),
        ("end_epoch=5", "end_epoch=2"),
    ]
    for old, new in subs:
        assert old in code, f"README example drifted: {old!r} not found"
        code = code.replace(old, new)

    ns = {"TINY_SPEC": TINY}
    exec(compile(code, str(README), "exec"), ns)

    trials = ns["trials"]
    assert len(trials) == 2
    best = ns["best"]
    assert best["best_logits"].shape == (16, 10)
    import numpy as np

    assert np.isfinite(np.asarray(best["best_logits"])).all()
    assert 0.0 <= best["best_score"] <= 100.0
