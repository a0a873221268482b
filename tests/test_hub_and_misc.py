"""Dataset hub facade, DeCLIP normalizer, prediction-submission validation."""

import numpy as np
import pytest

from pevit_tpu.commands.prediction_submission import (
    PredictionSubmission,
    validate_submission_dict,
)
from pevit_tpu.data.hub import DatasetHub, get_dataset_hub
from pevit_tpu.models.declip import normalize_declip_state_dict


def test_hub_lists_elevater_datasets():
    hub = get_dataset_hub()
    names = {d["name"] for d in hub.list_data_version_and_types()}
    assert "cifar-10" in names and len(names) == 20


def test_hub_resolves_local_split(tmp_path):
    np.savez(tmp_path / "test.npz", images=np.zeros((4, 8, 8, 3), np.uint8), labels=np.arange(4))
    hub = DatasetHub(str(tmp_path))
    ds, info, _ = hub.create_dataset_manifest("https://example", str(tmp_path), "cifar-10", "test_purpose")
    assert len(ds) == 4 and info["name"] == "cifar-10"


def test_hub_missing_split_returns_none(tmp_path):
    hub = DatasetHub(str(tmp_path))
    assert hub.create_dataset_manifest("https://example", str(tmp_path), "cifar-10", "train_purpose") is None


def test_declip_normalizer():
    sd = {"state_dict": {"module.visual.blocks.0.w": 1, "module.logit_scale": 2}}
    out = normalize_declip_state_dict(sd)
    assert out == {"visual.blocks.0.w": 1, "logit_scale": 2}


def test_submission_validation():
    good = {
        "model_name": "ViT-B/32",
        "dataset_name": "cifar-10",
        "n_shot": 5,
        "rnd_seeds": [0, 1],
        "predictions": [np.full((4, 2), 0.5).tolist(), np.full((4, 2), 0.5).tolist()],
    }
    sub = validate_submission_dict(good)
    assert isinstance(sub, PredictionSubmission)

    bad = dict(good, predictions=[np.full((4, 2), 0.9).tolist()] * 2)
    with pytest.raises(ValueError, match="simplex"):
        validate_submission_dict(bad)

    with pytest.raises(ValueError, match="align"):
        validate_submission_dict(dict(good, rnd_seeds=[0]))

    with pytest.raises(ValueError, match="track"):
        validate_submission_dict(dict(good, track="nope"))


def test_legacy_model_specs_match_reference():
    """pevit_tpu/config/models.py keeps the reference's dead-but-public
    MODEL_SPECS constants (reference config/models.py:8-51) loadable with
    identical keys and defaults — diffed by AST so the check needs no yacs."""
    import ast
    from pathlib import Path

    from pevit_tpu.config.models import HIGH_RESOLUTION_NET, MODEL_SPECS, RESNET, RESNEXT

    ref_path = Path("/root/reference/vision_benchmark/config/models.py")
    if not ref_path.exists():
        pytest.skip("reference checkout unavailable")

    env = {}

    def resolve(node):
        return {} if isinstance(node, ast.Call) else ast.literal_eval(node)

    for stmt in ast.parse(ref_path.read_text()).body:
        if not isinstance(stmt, ast.Assign):
            continue
        tgt = stmt.targets[0]
        if isinstance(tgt, ast.Name):
            if isinstance(stmt.value, ast.Dict):
                env[tgt.id] = {
                    ast.literal_eval(k): env[v.id]
                    for k, v in zip(stmt.value.keys, stmt.value.values)
                }
            else:
                env[tgt.id] = resolve(stmt.value)
        else:  # attribute chain like HIGH_RESOLUTION_NET.STAGE2.NUM_MODULES
            chain, n = [], tgt
            while isinstance(n, ast.Attribute):
                chain.append(n.attr)
                n = n.value
            base = env[n.id]
            for a in reversed(chain[1:]):
                base = base[a]
            base[chain[0]] = resolve(stmt.value)

    def flat(d, p=""):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out.update(flat(v, p + k + "."))
            else:
                out[p + k] = v
        return out

    assert flat(HIGH_RESOLUTION_NET) == flat(env["HIGH_RESOLUTION_NET"])
    assert flat(RESNEXT) == flat(env["RESNEXT"])
    assert flat(RESNET) == flat(env["RESNET"])
    assert set(MODEL_SPECS) == set(env["MODEL_SPECS"]) == {"cls_hrnet"}
