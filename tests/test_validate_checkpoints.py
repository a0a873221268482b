"""tools/validate_checkpoints.py — the key-map auditor runs clean on
reference-layout fixtures (the same torch modules the golden parity tests
build), and flags unexpected keys / mapper failures.

This is the offline CI stand-in for validating the DeCLIP/clip_swin maps
against published checkpoints (impossible without network): when a real
checkpoint is available, the SAME command audits it.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import validate_checkpoints as vc  # noqa: E402


def _unwrap(fixture_fn):
    """Call a pytest fixture's raw function (they share these builders)."""
    if hasattr(fixture_fn, "_get_wrapped_function"):  # pytest >= 8.4
        return fixture_fn._get_wrapped_function()
    return fixture_fn.__pytest_wrapped__.obj


def test_clip_vit_fixture(tmp_path, capsys):
    from tests.test_ckpt_parity import TorchCLIP, openai_style_state_dict

    torch.manual_seed(0)
    sd = openai_style_state_dict(TorchCLIP().eval())
    np.savez(tmp_path / "clip.npz", **{k: np.asarray(v) for k, v in sd.items()})

    rc = vc.main(["--ckpt", str(tmp_path / "clip.npz")])
    rep = json.loads(capsys.readouterr().out)
    assert rep["family"] == "clip" and rep["mapper"] == "ok"
    assert rep["n_unexpected"] == 0 and rep["n_mapped"] > 0
    assert rc == 0


def test_declip_fixture(tmp_path, capsys):
    mod = pytest.importorskip("tests.test_declip_ckpt")
    pkg = _unwrap(mod.ref_pkg)()
    visual, text = mod._towers(pkg)
    model = pkg.filip.FILIP(
        visual, text, use_allgather=False, return_dense=True,
        feature_dim=mod.EMBED, dense_mapping_image=mod.VW,
        dense_mapping_language=mod.TW, dense_embed_dim=mod.DENSE,
    )
    ckpt = tmp_path / "filip.pt"
    torch.save({"model": {"module." + k: v for k, v in model.state_dict().items()}}, ckpt)

    rc = vc.main(["--ckpt", str(ckpt), "--family", "declip"])
    rep = json.loads(capsys.readouterr().out)
    assert rep["mapper"] == "ok"
    assert rep["n_unexpected"] == 0, rep["unexpected"]
    assert rc == 0


def test_clip_swin_fixture(tmp_path, capsys):
    mod = pytest.importorskip("tests.test_clip_swin_ckpt")
    ref = _unwrap(mod.ref_clip_swin)()  # the imported reference module
    torch.manual_seed(0)
    model = ref.CLIP(mod._tiny_config())
    ckpt = tmp_path / "clip_swin.pt"
    torch.save(model.state_dict(), ckpt)

    rc = vc.main(["--ckpt", str(ckpt)])
    rep = json.loads(capsys.readouterr().out)
    assert rep["family"] == "clip_swin" and rep["mapper"] == "ok"
    assert rep["n_unexpected"] == 0, rep["unexpected"]
    assert rc == 0


def test_unexpected_keys_flagged(tmp_path, capsys):
    from tests.test_ckpt_parity import TorchCLIP, openai_style_state_dict

    torch.manual_seed(0)
    sd = openai_style_state_dict(TorchCLIP().eval())
    sd["totally.unknown.weight"] = np.zeros((3, 3), np.float32)
    np.savez(tmp_path / "clip.npz", **{k: np.asarray(v) for k, v in sd.items()})

    rc = vc.main(["--ckpt", str(tmp_path / "clip.npz")])
    rep = json.loads(capsys.readouterr().out)
    assert rep["n_unexpected"] == 1 and rep["unexpected"] == ["totally.unknown.weight"]
    assert rc == 1


def test_missing_key_reported_as_mapper_failure(tmp_path, capsys):
    from tests.test_ckpt_parity import TorchCLIP, openai_style_state_dict

    torch.manual_seed(0)
    sd = openai_style_state_dict(TorchCLIP().eval())
    del sd["visual.ln_post.weight"]
    np.savez(tmp_path / "clip.npz", **{k: np.asarray(v) for k, v in sd.items()})

    rc = vc.main(["--ckpt", str(tmp_path / "clip.npz")])
    rep = json.loads(capsys.readouterr().out)
    assert rep["mapper"].startswith("FAILED")
    assert rc == 2
