"""Every shipped model YAML resolves through the factory.

The reference ships 14 resources/model/*.yaml entries (its launch scripts
pass them via --model); parity requires each MODEL.NAME to build here.  No
forwards — full-size towers random-init only (checkpoints are offline).
"""

from pathlib import Path

import pytest

from pevit_tpu.config import get_default_config
from pevit_tpu.models import get_model

MODEL_DIR = Path(__file__).resolve().parents[1] / "resources" / "model"
ALL_YAMLS = sorted(MODEL_DIR.glob("*.yaml"))

# reference resources/model inventory — all must exist here
EXPECTED = {
    "clip_example", "clip_swin_tiny", "deit_base_patch16_224", "example",
    "mae_vitb16", "mocov3_vitb16", "vit_base_patch16_224",
    "vit_base_patch32_224", "vitb16_CLIP", "vitb32_CLIP", "vitb32_DeCLIP",
    "vitb32_DeCLIP_YFCC15M", "vitb32_FILIP", "vitb32_SLIP",
}


def test_model_yaml_inventory_complete():
    assert {p.stem for p in ALL_YAMLS} >= EXPECTED


@pytest.mark.parametrize("yaml_path", ALL_YAMLS, ids=lambda p: p.stem)
def test_model_yaml_resolves(yaml_path):
    cfg = get_default_config()
    cfg.merge_from_file(str(yaml_path))
    if cfg.MODEL.NAME.startswith(("ViT-", "RN")):
        cfg.MODEL.PRETRAINED = "random"  # no OpenAI weights offline
    bb = get_model(cfg)
    assert bb.feat_dim > 0
    assert bb.params, f"{cfg.MODEL.NAME}: empty parameter tree"
    # dual-tower models must expose a text encoder for zeroshot/text-init
    if cfg.MODEL.NAME.startswith(("ViT-", "clip_", "declip", "slip", "filip", "defilip")):
        assert bb.encode_text is not None
