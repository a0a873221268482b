"""CLIP-Swin checkpoint mapping: golden parity vs the reference torch module.

Instantiates the reference's actual ``clip_swin.CLIP`` (clip_swin.py:153-260)
at tiny dims — Swin-T-shaped visual tower + CLIP-style text transformer with
OUTSIDE text/vision projection matrices — exports its state_dict through
``clip_swin_state_dict_to_params``, and asserts encode_image / encode_text
parity through OUR factory path (which, like the reference, L2-normalises).

The reference module needs timm (DropPath/trunc_normal_), the comm helper and
build_tokenizer only at import/ctor time — stubbed here; none participate in
the forward math.  Skips gracefully when torch/reference are unavailable.
"""

import importlib
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_MODELS = Path("/root/reference/vision_benchmark/models")

EMBED, VOCAB, CTX, TW, THEADS, TLAYERS = 24, 500, 12, 32, 2, 2
IMG, WIN = 56, 7


@pytest.fixture(scope="module")
def ref_clip_swin():
    if not REF_MODELS.exists():
        pytest.skip("reference tree not available")
    # --- stubs for import-time-only dependencies -------------------------
    if "timm.models.layers" not in sys.modules:
        import importlib.machinery as _mach

        timm = sys.modules.setdefault("timm", types.ModuleType("timm"))
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        for name, m in [("timm", timm), ("timm.models", models), ("timm.models.layers", layers)]:
            m.__spec__ = _mach.ModuleSpec(name, None)
            m.__path__ = []

        class DropPath(torch.nn.Identity):
            def __init__(self, drop_prob=None):
                super().__init__()

        layers.DropPath = DropPath
        layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = models
        models.layers = layers
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    class _TinyTok:
        def get_vocab_size(self):
            return VOCAB

    vb = sys.modules.setdefault("vision_benchmark", types.ModuleType("vision_benchmark"))
    for mod_name, attrs in [
        ("vision_benchmark.utils", {}),
        ("vision_benchmark.utils.comm", {"comm": types.SimpleNamespace(local_rank=0, is_main_process=lambda: True)}),
        ("vision_benchmark.datasets", {}),
        ("vision_benchmark.datasets.languages", {}),
        ("vision_benchmark.datasets.languages.build", {"build_tokenizer": lambda name: _TinyTok()}),
    ]:
        if mod_name not in sys.modules:
            m = types.ModuleType(mod_name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[mod_name] = m
            parent, _, child = mod_name.rpartition(".")
            setattr(sys.modules[parent] if parent else vb, child, m)

    pkg_name = "_ref_clip_swin_pkg"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [str(REF_MODELS)]
        sys.modules[pkg_name] = pkg
    try:
        return importlib.import_module(f"{pkg_name}.clip_swin")
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference clip_swin not importable: {e}")


def _tiny_config():
    return {
        "MODEL": {
            "SPEC": {
                "EMBED_DIM": EMBED,
                "TEXT": {
                    "TOKENIZER": "clip",
                    "CONTEXT_LENGTH": CTX,
                    "WIDTH": TW,
                    "HEADS": THEADS,
                    "LAYERS": TLAYERS,
                },
                "VISION": {
                    "PATCH_SIZE": 4,
                    "IN_CHANS": 3,
                    "EMBED_DIM": 32,
                    "DEPTHS": [2, 2],
                    "NUM_HEADS": [2, 4],
                    "WINDOW_SIZE": WIN,
                    "MLP_RATIO": 4.0,
                    "QKV_BIAS": True,
                    "APE": False,
                    "PATCH_NORM": True,
                    "DROP_RATE": 0.0,
                },
            }
        },
        "TRAIN": {"IMAGE_SIZE": [IMG]},
    }


def test_clip_swin_golden_parity(ref_clip_swin, tmp_path):
    torch.manual_seed(0)
    model = ref_clip_swin.CLIP(_tiny_config())
    model.eval()
    # NOTE: no activation-scale workaround here — our text path now uses the
    # reference's TF-style LayerNorm eps=1e-12 (factory passes ln_eps), so
    # parity holds even at trunc_normal(0.02) init where LN input variance
    # (~4e-4) is comparable to the old 1e-5 eps.

    ckpt = tmp_path / "clip_swin_tiny.pt"
    torch.save(model.state_dict(), ckpt)

    from pevit_tpu.config import get_default_config
    from pevit_tpu.models import get_model

    cfg = get_default_config()
    cfg.MODEL.NAME = "clip_swin_tiny"
    cfg.MODEL.SPEC.EMBED_DIM = EMBED
    cfg.MODEL.SPEC.TEXT.update({"WIDTH": TW, "HEADS": THEADS, "LAYERS": TLAYERS,
                                "CONTEXT_LENGTH": CTX, "VOCAB_SIZE": VOCAB})
    cfg.TRAIN.IMAGE_SIZE = [IMG, IMG]
    cfg.TEST.MODEL_FILE = str(ckpt)
    bb = get_model(cfg)
    assert bb.feat_dim == EMBED

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref_img = model.encode_image(torch.from_numpy(x))  # L2-normalised
    ours_img = bb.forward_features(bb.params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    # fp32-tight: the r5 shift-clamp + mask-frame fixes made the vision tower
    # exact; a loose 2e-3 here previously HID both bugs (test_cls_swin_parity).
    np.testing.assert_allclose(
        np.asarray(ours_img), ref_img.numpy(), rtol=0, atol=2e-5,
        err_msg="clip_swin encode_image diverges",
    )

    tokens = rng.integers(1, VOCAB - 1, size=(3, CTX)).astype(np.int32)
    tokens[:, -1] = VOCAB - 1  # max id -> argmax EOT pooling position
    with torch.no_grad():
        ref_txt = model.encode_text(torch.from_numpy(tokens.astype(np.int64)))
    ours_txt = bb.encode_text(bb.params, jnp.asarray(tokens))
    np.testing.assert_allclose(
        np.asarray(ours_txt), ref_txt.numpy(), rtol=0, atol=2e-5,
        err_msg="clip_swin encode_text diverges",
    )
