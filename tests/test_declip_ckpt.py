"""DeCLIP-family golden parity + checkpoint round-trips.

Instantiates the REFERENCE's actual torch modules
(models/declip_model/image_encoder/visual_transformer.py,
text_encoder/text_transformer.py, filip.py FILIP, slip.py SLIP) at tiny
widths, exports their state_dicts through our converter
(``declip_state_dict_to_params``), and asserts forward parity for every
eval-surface method the benchmark calls (feature.py:262-281):
encode_image / encode_text / encode_image_dense / encode_text_dense.

Also covers: tokenizer-id parity with the DeCLIP SimpleTokenizer (shifted
vocab with <|mask|> — simple_tokenizer.py:61-79), 'module.'-prefix +
wrapper-dict normalisation, SLIP's ``text_encoder.`` key prefix, and the
factory path loading a saved .pth end-to-end.

Skips gracefully if torch or the reference tree is unavailable.
"""

import dataclasses
import importlib
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from pevit_tpu.models import declip as jdeclip

torch = pytest.importorskip("torch")

REF_MODELS = Path("/root/reference/vision_benchmark/models")

# tiny towers (heads override: our spec inference assumes width//64 heads,
# real checkpoints satisfy it; tiny ones don't)
RES, PATCH, VW, VHEADS, VLAYERS = 32, 16, 64, 2, 2
TW, THEADS, TLAYERS, CTX = 32, 2, 2, 77
EMBED, DENSE = 48, 16

TEXTS = ["a photo of a cat.", "hello world", "the quick brown fox jumps over the lazy dog"]


@pytest.fixture(scope="module")
def ref_pkg():
    """Import declip_model as a synthetic package (timm stubbed, no CUDA)."""
    if not REF_MODELS.exists():
        pytest.skip("reference tree not available")
    # declip_model/clip.py does ``import timm`` (unused at import time)
    if "timm" not in sys.modules:
        sys.modules["timm"] = types.ModuleType("timm")
    # the DeCLIP SimpleTokenizer imports ftfy for mojibake repair
    # (simple_tokenizer.py:51) — identity on the ASCII benchmark prompts
    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        # a real ModuleSpec so later find_spec("ftfy") callers (the clip_swin
        # fixture's import chain) don't trip on __spec__ is None
        ftfy.__spec__ = importlib.machinery.ModuleSpec("ftfy", loader=None)
        sys.modules["ftfy"] = ftfy
    pkg_name = "_ref_declip_parity"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [str(REF_MODELS / "declip_model")]
        sys.modules[pkg_name] = pkg
    # the reference text tower tokenizes on .cuda() tensors (text_transformer.py:188)
    if not getattr(torch.Tensor, "_pevit_cuda_patched", False):
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.Tensor._pevit_cuda_patched = True
    try:
        vt_mod = importlib.import_module(f"{pkg_name}.image_encoder.visual_transformer")
        tt_mod = importlib.import_module(f"{pkg_name}.text_encoder.text_transformer")
        filip_mod = importlib.import_module(f"{pkg_name}.filip")
        slip_mod = importlib.import_module(f"{pkg_name}.slip")
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference declip_model not importable: {e}")
    return types.SimpleNamespace(vt=vt_mod, tt=tt_mod, filip=filip_mod, slip=slip_mod)


def _towers(ref_pkg, seed=0):
    torch.manual_seed(seed)
    visual = ref_pkg.vt.VisualTransformer(
        input_resolution=RES, patch_size=PATCH, width=VW, layers=VLAYERS,
        heads=VHEADS, embed_dim=EMBED, checkpoint=False,
    )
    text = ref_pkg.tt.text_transformers(
        embed_dim=EMBED,
        context_length=CTX,
        transformer_width=TW,
        transformer_heads=THEADS,
        transformer_layers=TLAYERS,
        positional_embedding_flag=True,
        checkpoint=False,
        bpe_path="bpe_simple_vocab_16e6.txt.gz",
        text_encode_type="Transformer",
        text_model_utils={"random": False, "freeze": False},
    )
    return visual, text


def _fix_heads(spec):
    """Tiny towers have heads != width//64; real checkpoints match."""
    return dataclasses.replace(
        spec,
        vision=dataclasses.replace(spec.vision, heads=VHEADS),
        text=dataclasses.replace(spec.text, heads=THEADS),
    )


def _images(batch=2):
    rng = np.random.default_rng(11)
    x = rng.standard_normal((batch, 3, RES, RES)).astype(np.float32)
    return torch.from_numpy(x), jnp.asarray(x.transpose(0, 2, 3, 1))


def _close(ref_t, ours, what, rtol=2e-4, atol=3e-5):
    np.testing.assert_allclose(
        np.asarray(ours), ref_t.detach().numpy(), rtol=rtol, atol=atol,
        err_msg=f"{what} diverges from the reference torch module",
    )


def test_filip_golden_parity(ref_pkg):
    visual, text = _towers(ref_pkg)
    model = ref_pkg.filip.FILIP(
        visual, text, use_allgather=False, return_dense=True,
        feature_dim=EMBED, dense_mapping_image=VW, dense_mapping_language=TW,
        dense_embed_dim=DENSE,
    )
    model.eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, spec = jdeclip.declip_state_dict_to_params(sd, input_resolution=RES)
    assert spec.variant == "filip" and spec.dense_eval
    assert spec.embed_dim == EMBED and spec.dense_embed_dim == DENSE
    spec = _fix_heads(spec)

    xt, xj = _images()
    tokens_t = text.tokenize(TEXTS, context_length=CTX)
    tokens_j = jnp.asarray(tokens_t.numpy().astype(np.int32))

    with torch.no_grad():
        ref_img = model.encode_image(xt)
        ref_img_dense = model.encode_image_dense(xt)
        ref_txt = model.encode_text(TEXTS)
        ref_txt_dense = model.encode_text_dense(TEXTS)

    _close(ref_img, jdeclip.encode_image(params, xj, spec=spec), "encode_image")
    _close(ref_img_dense, jdeclip.encode_image_dense(params, xj, spec=spec), "encode_image_dense")
    _close(ref_txt, jdeclip.encode_text(params, tokens_j, spec=spec), "encode_text")
    _close(ref_txt_dense, jdeclip.encode_text_dense(params, tokens_j, spec=spec), "encode_text_dense")


def test_declip_tokenizer_id_parity(ref_pkg):
    """Our shifted-vocab tokenizer reproduces the DeCLIP SimpleTokenizer ids."""
    from pevit_tpu.data.tokenizer import declip_tokenize, get_declip_tokenizer

    _, text = _towers(ref_pkg)
    ref_tokens = text.tokenize(
        TEXTS + ["x" * 400], context_length=CTX  # overlong input -> silent truncation
    ).numpy()
    ours = declip_tokenize(TEXTS + ["x" * 400], context_length=CTX)
    np.testing.assert_array_equal(ours, ref_tokens)
    tok = get_declip_tokenizer()
    assert len(tok.encoder) == 49409
    assert tok.encoder["<|endoftext|>"] == 49408  # shifted by <|mask|>


def test_slip_text_encoder_prefix_parity(ref_pkg):
    """SLIP stores the text tower as ``text_encoder.`` (slip.py:87)."""
    visual, text = _towers(ref_pkg, seed=1)
    model = ref_pkg.slip.SLIP(visual, text, use_allgather=False)
    model.eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    assert any(k.startswith("text_encoder.") for k in sd)
    params, spec = jdeclip.declip_state_dict_to_params(sd, input_resolution=RES)
    assert spec.variant == "declip"  # no dense heads
    spec = _fix_heads(spec)

    xt, xj = _images()
    tokens_j = jnp.asarray(text.tokenize(TEXTS, context_length=CTX).numpy().astype(np.int32))
    with torch.no_grad():
        ref_img = model.encode_image(xt)
        ref_txt = model.encode_text(TEXTS)
    _close(ref_img, jdeclip.encode_image(params, xj, spec=spec), "slip encode_image")
    _close(ref_txt, jdeclip.encode_text(params, tokens_j, spec=spec), "slip encode_text")


def test_normalize_and_factory_roundtrip(ref_pkg, tmp_path):
    """{'model': {'module.*': ...}} wrapping + pretraining extras are handled,
    and the factory loads the saved .pth end-to-end (models/declip.py:16-31)."""
    visual, text = _towers(ref_pkg, seed=2)
    model = ref_pkg.filip.FILIP(
        visual, text, use_allgather=False, return_dense=True,
        feature_dim=EMBED, dense_mapping_image=VW, dense_mapping_language=TW,
        dense_embed_dim=DENSE,
    )
    model.eval()
    wrapped = {
        "model": {
            **{"module." + k: v for k, v in model.state_dict().items()},
            # pretraining extras the reference loads strict=False around
            "module.projector.linear1.weight": torch.zeros(8, EMBED),
            "module.predictor.linear1.bias": torch.zeros(8),
        }
    }
    ckpt = tmp_path / "filip_tiny.pth"
    torch.save(wrapped, ckpt)

    from pevit_tpu.config import get_default_config
    from pevit_tpu.models import get_model

    cfg = get_default_config()
    cfg.MODEL.NAME = "filip_vitb32"
    cfg.TRAIN.IMAGE_SIZE = [RES, RES]
    cfg.TEST.MODEL_FILE = str(ckpt)
    bb = get_model(cfg)

    xt, xj = _images()
    # factory flattens dense features the way feature.py:352 does
    n_tokens = (RES // PATCH) ** 2
    feats = bb.forward_features(bb.params, xj)
    assert feats.shape == (2, n_tokens * DENSE)
    with torch.no_grad():
        ref_dense = model.encode_image_dense(xt)
    # NOTE: tiny heads mismatch (width//64) — rebuild with fixed spec for the
    # numeric check; the factory-shape check above is the wiring assertion.
    params, spec = jdeclip.declip_state_dict_to_params(
        {k: v.detach().numpy() for k, v in model.state_dict().items()},
        input_resolution=RES,
    )
    spec = _fix_heads(spec)
    ours = jdeclip.encode_image_dense(params, xj, spec=spec).reshape(2, -1)
    _close(ref_dense.reshape(2, -1), ours, "factory dense features")
    assert bb.tokenize is not None  # declip-family tokenizer wired


@pytest.mark.slow
def test_filip_real_geometry_golden_parity(ref_pkg):
    """The FILIP/DeCLIP towers at TRUE published geometry: ViT-B/32 visual
    (224, patch 32, width 768, 12x12) + text 512x8x12 ctx 77 over the real
    49409-token vocab, with real-width dense mapping heads — the toy test
    above runs width 64; this pins the same math where heads == width//64
    and the dense heads project from the full tower widths."""
    visual, text = None, None
    torch.manual_seed(41)
    visual = ref_pkg.vt.VisualTransformer(
        input_resolution=224, patch_size=32, width=768, layers=12,
        heads=12, embed_dim=512, checkpoint=False,
    )
    text = ref_pkg.tt.text_transformers(
        embed_dim=512, context_length=77, transformer_width=512,
        transformer_heads=8, transformer_layers=12,
        positional_embedding_flag=True, checkpoint=False,
        bpe_path="bpe_simple_vocab_16e6.txt.gz",
        text_encode_type="Transformer",
        text_model_utils={"random": False, "freeze": False},
    )
    model = ref_pkg.filip.FILIP(
        visual, text, use_allgather=False, return_dense=True,
        feature_dim=512, dense_mapping_image=768, dense_mapping_language=512,
        dense_embed_dim=256,
    )
    model.eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, spec = jdeclip.declip_state_dict_to_params(sd, input_resolution=224)
    assert spec.variant == "filip" and spec.dense_eval
    assert spec.vision.width == 768 and spec.vision.heads == 12
    assert spec.text.width == 512 and spec.text.heads == 8

    rng = np.random.default_rng(43)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    xt = torch.from_numpy(x)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    tokens_t = text.tokenize(TEXTS, context_length=77)
    tokens_j = jnp.asarray(tokens_t.numpy().astype(np.int32))

    with torch.no_grad():
        ref_img = model.encode_image(xt)
        ref_img_dense = model.encode_image_dense(xt)
        ref_txt = model.encode_text(TEXTS)
        ref_txt_dense = model.encode_text_dense(TEXTS)

    _close(ref_img, jdeclip.encode_image(params, xj, spec=spec), "encode_image@768")
    _close(ref_img_dense, jdeclip.encode_image_dense(params, xj, spec=spec), "encode_image_dense@768")
    _close(ref_txt, jdeclip.encode_text(params, tokens_j, spec=spec), "encode_text@512")
    _close(ref_txt_dense, jdeclip.encode_text_dense(params, tokens_j, spec=spec), "encode_text_dense@512")
