"""ModifiedResNet tower: converter + forward parity vs the reference module.

Builds the reference's actual CLIP with an RN visual tower
(model.py:1074-1084 -> ModifiedResNet, model.py:94-152), randomizes BN
running stats so eval-mode BN is meaningful, converts the state_dict through
our loader, and asserts encode_image parity in fp32.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pevit_tpu.ckpt import infer_spec_from_state_dict, state_dict_to_params
from pevit_tpu.ckpt.torch_loader import load_clip
from pevit_tpu.core import encode_image

from tests.test_reference_torch_parity import _load_ref  # noqa: E402

torch = pytest.importorskip("torch")

RES, VW, LAYERS, EMB = 64, 8, (1, 2, 1, 1), 32


@pytest.fixture(scope="module")
def rn_clip():
    ref = _load_ref("model")
    torch.manual_seed(11)
    model = ref.CLIP(
        embed_dim=EMB,
        image_resolution=RES,
        vision_layers=LAYERS,
        vision_width=VW,
        vision_patch_size=None,
        context_length=12,
        vocab_size=100,
        transformer_width=64,
        transformer_heads=1,
        transformer_layers=2,
    )
    with torch.no_grad():
        for m in model.visual.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(0.2 * torch.randn_like(m.running_mean))
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    model.eval()
    return model


def test_rn_spec_inference(rn_clip):
    sd = {k: v.numpy().astype(np.float32) for k, v in rn_clip.state_dict().items()}
    spec = infer_spec_from_state_dict(sd)
    assert spec.vision_rn is not None
    assert spec.vision_rn.layers == LAYERS
    assert spec.vision_rn.width == VW
    assert spec.vision_rn.input_resolution == RES
    assert spec.vision_rn.output_dim == EMB
    assert spec.text.layers == 2 and spec.text.width == 64


def test_rn_forward_parity(rn_clip):
    sd = {k: v.numpy().astype(np.float32) for k, v in rn_clip.state_dict().items()}
    params, spec = state_dict_to_params(sd)

    rng = np.random.default_rng(13)
    x = rng.standard_normal((2, 3, RES, RES)).astype(np.float32)
    with torch.no_grad():
        ref_out = rn_clip.visual(torch.from_numpy(x))
    ours = encode_image(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), spec=spec,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref_out.numpy(), rtol=2e-4, atol=5e-5,
        err_msg="ModifiedResNet encode_image diverges from the reference",
    )


def test_rn_rejects_peft_hooks(rn_clip):
    from pevit_tpu.core import CLIPSpec, VisionSpec
    from pevit_tpu.peft import PeftConfig, make_hooks

    sd = {k: v.numpy().astype(np.float32) for k, v in rn_clip.state_dict().items()}
    params, spec = state_dict_to_params(sd)
    # hooks built against a ViT spec; attaching them to an RN tower must fail
    vit = CLIPSpec(vision=VisionSpec(width=64, layers=2, heads=2))
    hooks = make_hooks(PeftConfig(method="lora"), vit, train=False)
    x = jnp.zeros((1, RES, RES, 3), jnp.float32)
    with pytest.raises(ValueError, match="ViT-only"):
        encode_image(params, x, spec=spec, hooks=hooks)


@pytest.mark.slow
def test_rn_linear_probe_cli_e2e(rn_clip, tmp_path):
    """linear_probe CLI over an RN-tower checkpoint: ckpt -> infer -> convert
    -> frozen-feature probe -> prediction artifacts (reference L5->L1)."""
    ckpt = tmp_path / "tiny_rn.pt"
    torch.save(rn_clip.state_dict(), str(ckpt))

    ds = tmp_path / "ds.yaml"
    ds.write_text(
        f"DATASET:\n  DATASET: 'synthetic-rn'\n  ROOT: '{tmp_path}/data'\n"
        "  NUM_CLASSES: 3\nTEST:\n  METRIC: 'accuracy'\n"
    )
    model = tmp_path / "model.yaml"
    model.write_text(
        f"""OUTPUT_DIR: '{tmp_path}/out'
INPUT:
  MEAN: [0.48145466, 0.4578275, 0.40821073]
  STD: [0.26862954, 0.26130258, 0.27577711]
MODEL:
  NAME: 'RN50'
  PRETRAINED: ''
  SPEC:
    EMBED_DIM: {EMB}
    TEXT:
      TOKENIZER: clip
      CONTEXT_LENGTH: 12
TRAIN:
  BATCH_SIZE_PER_GPU: 8
  END_EPOCH: 2
  EXTRA_FINAL_TRAIN_EPOCH: 0
"""
    )
    from pevit_tpu.commands.linear_probe import main

    best_acc, model_info = main([
        "--ds", str(ds), "--model", str(model),
        "--no-tuning", "True", "--lr", "0.01", "--l2", "0.0001",
        "DATASET.NUM_SAMPLES_PER_CLASS", "4",
        "TRAIN.IMAGE_SIZE", f"[{RES},{RES}]",
        "TEST.IMAGE_SIZE", f"[{RES},{RES}]",
        "TEST.MODEL_FILE", str(ckpt),
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.REMAT", "False",
    ])
    assert best_acc > 0
    assert model_info["n_trainable_params"] > 0


def test_load_clip_rn50_random():
    params, spec = load_clip("RN50", checkpoint_path="random")
    assert spec.vision_rn is not None
    assert spec.vision_rn.layers == (3, 4, 6, 3)
    assert params["visual"]["attnpool"]["c_proj"]["kernel"].shape == (2048, 1024)
    assert params["visual"]["stem"]["conv1"].shape == (3, 3, 3, 32)
    assert len(params["visual"]["layer3"]) == 6


@pytest.mark.slow
def test_rn50_real_geometry_forward_parity():
    """ModifiedResNet at the TRUE RN50 geometry (model.py:1074-1084 infers
    layers (3,4,6,3), width 64, res 224, embed 1024 from the OpenAI ckpt):
    the stem's three convs, avg-pool antialiasing and the attention-pool's
    (res/32)^2+1 positional embedding all change tiling vs the toy config.
    Text tower kept tiny — only the visual tower is under test."""
    ref = _load_ref("model")
    torch.manual_seed(29)
    model = ref.CLIP(
        embed_dim=1024,
        image_resolution=224,
        vision_layers=(3, 4, 6, 3),
        vision_width=64,
        vision_patch_size=None,
        context_length=12,
        vocab_size=100,
        transformer_width=64,
        transformer_heads=1,
        transformer_layers=2,
    )
    with torch.no_grad():
        for m in model.visual.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(0.2 * torch.randn_like(m.running_mean))
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    model.eval()

    sd = {k: v.numpy().astype(np.float32) for k, v in model.state_dict().items()}
    params, spec = state_dict_to_params(sd)
    assert spec.vision_rn.layers == (3, 4, 6, 3)
    assert spec.vision_rn.input_resolution == 224
    assert spec.vision_rn.output_dim == 1024

    rng = np.random.default_rng(31)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref_out = model.visual(torch.from_numpy(x))
    ours = encode_image(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), spec=spec,
        compute_dtype=jnp.float32,
    )
    scale = float(np.abs(ref_out.numpy()).max())
    np.testing.assert_allclose(
        np.asarray(ours), ref_out.numpy(), rtol=5e-5, atol=5e-5 * scale,
        err_msg="RN50 real-geometry encode_image diverges",
    )
