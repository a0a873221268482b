"""Checkpoint conversion + full-model parity vs a torch reference model.

Builds a random state_dict in the OpenAI CLIP key layout, loads it into
(a) our converter + JAX forward and (b) a minimal torch CLIP implemented
here with stock torch modules (nn.MultiheadAttention / Conv2d — the same
building blocks the reference uses for its frozen towers).  Outputs must
match to fp32 tolerance.  This is the cross-framework evidence that both the
weight mapping and the model math are right.
"""

import math
from collections import OrderedDict

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from pevit_tpu.ckpt import infer_spec_from_state_dict, state_dict_to_params
from pevit_tpu.core import encode_image, encode_text

# --- tiny torch CLIP (standard modules, written for this test) -------------

# head counts must satisfy the OpenAI width//64 rule — the checkpoint format
# does not store them (model.py:1232: transformer_heads = width // 64)
W, L, H, P, RES, EMB = 128, 2, 2, 16, 32, 32
CTX, VOCAB, TW, TH, TL = 12, 100, 64, 1, 2


class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class Block(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, h)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(
            OrderedDict(
                [("c_fc", nn.Linear(d, d * 4)), ("gelu", QuickGELU()), ("c_proj", nn.Linear(d * 4, d))]
            )
        )
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x, mask=None):
        x = x + self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x), need_weights=False, attn_mask=mask)[0]
        x = x + self.mlp(self.ln_2(x))
        return x


class TorchVisual(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, W, P, P, bias=False)
        scale = W ** -0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(W))
        self.positional_embedding = nn.Parameter(scale * torch.randn((RES // P) ** 2 + 1, W))
        self.ln_pre = nn.LayerNorm(W)
        self.blocks = nn.ModuleList([Block(W, H) for _ in range(L)])
        self.ln_post = nn.LayerNorm(W)
        self.proj = nn.Parameter(scale * torch.randn(W, EMB))

    def forward(self, x):
        x = self.conv1(x).reshape(x.shape[0], W, -1).permute(0, 2, 1)
        cls = self.class_embedding + torch.zeros(x.shape[0], 1, W)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x).permute(1, 0, 2)
        for b in self.blocks:
            x = b(x)
        x = x.permute(1, 0, 2)
        return self.ln_post(x[:, 0, :]) @ self.proj


class TorchCLIP(nn.Module):
    def __init__(self):
        super().__init__()
        self.visual = TorchVisual()
        self.tblocks = nn.ModuleList([Block(TW, TH) for _ in range(TL)])
        self.token_embedding = nn.Embedding(VOCAB, TW)
        self.positional_embedding = nn.Parameter(0.01 * torch.randn(CTX, TW))
        self.ln_final = nn.LayerNorm(TW)
        self.text_projection = nn.Parameter((TW ** -0.5) * torch.randn(TW, EMB))
        self.logit_scale = nn.Parameter(torch.ones([]) * math.log(1 / 0.07))
        mask = torch.full((CTX, CTX), float("-inf")).triu_(1)
        self.register_buffer("mask", mask)

    def encode_text(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding
        x = x.permute(1, 0, 2)
        for b in self.tblocks:
            x = b(x, self.mask)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)] @ self.text_projection
        return x


def openai_style_state_dict(model: TorchCLIP) -> dict:
    """Rename our module paths to the OpenAI checkpoint key layout."""
    sd = {}
    for k, v in model.state_dict().items():
        k = k.replace("visual.blocks.", "visual.transformer.resblocks.")
        k = k.replace("tblocks.", "transformer.resblocks.")
        sd[k] = v.numpy()
    sd.pop("mask")
    return sd


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = TorchCLIP().eval()
    sd = openai_style_state_dict(tm)
    params, spec = state_dict_to_params(sd)
    return tm, params, spec


def test_spec_inference(models):
    _, _, spec = models
    assert spec.vision.width == W and spec.vision.layers == L
    assert spec.vision.patch_size == P and spec.vision.input_resolution == RES
    assert spec.text.vocab_size == VOCAB and spec.text.context_length == CTX
    assert spec.embed_dim == EMB


def test_encode_image_parity(models):
    tm, params, spec = models
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, RES, RES, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm.visual(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(encode_image(params, jnp.asarray(x), spec=spec))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_encode_text_parity(models):
    tm, params, spec = models
    rng = np.random.default_rng(1)
    toks = rng.integers(1, VOCAB - 1, (4, CTX))
    toks[:, 0] = 5
    toks[np.arange(4), rng.integers(3, CTX, 4)] = VOCAB - 1  # eot = max id
    with torch.no_grad():
        want = tm.encode_text(torch.tensor(toks)).numpy()
    got = np.asarray(encode_text(params, jnp.asarray(toks.astype(np.int32)), spec=spec))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)
