"""TPU-native ModifiedResNet — the CLIP RN visual towers (RN50/RN101/RN50x*).

Reference: vision_benchmark/evaluation/model.py:11-152 (Bottleneck,
AttentionPool2d, ModifiedResNet) and the RN branch of build_model
(model.py:1213-1222).  The reference only ever runs these towers frozen in
eval mode (build_model returns model.eval(); the PEFT trainers are ViT-only —
kattention is never passed to the RN branch), so BatchNorm uses running
statistics, folded into a scale/offset at trace time.

TPU-first choices (not a translation):
* NHWC activations with HWIO kernels — XLA's native TPU convolution layout;
  explicit torch-matching padding so positions line up bit-for-bit.
* BN folds into one fused multiply-add per conv output (eval semantics).
* AttentionPool2d computes only the mean-token query row: torch materialises
  the full (N+1)x(N+1) attention and returns x[0] (model.py:71-90); softmax
  over the keys for query 0 is mathematically identical at 1/(N+1) the FLOPs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class ResNetSpec:
    input_resolution: int = 224
    width: int = 64
    layers: tuple = (3, 4, 6, 3)
    output_dim: int = 1024

    @property
    def heads(self) -> int:
        # vision_heads = vision_width * 32 // 64 (model.py:1078)
        return self.width * 32 // 64

    @property
    def embed_dim(self) -> int:
        return self.width * 32  # the ResNet feature dimension (model.py:125)

    @property
    def grid(self) -> int:
        return self.input_resolution // 32


# canonical OpenAI RN architectures (for random-init fallback; real
# checkpoints carry their architecture via infer_spec_from_state_dict)
RN_SPECS = {
    "RN50": ResNetSpec(224, 64, (3, 4, 6, 3), 1024),
    "RN101": ResNetSpec(224, 64, (3, 4, 23, 3), 512),
    "RN50x4": ResNetSpec(288, 80, (4, 6, 10, 6), 640),
    "RN50x16": ResNetSpec(384, 96, (6, 8, 18, 8), 768),
    "RN50x64": ResNetSpec(448, 128, (3, 15, 36, 10), 1024),
}

EXPANSION = 4  # Bottleneck.expansion (model.py:12)


def _conv(x: jax.Array, kernel: jax.Array, stride: int = 1, pad: int = 0) -> jax.Array:
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x: jax.Array, p: dict, eps: float = 1e-5) -> jax.Array:
    """Eval-mode BatchNorm folded to scale/offset (stats stay fp32)."""
    s = p["scale"] / jnp.sqrt(p["var"] + eps)
    t = p["bias"] - p["mean"] * s
    return x * s.astype(x.dtype) + t.astype(x.dtype)


def _avg_pool(x: jax.Array, k: int) -> jax.Array:
    if k <= 1:
        return x  # nn.AvgPool2d(1) / nn.Identity()
    out = lax.reduce_window(x, 0.0, lax.add, (1, k, k, 1), (1, k, k, 1), "VALID")
    return out / (k * k)


def _bottleneck(p: dict, x: jax.Array, stride: int) -> jax.Array:
    """Reference Bottleneck (model.py:11-53): anti-aliased stride via an
    avgpool before conv3, downsample branch prepended with the same pool."""
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], pad=1), p["bn2"]))
    out = _avg_pool(out, stride)
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        identity = _bn(_conv(_avg_pool(x, stride), p["downsample"]["conv"]), p["downsample"]["bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _attn_pool(p: dict, x: jax.Array, n_head: int) -> jax.Array:
    """AttentionPool2d (model.py:56-90), mean-token query row only."""
    B, H, W, C = x.shape
    x = x.reshape(B, H * W, C)
    x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)  # (B, N+1, C)
    x = x + p["positional_embedding"].astype(x.dtype)

    def proj(t, name):
        return t @ p[name]["kernel"].astype(t.dtype) + p[name]["bias"].astype(t.dtype)

    hd = C // n_head
    q = proj(x[:, :1], "q_proj").reshape(B, 1, n_head, hd) * (1.0 / math.sqrt(hd))
    k = proj(x, "k_proj").reshape(B, -1, n_head, hd)
    v = proj(x, "v_proj").reshape(B, -1, n_head, hd)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, v).reshape(B, C)
    return proj(out, "c_proj")


def encode_image_rn(
    params: dict, x: jax.Array, *, spec: ResNetSpec, compute_dtype: Any = jnp.float32
) -> jax.Array:
    """ModifiedResNet forward (model.py:127-152). ``x``: (B, H, W, 3) floats."""
    vp = params["visual"]
    x = x.astype(compute_dtype)

    stem = vp["stem"]
    x = jax.nn.relu(_bn(_conv(x, stem["conv1"], stride=2, pad=1), stem["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, stem["conv2"], pad=1), stem["bn2"]))
    x = jax.nn.relu(_bn(_conv(x, stem["conv3"], pad=1), stem["bn3"]))
    x = _avg_pool(x, 2)

    for li, n_blocks in enumerate(spec.layers, start=1):
        layer = vp[f"layer{li}"]
        stride = 1 if li == 1 else 2
        for bi in range(n_blocks):
            x = _bottleneck(layer[str(bi)], x, stride if bi == 0 else 1)

    return _attn_pool(vp["attnpool"], x, spec.heads)


# ---------------------------------------------------------------------------
# Random init (benchmarks/tests; real runs convert OpenAI RN checkpoints)
# ---------------------------------------------------------------------------

def _bn_init(ch: int) -> dict:
    z = jnp.zeros((ch,), jnp.float32)
    return {"scale": jnp.ones((ch,), jnp.float32), "bias": z, "mean": z, "var": jnp.ones((ch,), jnp.float32)}


def init_resnet_params(rng: jax.Array, spec: ResNetSpec) -> dict:
    """Distribution-matched random init of the visual RN tree."""
    keys = iter(jax.random.split(rng, 256))

    def conv(kh, kw, cin, cout):
        fan_in = kh * kw * cin
        return jax.random.normal(next(keys), (kh, kw, cin, cout), jnp.float32) * fan_in ** -0.5

    w = spec.width
    tree = {
        "stem": {
            "conv1": conv(3, 3, 3, w // 2), "bn1": _bn_init(w // 2),
            "conv2": conv(3, 3, w // 2, w // 2), "bn2": _bn_init(w // 2),
            "conv3": conv(3, 3, w // 2, w), "bn3": _bn_init(w),
        }
    }
    inplanes = w
    for li, n_blocks in enumerate(spec.layers, start=1):
        planes = w * (2 ** (li - 1))
        layer = {}
        for bi in range(n_blocks):
            cin = inplanes if bi == 0 else planes * EXPANSION
            block = {
                "conv1": conv(1, 1, cin, planes), "bn1": _bn_init(planes),
                "conv2": conv(3, 3, planes, planes), "bn2": _bn_init(planes),
                "conv3": conv(1, 1, planes, planes * EXPANSION), "bn3": _bn_init(planes * EXPANSION),
            }
            stride = (1 if li == 1 else 2) if bi == 0 else 1
            if bi == 0 and (stride > 1 or cin != planes * EXPANSION):
                block["downsample"] = {
                    "conv": conv(1, 1, cin, planes * EXPANSION),
                    "bn": _bn_init(planes * EXPANSION),
                }
            layer[str(bi)] = block
        tree[f"layer{li}"] = layer
        inplanes = planes * EXPANSION

    emb = spec.embed_dim
    std = emb ** -0.5

    def lin(cin, cout):
        return {
            "kernel": std * jax.random.normal(next(keys), (cin, cout), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
        }

    tree["attnpool"] = {
        "positional_embedding": std * jax.random.normal(next(keys), (spec.grid ** 2 + 1, emb), jnp.float32),
        "q_proj": lin(emb, emb),
        "k_proj": lin(emb, emb),
        "v_proj": lin(emb, emb),
        "c_proj": lin(emb, spec.output_dim),
    }
    return tree
