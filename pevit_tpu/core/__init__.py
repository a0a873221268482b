from .clip import (
    BlockHooks,
    CLIPSpec,
    TextSpec,
    VisionSpec,
    clip_similarity,
    encode_image,
    patchify_images,
    encode_text,
    init_clip_params,
)
from .layers import causal_mask, gelu_new, layer_norm, mlp, quick_gelu
from .resnet import RN_SPECS, ResNetSpec, encode_image_rn, init_resnet_params

__all__ = [
    "BlockHooks",
    "CLIPSpec",
    "TextSpec",
    "VisionSpec",
    "clip_similarity",
    "encode_image",
    "patchify_images",
    "encode_text",
    "init_clip_params",
    "causal_mask",
    "gelu_new",
    "layer_norm",
    "mlp",
    "quick_gelu",
    "RN_SPECS",
    "ResNetSpec",
    "encode_image_rn",
    "init_resnet_params",
]
