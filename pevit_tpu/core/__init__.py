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
]
