from .declip import DeclipSpec, gathered_contrastive_logits, init_declip_params
from .factory import Backbone, get_model
from .nnclr import MemoryBankState, init_memory_bank, nearest_neighbours, nn_replace
from .swin import SwinSpec, init_swin_params, swin_base, swin_forward, swin_forward_features, swin_tiny
from .vit import (
    ViTSpec,
    init_vit_params,
    normalize_vit_state_dict,
    sincos_pos_embed_2d,
    timm_state_dict_to_params,
    vit_forward,
    vit_forward_features,
)

__all__ = [
    "Backbone",
    "DeclipSpec",
    "MemoryBankState",
    "init_memory_bank",
    "nearest_neighbours",
    "nn_replace",
    "SwinSpec",
    "ViTSpec",
    "gathered_contrastive_logits",
    "get_model",
    "init_declip_params",
    "init_swin_params",
    "init_vit_params",
    "normalize_vit_state_dict",
    "sincos_pos_embed_2d",
    "swin_base",
    "swin_forward",
    "swin_forward_features",
    "swin_tiny",
    "timm_state_dict_to_params",
    "vit_forward",
    "vit_forward_features",
]
