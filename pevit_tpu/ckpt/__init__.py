from .orbax_io import restore_trainable, save_trainable
from .torch_loader import (
    infer_spec_from_state_dict,
    load_clip,
    read_torch_state_dict,
    state_dict_to_params,
)

__all__ = [
    "infer_spec_from_state_dict",
    "load_clip",
    "read_torch_state_dict",
    "restore_trainable",
    "save_trainable",
    "state_dict_to_params",
]
