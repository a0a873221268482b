from . import adapter, compacter, kadaptation, kron, lora
from .base import (
    ALL_METHODS,
    PEFT_METHODS,
    PeftConfig,
    init_peft,
    make_hooks,
    method_from_command,
    peft_num_params,
)

__all__ = [
    "ALL_METHODS",
    "PEFT_METHODS",
    "PeftConfig",
    "adapter",
    "compacter",
    "init_peft",
    "kadaptation",
    "kron",
    "lora",
    "make_hooks",
    "method_from_command",
    "peft_num_params",
]
