from . import dist
from .logger import create_logger, log_config, setup_logger

__all__ = ["dist", "create_logger", "log_config", "setup_logger"]
