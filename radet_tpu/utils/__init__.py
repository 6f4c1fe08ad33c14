from .config import Config, load_config, merge_dict, apply_overrides
from .logging import get_root_logger

__all__ = [
    "Config",
    "load_config",
    "merge_dict",
    "apply_overrides",
    "get_root_logger",
]
