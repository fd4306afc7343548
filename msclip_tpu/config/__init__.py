from .node import CfgNode
from .defaults import get_default_config, update_config
from .io import export_deepspeed_config, save_config

__all__ = [
    "CfgNode",
    "get_default_config",
    "update_config",
    "save_config",
    "export_deepspeed_config",
]
