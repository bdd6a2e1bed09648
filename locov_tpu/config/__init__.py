from .node import CfgNode
from .defaults import get_default_cfg, add_ovr_config
from .config_utils import (auto_scale_workers,
                           edit_output_dir_exp_specific)

get_cfg = get_default_cfg

__all__ = [
    "CfgNode", "get_cfg", "get_default_cfg", "add_ovr_config",
    "edit_output_dir_exp_specific", "auto_scale_workers",
]
