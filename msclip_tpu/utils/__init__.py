from .convert import (
    build_key_map,
    convert_torch_state_dict,
    export_torch_state_dict,
)

__all__ = [
    "build_key_map",
    "convert_torch_state_dict",
    "export_torch_state_dict",
]
