from .msclip import (
    MSClipModel,
    cast_params,
    MSClipSpec,
    build_model,
    encode_image,
    encode_text,
    forward,
    init_params,
    param_count,
    spec_from_config,
)

__all__ = [
    "MSClipModel",
    "MSClipSpec",
    "build_model",
    "encode_image",
    "encode_text",
    "forward",
    "init_params",
    "param_count",
    "spec_from_config",
]
