"""Load the reference torch model (/root/reference) as a numeric oracle.

Used only by parity tests and skipped when the reference checkout is not
mounted. The reference pins PyTorch 1.6 internals and packages absent here
(timm, ftfy, ``_LinearWithBias``), so we install thin compatibility stubs
*for the oracle only* — the framework itself never imports torch models.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REFERENCE_MODEL = "/root/reference/lib/models/clip_openai_pe_res_v1.py"


def reference_available() -> bool:
    return os.path.exists(REFERENCE_MODEL)


_cached_module = None


def load_reference_model_module():
    global _cached_module
    if _cached_module is not None:
        return _cached_module

    import torch
    from torch import nn

    # timm stub: only DropPath / trunc_normal_ are imported by the model.
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):  # never active: released configs use 0.0
        def __init__(self, drop_prob=None):
            super().__init__()

        def forward(self, x):
            return x

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return torch.nn.init.trunc_normal_(tensor, mean, std, a, b)

    timm_layers.DropPath = DropPath
    timm_layers.trunc_normal_ = trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers
    # give stubs a real ModuleSpec so importlib.util.find_spec probes
    # (e.g. transformers' optional-dependency checks) don't crash
    import importlib.machinery as _machinery

    for name, mod in [
        ("timm", timm),
        ("timm.models", timm_models),
        ("timm.models.layers", timm_layers),
    ]:
        mod.__spec__ = _machinery.ModuleSpec(name, None)
        sys.modules.setdefault(name, mod)

    # utils.comm stub: single-process semantics.
    utils_pkg = types.ModuleType("utils")
    comm_mod = types.ModuleType("utils.comm")

    class _Comm:
        rank = 0
        world_size = 1
        local_rank = 0

        @staticmethod
        def is_main_process():
            return False  # silences per-parameter init logging

        @staticmethod
        def synchronize():
            pass

    comm_mod.comm = _Comm()
    comm_mod.gather_tensors = lambda t: t
    utils_pkg.comm = comm_mod
    sys.modules.setdefault("utils", utils_pkg)
    sys.modules.setdefault("utils.comm", comm_mod)

    # torch 2.x removed _LinearWithBias (a PyTorch-1.6 internal).
    import torch.nn.modules.linear as torch_linear

    if not hasattr(torch_linear, "_LinearWithBias"):
        torch_linear._LinearWithBias = nn.Linear

    spec = importlib.util.spec_from_file_location(
        "reference_clip_model", REFERENCE_MODEL
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    _cached_module = module
    return module


REFERENCE_ZERO_SHOT = "/root/reference/tools/zero_shot.py"

_cached_zero_shot = None


def load_reference_zero_shot_module():
    """Load the reference eval driver (``tools/zero_shot.py``) so its own
    ``zeroshot_classifier`` / ``accuracy`` / ``mAP_11points`` /
    ``AverageMeter`` run as the prediction-agreement oracle. Its import
    surface (torchvision, yacs config, ftfy tokenizer, _init_paths) is
    absent here, so module-level imports get thin stubs — the functions
    the capstone calls touch none of them."""
    global _cached_zero_shot
    if _cached_zero_shot is not None:
        return _cached_zero_shot

    model_mod = load_reference_model_module()  # installs utils/timm stubs

    import importlib.machinery as _machinery

    def _stub(name, **attrs):
        mod = sys.modules.get(name)
        if mod is None:
            mod = types.ModuleType(name)
            mod.__spec__ = _machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
        for k, v in attrs.items():
            setattr(mod, k, v)
        return mod

    _stub("_init_paths")
    tv = _stub("torchvision")
    tv.transforms = _stub("torchvision.transforms")
    tv.models = _stub("torchvision.models")
    tv.datasets = _stub("torchvision.datasets")
    uu = _stub("utils.utils", create_logger=lambda *a, **k: "/tmp")
    sys.modules["utils"].utils = uu
    _stub("config", config=None, update_config=lambda *a, **k: None)
    ds_pkg = _stub("dataset")
    ds_pkg.languages = _stub("dataset.languages", SimpleTokenizer=object)
    # the prompt constants file is pure data — load the real one
    spec = importlib.util.spec_from_file_location(
        "dataset.prompts.constants",
        "/root/reference/lib/dataset/prompts/constants.py",
    )
    consts = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(consts)
    sys.modules["dataset.prompts.constants"] = consts
    ds_pkg.prompts = _stub("dataset.prompts", constants=consts)
    _stub("models", clip_openai_pe_res_v1=model_mod)

    spec = importlib.util.spec_from_file_location(
        "reference_zero_shot", REFERENCE_ZERO_SHOT
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    _cached_zero_shot = module
    return module


def tiny_msclips_config(width=128, image_size=64, vocab_size=512,
                        layers=12):
    """A scaled-down MS-CLIP-S config exercising every [ON] component:
    early-conv stem, 5-stage parallel branch, lateral adapters at
    [2,4,6,8,10], full module sharing for text layers >= 1."""
    from msclip_tpu.config import get_default_config

    c = get_default_config()
    c.merge_from_dict(
        {
            "MODEL": {
                "NAME": "clip_openai_pe_res_v1",
                "SPEC": {
                    "EMBED_DIM": 64,
                    "GATHER_TENSORS": False,
                    "VISION": {
                        "MODEL": "vit",
                        "PATCH_SIZE": 32,
                        "WIDTH": width,
                        "LAYERS": layers,
                    },
                    "TEXT": {
                        "TOKENIZER": "clip",
                        "STYLE": "clip",
                        "CONTEXT_LENGTH": 77,
                        "VOCAB_SIZE": vocab_size,
                        "WIDTH": width,
                        "HEADS": width // 64,
                        "LAYERS": layers,
                    },
                },
            },
            "TRAIN": {"IMAGE_SIZE": [image_size, image_size]},
            "TEST": {"IMAGE_SIZE": [image_size, image_size]},
            "CUSTOM": {
                "CUSTOM_ATTN": True,
                "SHARE_MODULES": [
                    "attn.in_proj_weight",
                    "attn.in_proj_bias",
                    "attn.out_proj",
                    "mlp",
                ],
                "N_LAYERS": 1,
                "VISUAL_LAYER_MINUS1": False,
                "PARALLEL_IN_V": True,
                "PARALLEL_N_LAYERS": 5,
                "PARALLEL_LATERAL_LAYER": [2, 4, 6, 8, 10],
                "PRALLEL_T2B_KERNELS": [16, 8, 4, 2, 1],
                "PRALLEL_T2B_PADDINGS": [0, 0, 0, 0, 0],
                "PRALLEL_T2B_STRIDES": [16, 8, 4, 2, 1],
                "PRALLEL_T2B_USECLS": True,
                "PARALLEL_RESNET": True,
                "PARALLEL_RESNET_LAYERS": [0, 1, 1, 1, 1],
                "EARLY_CONV": True,
                "EARLY_CONV_NEW_IMPLEMENT": True,
                "EARLY_CONV_RES": True,
                "EARLY_CONV_RES_FIRSTCONV_KERNEL": 3,
                "EARLY_CONV_RES_BLOCK": "basic_v0",
                "EARLY_CONV_RES_LAYERS": [1, 1, 1, 1],
            },
        }
    )
    return c
