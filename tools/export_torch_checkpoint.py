"""Export a native checkpoint back to a reference-compatible torch .pth.

Round-trip interop: models trained in this framework load into the
reference PyTorch codebase (aliased shared keys are emitted under both
names, exactly like the reference's ``state_dict()``).

    python tools/export_torch_checkpoint.py --model <model.yaml> \
        --ckpt <orbax params dir or .pth> --out model.pth [opts]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msclip_tpu.config import get_default_config, update_config
from msclip_tpu.eval import load_model_params
from msclip_tpu.models import build_model
from msclip_tpu.utils import export_torch_state_dict


def main():
    from msclip_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    p = argparse.ArgumentParser(description="Export torch checkpoint.")
    p.add_argument("--model", required=True)
    p.add_argument("--ckpt", default="", help="overrides PRETRAINED_MODEL")
    p.add_argument("--out", required=True)
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = p.parse_args()

    config = get_default_config()
    update_config(config, args.model, opts=args.opts)
    if args.ckpt:
        config.MODEL.PRETRAINED_MODEL = args.ckpt

    model = build_model(config)
    params = load_model_params(config, model)
    sd = export_torch_state_dict(params, model.spec)

    import numpy as np
    import torch

    torch_sd = {
        k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()
    }
    torch.save(torch_sd, args.out)
    print(f"RESULT exported {len(torch_sd)} tensors to {args.out}")


if __name__ == "__main__":
    main()
