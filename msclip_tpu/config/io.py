"""Config IO helpers: rank-0 dump + deepspeed JSON export.

Parity with the reference's ``save_config`` (``lib/config/default.py:
330-333``) and ``export_deepspeed_config`` (``:322-327``; config-only stub
in the reference — kept for YAML compatibility, inert on TPU).
"""

from __future__ import annotations

import json


def save_config(cfg, path: str) -> None:
    from ..utils.comm import comm

    if comm.is_main_process():
        with open(path, "w") as f:
            f.write(cfg.dump())


def export_deepspeed_config(config, total_batch: int, path: str) -> None:
    config.DEEPSPEED.train_batch_size = total_batch
    with open(path, "w") as f:
        json.dump(config.DEEPSPEED.to_dict(), f, indent=4)
