"""Per-process logging with rank annotation.

Same layout as the reference (``lib/utils/utils.py:21-58``):
``{phase}_{timestamp}_rank{rank}.txt`` under
``OUTPUT_DIR/dataset/name``, format embedding ``Rank[r/w]``; file handler
on every process, console on rank 0.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from pathlib import Path


def process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def process_count() -> int:
    try:
        import jax

        return jax.process_count()
    except Exception:
        return 1


def setup_logger(final_output_dir, rank, phase):
    time_str = time.strftime("%Y-%m-%d-%H-%M")
    log_file = f"{phase}_{time_str}_rank{rank}.txt"
    final_log_file = os.path.join(final_output_dir, log_file)
    fmt = f"[%(asctime)s] Rank[{rank}/{process_count()}]: %(message)s"
    logging.basicConfig(
        filename=str(final_log_file), format=fmt, level=logging.INFO,
        force=True,
    )
    if rank == 0:
        console = logging.StreamHandler(sys.stdout)
        console.setFormatter(logging.Formatter(fmt))
        logging.getLogger("").addHandler(console)


def create_logger(config, cfg_name, phase="train"):
    root_output_dir = Path(config.OUTPUT_DIR or "OUTPUT")
    dataset = config.DATASET.DATASET
    cfg_name = os.path.splitext(os.path.basename(cfg_name))[0]
    final_output_dir = root_output_dir / dataset / cfg_name
    final_output_dir.mkdir(parents=True, exist_ok=True)
    setup_logger(final_output_dir, process_index(), phase)
    return str(final_output_dir)
