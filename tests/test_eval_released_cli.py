"""End-to-end test for ``tools/eval_released.py`` — the one-command
released-checkpoint verifier (VERDICT r4 #7).

The real weights are an external download, so this exercises the CLI with
an EXPORTED full-geometry checkpoint instead: random-init b32 params →
``export_torch_state_dict`` → a reference-layout ``.pth`` (aliased shared
keys under both names, exactly like the reference's ``state_dict()``) →
the tier-1 gate (strict conversion + finite unit-norm forward) as a real
subprocess.  Proves the command a weights-holder will run is wired
end-to-end, not just importable."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_eval_released_tier1_roundtrip(tmp_path):
    import jax
    import torch

    from msclip_tpu.config import get_default_config, update_config
    from msclip_tpu.models import build_model
    from msclip_tpu.utils import export_torch_state_dict

    cfg = get_default_config()
    update_config(
        cfg, os.path.join(REPO, "experiments/model/b32-yfcc-msclips.yaml")
    )
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    sd = export_torch_state_dict(params, model.spec)
    ckpt = tmp_path / "b32-yfcc.pth"
    torch.save(
        {k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()},
        str(ckpt),
    )

    env = dict(os.environ)
    env["MSCLIP_PLATFORM"] = "cpu"
    res = subprocess.run(
        [sys.executable, "tools/eval_released.py", "--ckpt", str(ckpt),
         "--model", "b32-yfcc-msclips"],
        cwd=REPO, capture_output=True, text=True, env=env, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "[tier 1 OK]" in res.stdout, res.stdout
    # no --imagenet: the tier-2 skip must name the published target
    assert "36.7" in res.stdout, res.stdout


def test_eval_released_missing_ckpt_fails_loudly():
    env = dict(os.environ)
    env["MSCLIP_PLATFORM"] = "cpu"
    res = subprocess.run(
        [sys.executable, "tools/eval_released.py", "--ckpt",
         "/nonexistent/b32.pth"],
        cwd=REPO, capture_output=True, text=True, env=env, timeout=120,
    )
    assert res.returncode != 0
    assert "checkpoint not found" in (res.stderr + res.stdout)
