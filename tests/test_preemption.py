"""Preemption kill/resume e2e: the failure-tolerance contract
(SURVEY.md §5 — the reference's only story is AUTO_RESUME + checkpoint
pickup, `lib/utils/utils.py:117-127`; ours adds mid-epoch step
checkpoints + loader fast-forward).

Run 1 trains with TRAIN.SAVE_EVERY_STEPS and is SIGKILLed mid-epoch
(a real preemption: in-flight async Orbax saves must be discarded, the
last FINALIZED checkpoint wins). Run 2 auto-resumes: it must pick up the
step checkpoint, fast-forward the loader past the already-seen batches,
run only the remaining steps, and finish at exactly the full epoch's
step count."""

import os
import re
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OPTS = [
    "DATASET.DATASET", "synthetic", "DATASET.NUM_SAMPLES", "64",
    "TRAIN.END_EPOCH", "1", "TRAIN.BATCH_SIZE_PER_GPU", "2",
    "TRAIN.SAVE_EVERY_STEPS", "8", "PRINT_FREQ", "1",
    "TRAIN.IMAGE_SIZE", "[64,64]", "TEST.IMAGE_SIZE", "[64,64]",
    "MODEL.SPEC.VISION.WIDTH", "128", "MODEL.SPEC.VISION.LAYERS", "2",
    "MODEL.SPEC.VISION.PATCH_SIZE", "32",
    "MODEL.SPEC.TEXT.WIDTH", "128", "MODEL.SPEC.TEXT.HEADS", "2",
    "MODEL.SPEC.TEXT.LAYERS", "2", "MODEL.SPEC.EMBED_DIM", "32",
    "WORKERS", "2",
]
# NOTE: jax.device_count() on the forced-CPU platform is 1 in the child
# (no XLA_FLAGS), so global batch = 2 -> 32 steps/epoch.
TOTAL_STEPS = 32


def _cmd(out_dir):
    return [sys.executable, "-u", "tools/train.py", "--cfg",
            "experiments/model/b32-yfcc-msclips.yaml",
            "OUTPUT_DIR", str(out_dir)] + OPTS


@pytest.mark.slow
def test_kill_and_resume(tmp_path):
    out_dir = tmp_path / "run"
    env = dict(os.environ)
    # force the child onto CPU (tools read MSCLIP_PLATFORM; a config opt
    # cannot do it — the platform must be set before jax initializes),
    # and strip conftest's 8-device virtual-mesh flag: the child must see
    # ONE device so global batch 2 -> 32 steps/epoch as asserted below
    env["MSCLIP_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )

    # ---- run 1: kill after step 12 has been logged ----
    p = subprocess.Popen(
        _cmd(out_dir), cwd=REPO, env=env, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    deadline = time.time() + 900
    killed = False
    for line in p.stdout:
        if "Step[20/" in line:
            p.send_signal(signal.SIGKILL)
            killed = True
            break
        assert time.time() < deadline, "run 1 never reached step 20"
    assert killed
    p.wait(timeout=60)

    # ---- run 2: auto-resume must complete the epoch exactly ----
    r = subprocess.run(
        _cmd(out_dir), cwd=REPO, env=env, text=True, capture_output=True,
        timeout=900,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    log = r.stdout
    m = re.search(r"auto-resumed from step (\d+)", log)
    assert m, log[-3000:]
    resumed = int(m.group(1))
    # the last FINALIZED mid-epoch checkpoint: a multiple of 8, at or
    # before the kill point (saves are async — a save still in flight at
    # kill time must be discarded, not half-restored; killing at step 20
    # leaves the step-8 save ~12 steps to finalize). 8 divides 32
    # deliberately: the mid-loop save must SKIP the epoch-boundary step
    # 32 so the epoch-end metadata owns it (see tools/train.py).
    assert resumed in (8, 16), resumed
    m = re.search(r"skipping (\d+) already-seen batches", log)
    assert m, log[-3000:]
    assert int(m.group(1)) == resumed % TOTAL_STEPS
    # run 2 executes only the remaining batches of the epoch...
    steps_logged = re.findall(r"Step\[(\d+)/", log)
    assert len(steps_logged) == TOTAL_STEPS - resumed, (
        resumed, len(steps_logged))
    assert "training complete" in log

    # ...and the final checkpoint sits at exactly the full epoch's step
    # count with the NEXT epoch recorded (epoch-end metadata wins over
    # the coinciding step checkpoint)
    import orbax.checkpoint as ocp

    ckdir = None
    for root, dirs, _ in os.walk(out_dir):
        if "checkpoints" in dirs:
            ckdir = os.path.join(root, "checkpoints")
            break
    assert ckdir, f"no checkpoints dir under {out_dir}"
    mgr = ocp.CheckpointManager(os.path.abspath(ckdir))
    assert mgr.latest_step() == TOTAL_STEPS
    restored = mgr.restore(
        TOTAL_STEPS, args=ocp.args.Composite(extra=ocp.args.JsonRestore())
    )
    assert restored["extra"]["epoch"] == 1
    mgr.close()
