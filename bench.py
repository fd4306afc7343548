"""Headline benchmark: zero-shot eval image throughput per chip.

Measures jit-compiled MS-CLIP-S ViT-B/32 ``encode_image`` + classifier
matmul throughput (bf16 compute, fp32 params) on the available device —
the hot loop of the reference's eval pipeline (SURVEY.md §3.2 hot loop #2).
Baseline target (BASELINE.md): >=10,000 images/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "extra": {...}}

``value`` is the b32 eval number (BASELINE config #1). ``extra`` carries
the other BASELINE configs measured in the same run: #2 (b16 eval — the
197-token kernel stress case) and #4 (b32 contrastive train step,
fwd+bwd+AdamW). ``BENCH_QUICK=1`` skips the extras; ``BENCH_MODEL``
changes which model the headline measures.
"""

from __future__ import annotations

import functools
import json
import os
import statistics
import sys
import threading
import time

BASELINE_IMG_PER_SEC = 10_000.0

# Shared progress state for the budget watchdog: the headline is measured
# FIRST, so losing it to an external kill during a later extra (observed
# on a day of multi-minute tunnel outages: rc=124 with an empty tail)
# wastes the whole run. The watchdog flushes the one JSON line with
# whatever has been measured before the budget lands, and stage prints go
# to STDERR so a killed run's tail is self-diagnosing (stdout stays
# exactly one JSON line).
_T0 = time.monotonic()
_STATE: dict = {"ips": None, "extra": {}, "model": "", "done": False,
                "stage": "start"}
_EMIT_LOCK = threading.Lock()  # watchdog thread vs main: exactly one line


def _stage(name: str) -> None:
    _STATE["stage"] = name
    print(f"[bench +{time.monotonic() - _T0:5.0f}s] {name}",
          file=sys.stderr, flush=True)


def _emit(partial_reason: str | None = None, *,
          skip_if_done: bool = False) -> bool:
    # The lock covers the print too: the watchdog thread calls _emit and
    # then os._exit(0), so it must not be able to kill the process while
    # main is mid-write of its own line (truncated/doubled JSON).
    # Returns True iff THIS call printed the line (the watchdog only
    # os._exit(0)s when it actually emitted).
    with _EMIT_LOCK:
        if _STATE.get("emitted"):  # exactly one JSON line, ever
            return False
        if skip_if_done and _STATE["done"]:
            # Race window: main finished (done=True) between the
            # watchdog's unlocked check and here. Main WILL emit the
            # complete line itself — stamping it 'partial' (and
            # os._exit-ing before main prints) would misreport a
            # successful run.
            return False
        _STATE["emitted"] = True
        ips = _STATE["ips"]
        extra = dict(_STATE["extra"])
        if partial_reason:
            extra["partial"] = partial_reason
        if ips is None:
            print(json.dumps({
                "metric": "zero-shot eval throughput (headline not "
                          "reached)",
                "value": 0.0, "unit": "images/sec/chip",
                "vs_baseline": 0.0,
                "extra": extra,
            }), flush=True)
            return True
        print(json.dumps({
            "metric": (
                f"zero-shot eval throughput, MS-CLIP-S {_STATE['model']} "
                "@224 bf16 (uint8 in, device normalize, "
                "encode_image + 1k-class logits)"
            ),
            "value": round(ips, 1),
            "unit": "images/sec/chip",
            "vs_baseline": round(ips / BASELINE_IMG_PER_SEC, 4),
            "extra": extra,
        }), flush=True)
        return True


def _budget_max_wait() -> float:
    """Outage-wait bound: ``BENCH_MAX_WAIT`` (default 7200 s), clamped to
    what is left of ``BENCH_BUDGET`` — otherwise the watchdog's generic
    partial artifact fires mid-wait and masks the specific
    device-unreachable reason."""
    max_wait = float(os.environ.get("BENCH_MAX_WAIT", "7200"))
    budget = float(os.environ.get("BENCH_BUDGET", "3300"))
    if budget > 0:
        # margin must cover a full residual probe cycle past max_wait
        # (150 s probe + 60 s sleep) plus the watchdog's 20 s early fire;
        # a 60 s margin let the generic watchdog partial land mid-probe
        # and mask the specific device-unreachable reason.
        left = (_T0 + budget - 240.0) - time.monotonic()
        max_wait = min(max_wait, max(0.0, left))
    return max_wait


def _start_budget_watchdog() -> None:
    """``BENCH_BUDGET`` seconds (default 3300; 0 disables): ~20 s before
    the budget, if the final JSON has not been printed, emit it with the
    stages measured so far and exit 0 — a partial-but-parseable artifact
    beats rc=124 with no JSON."""
    budget = float(os.environ.get("BENCH_BUDGET", "3300"))
    if budget <= 0:
        return

    def run():
        # Fire BEFORE the external kill for any budget: 20 s early for
        # normal budgets, proportionally (20%) for tiny ones — a floor
        # like max(30, ...) would schedule the flush AFTER a sub-50 s
        # external SIGKILL and the one-JSON-line contract would fail.
        deadline = _T0 + max(budget * 0.8, budget - 20.0)
        while not _STATE["done"]:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            time.sleep(min(5.0, left))
        if not _STATE["done"]:
            # skip_if_done re-checks under _EMIT_LOCK: a run that set
            # done=True after the line above is complete and will emit
            # its own (non-partial) line — do not exit out from under it.
            if _emit(f"BENCH_BUDGET {budget:.0f}s approaching during "
                     f"stage '{_STATE['stage']}'", skip_if_done=True):
                os._exit(0)

    threading.Thread(target=run, daemon=True).start()


def _build(model_yaml: str):
    import jax

    from msclip_tpu.config import get_default_config, update_config
    from msclip_tpu.models import MSClipModel, spec_from_config

    root = os.path.dirname(os.path.abspath(__file__))
    cfg = get_default_config()
    update_config(
        cfg, os.path.join(root, f"experiments/model/{model_yaml}.yaml")
    )
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    # fused Pallas attention core is the default on TPU (BENCH_PALLAS=0
    # disables); unset -> 'auto' so CPU runs (watchdog/CI tests under
    # MSCLIP_PLATFORM=cpu) take the XLA path instead of crashing on the
    # interpret-only Pallas lowering
    _pallas_env = os.environ.get("BENCH_PALLAS")
    cfg.TPU.USE_PALLAS = "auto" if _pallas_env is None else _pallas_env != "0"
    cfg.TPU.CONV_LAYOUT = os.environ.get("BENCH_CONV_LAYOUT", "NHWC")
    if os.environ.get("BENCH_FUSED_BLOCK", "0") != "0":
        cfg.TPU.USE_FUSED_BLOCK = True
    spec = spec_from_config(cfg)
    model = MSClipModel(spec)
    return cfg, spec, model


def _bench_eval(model_yaml: str, batch: int, n_iters: int) -> float:
    """BASELINE configs #1/#2: images/sec/chip for encode_image + 1k-class
    logits from uint8 input (host decodes JPEGs to uint8; device does
    /255-mean-std normalize — the production input path, 38.5 MB of uint8
    per 256-batch instead of a 154 MB fp32 copy)."""
    import jax
    import jax.numpy as jnp

    cfg, spec, model = _build(model_yaml)
    params = model.init(jax.random.PRNGKey(0))
    if os.environ.get("BENCH_FOLD_BN", "1") != "0":
        from msclip_tpu.models.folding import fold_params_for_eval

        params = fold_params_for_eval(params, spec)
    if os.environ.get("BENCH_CAST_PARAMS", "0") != "0":
        # bf16-stored weights (halved weight HBM reads; the serving
        # memory mode) — measure vs the fp32-stored default
        from msclip_tpu.models.msclip import cast_params

        params = cast_params(params)
    if os.environ.get("BENCH_INT8", "0") != "0":
        from msclip_tpu.models.quantize import quantize_params_for_eval

        params = quantize_params_for_eval(params, spec)

    n_classes = 1000
    classifier = jax.random.normal(
        jax.random.PRNGKey(1), (spec.embed_dim, n_classes), jnp.bfloat16
    )

    from msclip_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    @jax.jit
    def eval_many(params, classifier, key):
        """n_iters eval batches chained in ONE dispatch (lax.scan), so the
        host<->device round-trip (tens of ms over remote tunnels) is paid
        once, not per batch. Returns one scalar; fetching it is the
        completion barrier (block_until_ready is unreliable over
        tunnels)."""

        base = jax.random.randint(
            key, (batch, 224, 224, 3), 0, 256, jnp.uint8
        )
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)

        def body(carry, i):
            # cheap per-step perturbation defeats CSE without adding
            # measurable work
            images_u8 = base + i.astype(jnp.uint8)
            images = (images_u8.astype(jnp.float32) / 255.0 - mean) / std
            feats = model.encode_image(params, images)
            logits = 100.0 * feats @ classifier.astype(feats.dtype)
            top1 = jnp.argmax(logits, axis=-1).astype(jnp.int32).sum()
            return carry + top1, None

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.int32), jnp.arange(n_iters)
        )
        return total

    key = jax.random.PRNGKey(2)
    int(eval_many(params, classifier, key))  # compile + warmup

    times = []
    for t in range(3):
        t0 = time.perf_counter()
        int(eval_many(params, classifier, jax.random.PRNGKey(t)))
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    # Unsharded jit executes on device 0 only, so this is a single-chip
    # number by construction — dividing by local_device_count() would
    # understate it on multi-chip hosts.
    return batch * n_iters / elapsed


def _bench_train(model_yaml: str, batch: int, n_iters: int) -> float:
    """BASELINE config #4: samples/sec/chip for the full contrastive train
    step (fwd + bwd + InfoNCE + AdamW + BN replay), n_iters steps chained
    in one jit'd scan."""
    import jax
    import jax.numpy as jnp

    from msclip_tpu.train.optim import build_optimizer
    from msclip_tpu.train.trainer import init_train_state, make_step_core

    cfg, spec, model = _build(model_yaml)
    if os.environ.get("BENCH_REMAT", "0") != "0":
        import dataclasses

        spec = dataclasses.replace(spec, remat=True)
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=1000)
    state = init_train_state(model, tx, params=params)
    # BENCH_ACCUM=N: GradCache two-pass accumulation (TPU.ACCUM_STEPS) —
    # measures the throughput cost of the ~1/N-activation-memory mode
    step = make_step_core(
        spec, tx, accum_steps=int(os.environ.get("BENCH_ACCUM", "1"))
    )

    images = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 224, 224, 3), jnp.bfloat16
    )
    tokens = jnp.zeros((batch, 77), jnp.int32).at[:, 0].set(49406)
    tokens = tokens.at[:, 1].set(320).at[:, 2].set(49407)

    # TPU.XLA_VMEM_KIB default: 24576 measured +1.5-1.8% (b32) / +0.5%
    # (b16) on this step, neutral on eval (experiments/xla_options_sweep)
    from msclip_tpu.utils.platform import xla_compiler_options

    copts = xla_compiler_options(int(os.environ.get("BENCH_VMEM_KIB",
                                                    "24576")))

    @functools.partial(jax.jit, compiler_options=copts)
    def run(state, images, tokens):
        def body(st, i):
            st2, m = step(st, images + i.astype(images.dtype) * 1e-6,
                          tokens)
            return st2, m["loss"]

        _, losses = jax.lax.scan(body, state, jnp.arange(n_iters))
        return losses.sum()

    float(run(state, images, tokens))  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(state, images, tokens))
        times.append(time.perf_counter() - t0)
    per_step = min(times) / n_iters
    # single-chip by construction (unsharded jit) — see _bench_eval
    return batch / per_step


def _bench_jpeg(model_yaml: str, batch: int, n_batches: int) -> dict:
    """BENCH_JPEG=1: the PRODUCTION input path — JPEG bytes -> native
    multi-threaded DCT-scaled decode to **uint8 center crops** -> device
    transfer (150 KB/img, 4x smaller than the fp32 pixels r3 shipped) ->
    in-graph /255-mean-std normalize (fused into the first conv) ->
    encode_image + 1k-class logits, host decode overlapped with device
    compute (double-buffered dispatch). Reported numbers:

      jpeg_eval_ips        end-to-end images/sec. On THIS sandbox it is
                           transfer-bound: the 150 KB/img upload streams
                           at the tunnel's ~25 MB/s (~160 img/s ceiling;
                           measured breakdown in PARITY.md). On a real
                           host (PCIe) it is decode-bound —
                           jpeg_decode_ips_core x cores.
      jpeg_decode_ips_core single-thread native uint8 decode rate,
                           img/s/core (x cores = a host's feed ceiling)
      jpeg_decode_ips_core_full  same without DCT-scaled decode
      jpeg_transfer_ips_bound    measured host->device upload bound for
                           one uint8 batch (sandbox tunnel artifact)
      jpeg_feed_ips_bound  ACHIEVABLE feed bound: the same overlapped
                           decode+upload pipeline with a no-op device
                           program. On a 1-vCPU host with a fast tunnel
                           the decode worker and the tunnel client's
                           serialization share one core, so
                           min(decode, transfer) can be physically
                           unattainable (r5 triple-run 2: decode 187.4,
                           transfer 176.8, serial combination
                           1/(1/187.4+1/176.8)=91; pipeline 119.5 —
                           BETWEEN them because upload is only partly
                           CPU). Only a measurement places the real
                           ceiling; this is that measurement.
      jpeg_eval_vs_bound   jpeg_eval_ips / min(decode, transfer, feed)
                           per repeat, median over repeats — the stable
                           cross-run claim: ~1.0 = the model compute
                           fully hides under the host feed path
      jpeg_eval_vs_dt_bound  same but vs min(decode, transfer) only
                           (the pre-r5 semantic, kept for comparison;
                           < vs_bound exactly when shared-CPU
                           contention binds)

    Images are synthetic 1024x768 q90 JPEGs (YFCC-like photo scale).
    """
    import io

    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from msclip_tpu import native as N
    from msclip_tpu.data.transforms import (IMAGENET_MEAN, IMAGENET_STD,
                                            normalize_uint8)

    if not N.native_available():
        return {"jpeg_error": f"native unavailable: {N.build_error()!r}"}

    cfg, spec, model = _build(model_yaml)
    params = model.init(jax.random.PRNGKey(0))
    if os.environ.get("BENCH_FOLD_BN", "1") != "0":
        from msclip_tpu.models.folding import fold_params_for_eval

        params = fold_params_for_eval(params, spec)
    classifier = jax.random.normal(
        jax.random.PRNGKey(1), (spec.embed_dim, 1000), jnp.bfloat16
    )

    @jax.jit
    def logits_top1(params, classifier, images_u8):
        images = normalize_uint8(images_u8, IMAGENET_MEAN, IMAGENET_STD)
        feats = model.encode_image(params, images)
        logits = 100.0 * feats @ classifier.astype(feats.dtype)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32).sum()

    rng = np.random.default_rng(0)
    datas = []
    for i in range(batch):
        small = rng.integers(0, 256, (97, 129, 3), np.uint8)
        img = Image.fromarray(small, "RGB").resize((1024, 768),
                                                   Image.BILINEAR)
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=90)
        datas.append(buf.getvalue())

    # single-thread decode rate, both modes (per-core feed capacity)
    out = {}
    for key, dct in (("jpeg_decode_ips_core", True),
                     ("jpeg_decode_ips_core_full", False)):
        for d in datas[:4]:
            N.decode_eval_u8(d, 224, dct_scale=dct)
        t0 = time.perf_counter()
        n_timed = min(len(datas), 64)
        for d in datas[:n_timed]:
            N.decode_eval_u8(d, 224, dct_scale=dct)
        out[key] = round(n_timed / (time.perf_counter() - t0), 1)

    # end-to-end, 3-stage pipeline: a background thread decodes batch
    # i+1 (the ctypes call releases the GIL, and the C++ pool is
    # CPU-bound) while the main thread waits on batch i's host->device
    # transfer (socket I/O on the tunnel — near-zero CPU) and batch i-1
    # computes on the device. r4 fix: the previous loop serialized
    # decode with the transfer, capping the measured rate at
    # 1/(decode+transfer) ≈ 103 img/s instead of the decode bound
    # (~175 img/s/core); production eval already overlaps these via the
    # loader's run-ahead workers (data/loader.py), so the bench was
    # underselling the real path.
    def host_decode():
        imgs, ok = N.decode_eval_batch_u8(datas, 224, dct_scale=True)
        assert ok.all()
        return imgs

    warm = host_decode()
    int(logits_top1(params, classifier, jnp.asarray(warm)))  # compile

    # Host->device upload bound for the uint8 crops: on this sandbox the
    # ~25 MB/s tunnel caps the pipeline (~160 img/s at 150 KB/img)
    # whenever the decode bound is higher (idle CPU); a PCIe host never
    # sees it. Timed re-uploads of an already-decoded batch, barriered by
    # a scalar fetch (block_until_ready does not truly block over the
    # tunnel); measured per-repeat below, contemporaneous with the
    # pipeline runs.
    @jax.jit
    def _touch(x):
        return x.sum()

    int(_touch(jnp.asarray(warm)))  # compile the barrier program

    import collections
    import queue
    import threading

    def run_pipeline(depth: int, step=None) -> float:
        """Decode thread feeds a bounded queue; main thread uploads and
        keeps up to ``depth`` dispatched programs un-fetched (the tunnel's
        ~28 ms RTT rides under the next upload). ``step`` is the device
        program per uploaded batch (default: the real model); passing
        ``_touch`` turns this into the achievable-feed-bound measurement
        (identical host path, no-op device program). Returns img/s."""
        if step is None:
            step = lambda imgs: logits_top1(params, classifier, imgs)  # noqa: E731
        decoded = queue.Queue(maxsize=3)

        def producer():
            # An exception here must still enqueue a sentinel or the main
            # thread blocks on decoded.get() forever (hang with no JSON —
            # the exact failure mode the watchdog exists to prevent); ship
            # the exception itself so the error is attributable.
            try:
                for _ in range(n_batches):
                    decoded.put(host_decode())
                decoded.put(None)
            except BaseException as e:  # noqa: BLE001 — re-raised on main
                decoded.put(e)

        threading.Thread(target=producer, daemon=True).start()
        t0 = time.perf_counter()
        pending: collections.deque = collections.deque()
        while True:
            imgs = decoded.get()
            if isinstance(imgs, BaseException):
                raise imgs
            if imgs is None:
                break
            pending.append(step(jnp.asarray(imgs)))
            while len(pending) > depth:
                int(pending.popleft())
        while pending:
            int(pending.popleft())
        return batch * n_batches / (time.perf_counter() - t0)

    # r4's recorded jpeg_eval_vs_bound (0.615) contradicted the claimed
    # 0.85x because the decode bound and the pipeline were measured
    # minutes apart under SHIFTING host contention (the single-core rate
    # swings 26-204 img/s on this sandbox within one session). r5 fix
    # (VERDICT r4 #1): measure bound -> pipeline -> bound per repeat,
    # compute the ratio against the min of the CONTEMPORANEOUS decode and
    # transfer bounds, and report the median over BENCH_JPEG_REPEATS.
    #   - decode bound uses decode_eval_batch_u8, the pipeline's own
    #     pooled API (not the single-image loop), so pool overhead is
    #     inside the bound, and on a multi-core host the pooled rate IS
    #     the multi-core bound (no x-cores extrapolation).
    #   - the binding constraint is min(decode, transfer): on a PCIe
    #     host transfer is never it; on this ~25 MB/s tunnel it often
    #     is, and dividing by a bound the hardware cannot reach would
    #     misreport pipeline efficiency.
    repeats = max(1, int(os.environ.get("BENCH_JPEG_REPEATS", "3")))
    depth = max(1, int(os.environ.get("BENCH_JPEG_DEPTH", "2")))
    pipes, decodes, transfers, feeds = [], [], [], []
    ratios, dt_ratios = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        host_decode()
        d_bound = batch / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        int(_touch(jnp.asarray(warm)))
        t_bound = batch / (time.perf_counter() - t0)
        # Achievable feed bound: identical overlapped decode+upload
        # pipeline, no-op device program — the ceiling decode and the
        # tunnel client's serialization can jointly sustain on this
        # host's cores (see docstring: min(decode, transfer) assumes
        # they don't share CPU, which a 1-vCPU host violates).
        feed = run_pipeline(depth, step=_touch)
        pipe = run_pipeline(depth)
        t0 = time.perf_counter()
        host_decode()
        d_bound = 0.5 * (d_bound + batch / (time.perf_counter() - t0))
        decodes.append(d_bound)
        transfers.append(t_bound)
        feeds.append(feed)
        pipes.append(pipe)
        ratios.append(pipe / min(d_bound, t_bound, feed))
        dt_ratios.append(pipe / min(d_bound, t_bound))

    med = statistics.median
    out["jpeg_transfer_ips_bound"] = round(med(transfers), 1)
    out["jpeg_decode_ips_pool"] = round(med(decodes), 1)
    out["jpeg_feed_ips_bound"] = round(med(feeds), 1)
    out["jpeg_eval_ips"] = round(med(pipes), 1)
    out["jpeg_host_cores"] = os.cpu_count()
    out["jpeg_eval_vs_bound"] = round(med(ratios), 3)
    out["jpeg_eval_vs_bound_min"] = round(min(ratios), 3)
    out["jpeg_eval_vs_dt_bound"] = round(med(dt_ratios), 3)
    return out


def _device_reachable(timeout_s: float = 150.0) -> bool:
    """Health-check the accelerator in a KILLABLE subprocess: over the
    remote TPU tunnel an outage makes dispatches hang rather than fail,
    so an in-process probe could block forever."""
    import subprocess
    import sys

    # honor MSCLIP_PLATFORM in the probe too (CPU runs must not probe
    # the tunnel)
    code = ("from msclip_tpu.utils.platform import apply_platform_override;"
            " apply_platform_override();"
            " import jax; x = jax.numpy.ones((128, 128));"
            " print(float((x @ x).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_for_device(max_wait_s: float) -> tuple:
    """Poll until the device answers or the budget runs out. Returns
    ``(reachable, seconds_elapsed)`` — an explicit flag, because a probe
    that SUCCEEDS can still finish past the budget (each probe takes up
    to 150 s + a 60 s sleep), and inferring reachability from elapsed
    time would report a healthy device as unreachable. The tunnel has
    multi-hour outages; starting the bench mid-outage would hang with no
    JSON line at all. (A healthy probe also warms the tunnel, so it is
    nearly free overall.)"""
    start = time.monotonic()
    while True:
        # clamp the probe to what is left of the wait budget (>=5 s so a
        # healthy-but-warming tunnel still gets a real chance) — an
        # uncapped 150 s probe starting just under max_wait would
        # overshoot the BENCH_BUDGET margin _budget_max_wait reserves
        left = max_wait_s - (time.monotonic() - start)
        if _device_reachable(min(150.0, max(5.0, left))):
            return True, time.monotonic() - start
        if time.monotonic() - start > max_wait_s:
            return False, time.monotonic() - start
        time.sleep(min(60.0, max(1.0, max_wait_s -
                                 (time.monotonic() - start))))


def main():
    from msclip_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    n_iters = int(os.environ.get("BENCH_ITERS", "32"))
    model_yaml = os.environ.get("BENCH_MODEL", "b32-yfcc-msclips")
    _STATE["model"] = model_yaml
    _start_budget_watchdog()

    # preflight (BENCH_PREFLIGHT=0 skips): don't start into an outage
    if os.environ.get("BENCH_PREFLIGHT", "1") != "0":
        _stage("preflight device probe")
        reachable, waited = _wait_for_device(_budget_max_wait())
        if not reachable:
            _STATE["done"] = True
            _emit(f"TPU tunnel unreachable for {int(waited)}s; see the "
                  f"last BENCH_r*.json for a healthy measurement")
            return

    extra = _STATE["extra"]
    for attempt in range(3):
        try:
            _stage(f"headline {model_yaml} eval (attempt {attempt + 1})")
            _STATE["ips"] = _bench_eval(model_yaml, batch, n_iters)
            break
        except Exception:
            if attempt == 2:
                raise
            # transient mid-run outage: wait for the device and retry
            _stage("headline failed; waiting out a possible outage")
            _wait_for_device(_budget_max_wait())

    if os.environ.get("BENCH_QUICK", "0") == "0":
        if model_yaml != "b16-yfcc-msclips":  # skip if it IS the headline
            try:
                _stage("extra: b16 eval")
                extra["b16_eval_ips"] = round(
                    _bench_eval("b16-yfcc-msclips", batch, n_iters), 1
                )
            except Exception as e:  # never let an extra kill the headline
                extra["b16_eval_error"] = repr(e)[:200]
        try:
            _stage("extra: b32 train step")
            extra["b32_train_sps"] = round(
                _bench_train("b32-yfcc-msclips", batch, 8), 1
            )
        except Exception as e:
            extra["b32_train_error"] = repr(e)[:200]
        if os.environ.get("BENCH_JPEG", "1") != "0":
            # default-on: the JPEG->logits production-path number belongs
            # next to the uint8 headline (BENCH_JPEG=0 to skip; honors
            # BENCH_QUICK=1 like every other extra)
            try:
                _stage("extra: JPEG-fed eval path")
                extra.update(_bench_jpeg(model_yaml, batch,
                                         max(n_iters // 8, 2)))
            except Exception as e:
                extra["jpeg_error"] = repr(e)[:200]

    _STATE["done"] = True
    _emit()


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:
        # The one-JSON-line contract holds even when the headline dies on
        # all retries: flush a partial artifact (stage + error), THEN
        # re-raise so the exit code still says failure. done=True FIRST:
        # otherwise the budget watchdog can wake during the unwind and
        # os._exit(0), flipping the failure exit code to success.
        _STATE["done"] = True
        _emit(f"unhandled in stage '{_STATE['stage']}': {repr(e)[:200]}")
        raise
