"""Platform override + persistent-compile-cache helpers.

This host pins ``JAX_PLATFORMS=axon`` (TPU tunnel) in a way that wins over
user-set environment variables; ``jax.config.update`` after import is the
only reliable override. Tools call this first thing so
``MSCLIP_PLATFORM=cpu`` works for CI / offline runs.

JAX's persistent compilation cache is ON by default at
``~/.cache/msclip_tpu/jax_cache`` (``MSCLIP_COMPILE_CACHE=<dir>``
relocates it, ``=0`` disables): first compiles of the full-geometry
towers cost 20-40 s on TPU (more over the tunnel), and eval/serve/train
entry points recompile identical programs on every process start — the
reference's torch stack has no compile step to amortize, so this is a
TPU-specific production knob. Every tool routes through
:func:`apply_platform_override`, so one switch covers the whole CLI
surface.
"""

import os


def apply_platform_override() -> None:
    plat = os.environ.get("MSCLIP_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    enable_compile_cache()
    if os.environ.get("MSCLIP_DEBUG_NANS") == "1":
        # env-var twin of TRAIN.DETECT_ANOMALY (which tools/train.py also
        # wires): NaN checking on every CLI entry point without a config
        # edit — the debugging knob the reference gets from
        # torch.autograd.set_detect_anomaly (lib/config/default.py:151)
        from .summary import debug_nans

        debug_nans(True)


def xla_compiler_options(vmem_kib: int = 0):
    """Per-compile XLA options for the hot jits, or ``None``.

    ``xla_tpu_scoped_vmem_limit_kib`` caps the VMEM budget XLA's fusions
    may claim; the measured sweeps (`experiments/xla_options_sweep.py`,
    v5e) found 24576 KiB worth +1.5-1.8% on the b32 train step and +0.5%
    on b16 (neutral on eval), while >=64 MB LOSES (it starves the Pallas
    attention kernels into spills). Flags set via the client
    ``XLA_FLAGS`` env never reach the tunnel-side compiler, so these
    ride the PJRT compile options instead
    (``jax.jit(..., compiler_options=...)``).

    ``MSCLIP_XLA_VMEM_KIB`` overrides (0 disables). Returns ``None`` on
    non-TPU backends — the CPU compiler rejects unknown TPU flags.
    """
    env = os.environ.get("MSCLIP_XLA_VMEM_KIB")
    if env is not None:
        try:
            vmem_kib = int(env)
        except ValueError:
            vmem_kib = 0
    if vmem_kib <= 0:
        return None
    import jax

    try:
        # 'axon' is this environment's tunneled-TPU platform name
        # (models/msclip.py uses the same check); gating on != "tpu"
        # alone would silently disable the option on the very hardware
        # the sweep measured it on.
        if jax.default_backend() not in ("tpu", "axon"):
            return None
    except Exception:
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(vmem_kib)}


def default_cache_dir() -> str:
    """The one place the shared compile-cache location is defined
    (conftest, dryrun, experiments all key off it): honors
    ``MSCLIP_COMPILE_CACHE`` (a path, or "0" to disable), else
    ``~/.cache/msclip_tpu/jax_cache``."""
    return os.environ.get(
        "MSCLIP_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "msclip_tpu",
                     "jax_cache"),
    )


def enable_compile_cache(cache_dir=None) -> None:
    """Persist compiled executables under ``cache_dir`` (default:
    :func:`default_cache_dir`; no-op for "0"). Thresholds are zeroed so
    even fast-compiling programs (the serving bucket graphs) are cached —
    disk is cheap next to a 20 s recompile per process start."""
    if cache_dir is None:
        cache_dir = default_cache_dir()
    if not cache_dir or cache_dir == "0":
        return
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
