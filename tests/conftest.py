"""Test environment: force the CPU backend with an 8-device virtual mesh so
multi-chip sharding code paths are exercised without TPU hardware
(SURVEY.md §4.4). The host environment pins JAX_PLATFORMS=axon (TPU), so we
override through jax.config before any backend initializes."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache, shared across tests, subprocess CLI tests
# (they inherit the env var and route through apply_platform_override),
# and suite re-runs: XLA CPU compiles dominate the suite's wall time
# (~35 min cold solo; the two big CLI tests alone are ~9 min of fresh
# subprocess compiles). MSCLIP_TEST_COMPILE_CACHE=0 disables; a test
# that needs its own cache dir just sets MSCLIP_COMPILE_CACHE in its
# subprocess env as before.
_cache = os.environ.get(
    "MSCLIP_TEST_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "msclip_tpu",
                 "test_jax_cache"),
)
if _cache and _cache != "0":
    from msclip_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(_cache)
    os.environ.setdefault("MSCLIP_COMPILE_CACHE", _cache)
else:
    # The kill switch must reach subprocess CLI tests too:
    # apply_platform_override default-enables the production cache dir,
    # so without this a child process would silently re-enable caching
    # and MSCLIP_TEST_COMPILE_CACHE=0 would not measure cold compiles.
    os.environ["MSCLIP_COMPILE_CACHE"] = "0"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def repo_root():
    import pathlib

    return pathlib.Path(__file__).resolve().parent.parent
