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

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def repo_root():
    import pathlib

    return pathlib.Path(__file__).resolve().parent.parent
