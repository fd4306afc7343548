"""Platform override helper.

This host pins ``JAX_PLATFORMS=axon`` (TPU tunnel) in a way that wins over
user-set environment variables; ``jax.config.update`` after import is the
only reliable override. Tools call this first thing so
``MSCLIP_PLATFORM=cpu`` works for CI / offline runs.
"""

import os


def apply_platform_override() -> None:
    plat = os.environ.get("MSCLIP_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
