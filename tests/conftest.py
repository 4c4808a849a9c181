"""Test config: force CPU with 8 virtual devices so distributed tests run
anywhere (SURVEY.md §4's recommended upgrade over the reference's
hardware-only verification).

Note: this environment registers a TPU PJRT plugin from sitecustomize and
pins JAX_PLATFORMS=axon, so we must override via jax.config after import.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
