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

# TESTS_ON_TPU=1 keeps the real backend so tests/test_tpu_kernels.py can
# check Pallas kernels against their jnp references on hardware.
if os.environ.get("TESTS_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
