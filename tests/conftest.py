"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY §4: multi-host logic testable via
xla_force_host_platform_device_count).

NOTE: this machine's sitecustomize pre-imports jax and registers a remote
TPU platform ("axon"); env vars alone are read too early to override it,
so we must use jax.config.update after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
