"""Test harness config: force CPU with 8 virtual devices.

Mirrors SURVEY.md §4's rebuild test strategy: multi-chip sharding is
validated on a virtual CPU mesh so no pod is needed; TPU numerics are
covered separately by the driver's single-chip bench.

NOTE: the environment's sitecustomize imports jax and registers the remote
TPU backend before pytest starts, so env vars are too late — we must force
the platform through jax.config (which works until a backend is used).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
