"""Test configuration: run JAX on a virtual 8-device CPU mesh in float64.

The reference model is 64-bit throughout (`ifort -r8`, run/mk.ver:41-45);
tests enforce the same precision contract on CPU. Multi-chip sharding is
validated on the virtual device mesh (SURVEY.md §4e).

Note: this environment preregisters a TPU-tunnel PJRT plugin through
sitecustomize *before* conftest runs, so the platform must be forced to
cpu via jax.config (env vars are too late).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
