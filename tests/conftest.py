"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated the JAX way (SURVEY.md §4): the same
code that runs on a TPU slice executes here on 8 virtual CPU devices via
`--xla_force_host_platform_device_count=8`.

This environment pre-imports jax and pins JAX_PLATFORMS to the TPU plugin at
interpreter startup, so the CPU override must go through `jax.config` (env
vars are already consumed) — and must run before any backend is initialized.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
