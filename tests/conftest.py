"""Test harness: force an 8-device virtual CPU mesh.

The environment's sitecustomize pre-imports jax and pins the platform to the
single-tenant TPU tunnel; initializing that backend from tests would serialize
every test process on the tunnel claim.  Tests run CPU-only on a simulated
8-device mesh instead (SURVEY.md §4: multi-host logic is validated with
``--xla_force_host_platform_device_count``), so we override the platform
*programmatically* before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (may already be imported by sitecustomize)

jax.config.update("jax_platforms", "cpu")
