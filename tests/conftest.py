"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on virtual CPU devices
(xla_force_host_platform_device_count), the TPU-equivalent of the
reference's implicit 8-GPU launch scripts (SURVEY.md §4).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Numeric-parity tests compare against fp32 oracles.
jax.config.update("jax_default_matmul_precision", "highest")
