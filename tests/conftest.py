"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on virtual CPU devices
(xla_force_host_platform_device_count), the TPU-equivalent of the
reference's implicit 8-GPU launch scripts (SURVEY.md §4).

NOTE: the axon TPU plugin ignores JAX_PLATFORMS=cpu set via environment —
it must be cleared from the env and the platform forced through jax.config,
otherwise every test silently runs over the single-chip TPU tunnel.
"""
import os

os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Numeric-parity tests compare against fp32 oracles.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: repeated pytest runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")
