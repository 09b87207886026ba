"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with XLA host-platform device multiplexing so that
multi-device sharding paths (segment-sharded search under shard_map) are
exercised hermetically without TPU hardware.
"""

import os

# Force CPU even though the ambient environment points JAX at the tunneled
# TPU (JAX_PLATFORMS=axon) — tests must be hermetic and fast. TPU-only checks
# live in scripts/ and run explicitly on hardware.
#
# NOTE: pytest plugins import jax before this conftest runs, so setting the
# env var alone is not enough — update jax.config directly (the backend is
# not initialized until first device use, so this still takes effect).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
