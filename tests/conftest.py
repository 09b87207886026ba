"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with XLA host-platform device multiplexing so that
multi-device sharding paths (segment-sharded search under shard_map) are
exercised hermetically without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
