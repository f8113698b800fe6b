"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised on fake CPU devices
(xla_force_host_platform_device_count); real-TPU runs happen in bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# planner tests must not pay jax import cost; executor tests import it lazily
