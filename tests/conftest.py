"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised on fake CPU devices
(xla_force_host_platform_device_count); real-TPU runs happen in bench.py.

NOTE: the environment pre-exports JAX_PLATFORMS=axon (the TPU tunnel
plugin) and the plugin wins over a plain env override, so we must force the
platform through jax.config before any computation.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # complex128 paths in CPU tests
