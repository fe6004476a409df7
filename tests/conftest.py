"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh so that multi-chip
sharding code paths compile and execute without TPU hardware, and with
x64 enabled so geometry property tests can assert at float64 precision
(the reference's geometry.cc tests assert at 1e-13).
"""

import os

# hard-set: the environment presets JAX_PLATFORMS=axon (the TPU tunnel),
# which makes every tiny test dispatch cross the tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
