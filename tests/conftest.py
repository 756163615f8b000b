"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh (the standard fake-multihost
pattern) so sharding tests run without TPU hardware and unit tests do not
round-trip through the TPU tunnel. Must run before any jax import.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
