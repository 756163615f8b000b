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

# Persistent compilation cache: the quick tier is compile-bound (every
# fused-solve/kernel test pays tens of seconds of XLA CPU compiles), and
# repeat runs hit the same programs. Local reruns reuse ~/.cache; CI
# restores it via actions/cache (see .github/workflows/python-app.yml).
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "kmanip_jax_cache"),
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# CPU-backend compiles are cached only with this flag (XLA:CPU is
# otherwise excluded from the persistent cache)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
