"""Test configuration: force an 8-device virtual CPU platform so data-parallel
sharding semantics are exercised without TPU hardware (SURVEY.md §4).

The container's sitecustomize registers the axon TPU PJRT plugin in every
python process (when ``PALLAS_AXON_POOL_IPS`` is set), and initializing that
backend blocks on a TPU-claim handshake for ~2 minutes — even when tests only
want CPU. Tests must be fast and CPU-only, so before any backend is
initialized we deregister the axon factory and pin ``JAX_PLATFORMS=cpu`` with
8 virtual host devices.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import jax._src.xla_bridge as _xb  # noqa: E402

# Drop the axon factory registered by sitecustomize before first backend init
# (harmless if absent). Backends are created lazily, so doing this at conftest
# import time (before any test touches jax) is early enough. The stock 'tpu'
# factory stays registered: it is never initialized under JAX_PLATFORMS=cpu,
# and removing it breaks MLIR lowering registration (chex imports).
_xb._backend_factories.pop("axon", None)

# sitecustomize imported jax with JAX_PLATFORMS=axon already baked into the
# config; the env change above came too late, so update the live config too.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the big train-step graphs take ~60s each to
# compile on CPU; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/fsnet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
