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

# Drop TPU-ish factories registered by sitecustomize before first backend init;
# harmless if absent. Backends are created lazily, so doing this at conftest
# import time (before any test touches jax) is early enough.
for _name in ("axon", "tpu"):
    _xb._backend_factories.pop(_name, None)

# sitecustomize imported jax with JAX_PLATFORMS=axon already baked into the
# config; the env change above came too late, so update the live config too.
jax.config.update("jax_platforms", "cpu")
