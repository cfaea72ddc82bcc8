"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices (the same mechanism the driver's
``dryrun_multichip`` uses). x64 is enabled so fit-path parity tests can hit
the reference's float64 tolerances.
"""

import os

# Force CPU even when the environment pins another platform (e.g. a TPU
# plugin set via JAX_PLATFORMS): tests must run hermetically on the virtual
# 8-device host mesh. NOTE: under the axon TPU tunnel, JAX_PLATFORMS=cpu is
# NOT honoured (the plugin registers at interpreter start and every compile
# round-trips the tunnel at ~30-60s each); the legacy JAX_PLATFORM_NAME is,
# and gives local sub-second CPU compiles.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# Persistent compile cache makes repeated test runs fast (first run pays).
jax.config.update("jax_compilation_cache_dir", "/tmp/mcpower_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
