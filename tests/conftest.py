"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices (the same mechanism the driver's
``dryrun_multichip`` uses). x64 is enabled so fit-path parity tests can hit
the reference's float64 tolerances.

PLATFORM FORCING: on this host a TPU plugin registers at interpreter start
(sitecustomize) and snapshots the platform ENV VARS then — setting
``JAX_PLATFORMS``/``JAX_PLATFORM_NAME`` in ``os.environ`` from conftest is
too late and the whole suite silently dispatches through the TPU tunnel
(30-60 s per compile; large programs get the remote compile helper
OOM-killed). ``jax.config.update("jax_platforms", ...)`` bypasses the env
snapshot — it is read at backend-selection time. XLA_FLAGS is still
honoured in-process because XLA reads it at client creation (first backend
use), which happens after this file runs.
"""

import os

flags = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", (
    f"tests must run on the virtual CPU mesh, got {jax.default_backend()!r}"
)
assert len(jax.devices()) == 8, jax.devices()

jax.config.update("jax_enable_x64", True)
# Persistent compile cache makes repeated test runs fast (first run pays).
# It can be DISABLED because loading cached XLA:CPU executables is flaky in
# this build environment: the VM can migrate between hosts with different
# CPU feature sets, and deserializing an executable compiled for the other
# host segfaults/aborts the process mid-suite (observed round 3, twice, in
# compilation_cache.get_executable_and_time). Set MCPOWER_TPU_JIT_CACHE=0
# for a cold-but-reliable run; default keeps the cache.
import os as _os

if _os.environ.get("MCPOWER_TPU_JIT_CACHE", "1") != "0":
    jax.config.update("jax_compilation_cache_dir", "/tmp/mcpower_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

# ---------------------------------------------------------------------------
# One-command suite (VERDICT r3 #8): XLA:CPU intermittently segfaults/aborts
# while COMPILING (or cache-loading) the large mixed-family programs in a
# long-lived pytest process that has already compiled ~25+ other programs —
# but the SAME programs are reliably green in a fresh process. So when the
# whole suite is collected, the five heavy mixed-family files are excluded
# here and executed in a FRESH subprocess by
# tests/test_mixed_family_subprocess.py; naming any heavy file explicitly on
# the command line (or setting MCPOWER_HEAVY_DIRECT=1, as that subprocess
# does) collects them normally. `pytest tests/ -q` alone is authoritative.
# ---------------------------------------------------------------------------
import sys as _sys

HEAVY_FILES = [
    "test_glmm.py",
    "test_mixed.py",
    "test_extra_groupings.py",
    "test_agq.py",
    "test_slopes.py",
]
_explicit = any(h in " ".join(_sys.argv) for h in HEAVY_FILES)
if not _explicit and _os.environ.get("MCPOWER_HEAVY_DIRECT", "0") != "1":
    collect_ignore = list(HEAVY_FILES)
