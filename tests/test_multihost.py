"""Multi-process (multi-host) mesh: the sharded program over jax.distributed.

The reference's only cross-machine story is statistically-equivalent worker
pools (ports/wasm/src/seeds.ts per-worker seed offsets + merge.rs counter
pooling). Here the claim is stronger — the SAME sharded program runs over a
process-spanning mesh (parallel/mesh.py::run_batch_multihost) and global
sim-id addressing makes process count invisible: counts are bit-identical to
a single-process run. The demo harness (benchmarks/multihost_dryrun.py)
spawns two coordinated CPU processes (2 virtual devices each), runs the
4-device mesh program, and compares against plain run_batch.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multihost_two_process_mesh_bit_identical():
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "benchmarks", "multihost_dryrun.py"),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=880,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST OK" in out.stdout
