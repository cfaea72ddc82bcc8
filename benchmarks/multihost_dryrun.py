"""Multi-host dryrun: the sharded engine over a mesh spanning 2 PROCESSES.

Validates the claim in ``parallel/mesh.py`` that multi-host scaling is the
same program over a process-spanning mesh — the per-run ``psum`` of count
tensors then crosses the inter-host fabric (DCN on a real TPU pod; gloo/TCP
here). Two coordinated processes each expose 2 virtual CPU devices, build
the 4-device global mesh, and run ``run_batch_multihost``; the pooled counts
must be BIT-IDENTICAL to a plain single-process ``run_batch`` of the same
(seed, n_sims) — global sim-id addressing makes process count invisible,
which is strictly stronger than the reference's statistically-equivalent
worker pools (ports/wasm/src/seeds.ts: per-worker base_seed offsets).

Usage:
    python benchmarks/multihost_dryrun.py            # parent: spawns 2 workers
    (workers are re-invocations with --process-id)

Exit 0 + "MULTIHOST OK" on success.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_SIMS = 96
SEED = 2137


def _tiny_case():
    import numpy as np

    from mcpower_tpu.engine import lower

    return lower.lower(
        grid=[40, 60],
        var_types=["normal", "binary"],
        var_params=[0.5, 0.5],
        corr=np.array([[1.0, 0.2], [0.2, 1.0]]),
        effects=np.array([0.0, 0.4, 0.3]),
        target_cols=[1, 2],
    )


def _jit_cache(jax) -> None:
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/mcpower_tpu_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)


def worker(process_id: int, num_processes: int, coordinator: str) -> None:
    import jax

    _jit_cache(jax)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert len(jax.devices()) == 2 * num_processes, (
        f"expected {2 * num_processes} global devices, got {jax.devices()}"
    )

    sys.path.insert(0, REPO)
    from mcpower_tpu.parallel import mesh

    spec, arrays = _tiny_case()
    totals = mesh.run_batch_multihost(spec, arrays, N_SIMS, SEED)
    out = {
        k: np.asarray(v).tolist() for k, v in sorted(totals.items())
    }
    print(f"WORKER{process_id} {json.dumps(out, sort_keys=True)}", flush=True)


def single_process_reference() -> str:
    """Ground truth: plain run_batch in THIS process (CPU, no distributed)."""
    import jax

    _jit_cache(jax)
    sys.path.insert(0, REPO)
    from mcpower_tpu.engine import batch

    spec, arrays = _tiny_case()
    totals = batch.run_batch(spec, arrays, N_SIMS, SEED, chunk_size=N_SIMS)
    out = {k: np.asarray(v).tolist() for k, v in sorted(totals.items())}
    return json.dumps(out, sort_keys=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", type=str, default=None)
    args = ap.parse_args()

    if args.process_id is not None:
        worker(args.process_id, args.num_processes, args.coordinator)
        return

    # Parent: pick a free port, spawn the workers with CPU-platform env set
    # BEFORE interpreter start (the axon TPU plugin snapshots platform env at
    # import — see CLAUDE.md), collect and compare their output.
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    # CPU-platform env must be set before the child interpreter starts; the
    # axon TPU plugin registers via sitecustomize and honours only the
    # legacy JAX_PLATFORM_NAME + its pool-IPs gate (see __graft_entry__).
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=2")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_ENABLE_X64"] = "1"

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--process-id",
                str(i),
                "--num-processes",
                str(args.num_processes),
                "--coordinator",
                coordinator,
            ],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(args.num_processes)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        if p.returncode != 0:
            print("\n".join(outs))
            raise SystemExit(f"worker failed rc={p.returncode}")

    payloads = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("WORKER"):
                tag, payload = line.split(" ", 1)
                payloads[tag] = payload
    if len(payloads) != args.num_processes:
        print("\n".join(outs))
        raise SystemExit("missing worker payloads")
    vals = list(payloads.values())
    if any(v != vals[0] for v in vals[1:]):
        raise SystemExit("worker payloads disagree (replication broken)")

    # Compare against the single-process ground truth computed in a child
    # with the same CPU env (this parent process never imports jax).
    ref = subprocess.run(
        [
            sys.executable,
            "-c",
            (
                "import sys; sys.path.insert(0, %r); "
                "from benchmarks.multihost_dryrun import "
                "single_process_reference; "
                "print('REF', single_process_reference())"
            )
            % REPO,
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    if ref.returncode != 0:
        print(ref.stdout, ref.stderr)
        raise SystemExit("reference run failed")
    ref_payload = next(
        line.split(" ", 1)[1]
        for line in ref.stdout.splitlines()
        if line.startswith("REF ")
    )
    multi = json.loads(vals[0])
    ref_d = json.loads(ref_payload)
    common = sorted(set(multi) & set(ref_d) - {"n_done"})
    if not common:
        raise SystemExit("no common count keys to compare")
    for k in common:
        a, b = np.asarray(multi[k]), np.asarray(ref_d[k])
        if a.dtype.kind in "iub" and b.dtype.kind in "iub":
            ok = np.array_equal(a, b)  # counts: bit-identical
        else:
            # float accumulators: psum order differs from the single-device
            # sum order, so allow reassociation-level tolerance only
            ok = np.allclose(a, b, rtol=1e-9, atol=1e-12)
        if not ok:
            print("multihost:", k, multi[k])
            print("reference:", k, ref_d[k])
            raise SystemExit(
                "multihost counts differ from single-process run_batch"
            )
    print(f"MULTIHOST OK ({args.num_processes} processes, 4-device mesh, "
          f"{N_SIMS} sims bit-identical to single-process)")


# Workers import numpy lazily so the parent stays import-light.
import numpy as np  # noqa: E402


if __name__ == "__main__":
    main()
