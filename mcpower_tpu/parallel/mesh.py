"""Multi-device scaling: shard the sim axis over a 1-D mesh, psum the counts.

The reference scales out with worker pools whose results are only
*statistically* equivalent across pool sizes (per-worker seed offsets +
counter pooling, ports/wasm/src/seeds.ts, engine-orchestrator/src/merge.rs).
Here every simulation is addressed by its global sim id, so sharding the id
range over N devices is *bit-stable* in N: the only cross-device
communication in an entire run is one ``psum`` of small int32 count tensors,
riding ICI. Multi-host runs use the same program over a process-spanning mesh
(``jax.distributed``) — the collective then crosses DCN, still once per run.

The host-side merge algebra (orchestrator.merge) remains for heterogeneous
fan-out (e.g. pooling runs from different machines).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..engine import batch as batch_mod
from ..engine.spec import SimSpec


def sims_mesh(devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), ("sims",))


@lru_cache(maxsize=32)
def _sharded_fn(spec: SimSpec, mesh_key):
    mesh = _MESHES[mesh_key]

    def per_shard(arr: Dict, seed_lo, seed_hi, sim_ids, valid):
        def one(sid):
            return batch_mod.run_one_sim(spec, arr, seed_lo, seed_hi, sid)

        per_sim = jax.vmap(one)(sim_ids)
        counts = {}
        for name, v in per_sim.items():
            if name == "t2":
                continue
            if v.dtype == bool:
                masked = v & valid.reshape((-1,) + (1,) * (v.ndim - 1))
                counts[name] = jnp.sum(masked.astype(jnp.int32), axis=0)
            else:
                vm = jnp.where(
                    valid.reshape((-1,) + (1,) * (v.ndim - 1)),
                    jnp.where(jnp.isfinite(v), v, 0.0),
                    0.0,
                )
                counts[name] = jnp.sum(vm.astype(jnp.float64), axis=0)
        # The run's single collective: pool counters over the mesh.
        return jax.tree.map(lambda c: jax.lax.psum(c, "sims"), counts)

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("sims"), P("sims")),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


_MESHES: Dict = {}


def run_batch_multihost(
    spec: SimSpec,
    arrays: Dict,
    n_sims: int,
    base_seed: int,
    *,
    sim_id_offset: int = 0,
) -> Dict[str, np.ndarray]:
    """Multi-process (multi-host) sharded run over the GLOBAL device mesh.

    Requires ``jax.distributed.initialize()`` to have run in every process.
    The same program as ``run_batch_sharded`` executes over a mesh spanning
    all processes' devices — the single per-run ``psum`` then crosses the
    inter-host fabric (DCN on real TPU pods; gloo/TCP on the CPU dryrun,
    ``benchmarks/multihost_dryrun.py``). Global sim-id addressing makes the
    counts bit-identical to a single-process run of the same ``n_sims``.

    Inputs are materialized as global ``jax.Array``s: every process holds the
    same full host arrays, and each provides its addressable shards via
    ``jax.make_array_from_callback`` (sim ids sharded over "sims",
    everything else replicated). Each process returns the full pooled counts.
    """
    spec.validate_layout()
    mesh = sims_mesh()
    mesh_key = tuple(id(d) for d in mesh.devices.flat)
    _MESHES[mesh_key] = mesh
    nd = mesh.devices.size
    from jax.sharding import NamedSharding

    seed_lo, seed_hi = batch_mod._split_seed(base_seed)
    fn = _sharded_fn(spec, mesh_key)

    padded = -(-n_sims // nd) * nd
    sim_ids_h = (np.arange(padded, dtype=np.uint32)
                 + np.uint32(sim_id_offset))
    valid_h = np.arange(padded) < n_sims

    def _global(x, pspec):
        x = np.asarray(x)
        sh = NamedSharding(mesh, pspec)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    g_arrays = {k: _global(v, P()) for k, v in arrays.items()}
    out = fn(
        g_arrays,
        _global(np.uint32(seed_lo), P()),
        _global(np.uint32(seed_hi), P()),
        _global(sim_ids_h, P("sims")),
        _global(valid_h, P("sims")),
    )
    totals = {k: np.asarray(jax.device_get(v)) for k, v in out.items()}
    totals["n_done"] = np.asarray(n_sims)
    return totals


def run_batch_sharded(
    spec: SimSpec,
    arrays: Dict,
    n_sims: int,
    base_seed: int,
    *,
    devices=None,
    sim_id_offset: int = 0,
    chunk_size: Optional[int] = None,
    progress=None,
    cancel=None,
) -> Dict[str, np.ndarray]:
    """Device-sharded run_batch: identical counts to the single-device path
    (global sim ids), one psum per dispatch.

    Chunked dispatch mirrors run_batch's host-control model (the reference's
    per-sim progress/cancel cadence, engine-core spec.rs:38-52): global
    sim-id chunks run over the mesh, ``progress(done, total)`` fires between
    chunks and ``cancel()`` returning True stops between chunks — partial
    counts return with ``n_done`` recording completed sims, exactly like the
    single-device path, so the merge algebra handles a cancelled shard run.
    Every chunk dispatches the SAME padded shape (one compile); the tail uses
    the validity mask.
    """
    spec.validate_layout()
    mesh = sims_mesh(devices)
    mesh_key = tuple(id(d) for d in mesh.devices.flat)
    _MESHES[mesh_key] = mesh
    nd = mesh.devices.size

    seed_lo, seed_hi = batch_mod._split_seed(base_seed)
    fn = _sharded_fn(spec, mesh_key)

    chunk = int(chunk_size) if chunk_size else max(min(n_sims, 4096), 1)
    # Joint-Z (extra-grouping) per-device width caps — same policy as
    # engine.batch.run_batch: the DENSE programs fault the worker above
    # ~1024 lanes/device; the round-5 structured LMM (all-intercept)
    # program runs and wins at 4096. Chunking stays results-invisible.
    if spec.cluster is not None and spec.cluster.extra_groupings:
        from ..engine.mixedfit import _grouping_plan, _plan_all_q1

        wide_ok = spec.estimator == "mle" and _plan_all_q1(
            _grouping_plan(spec)
        )
        chunk = min(chunk, (4096 if wide_ok else 1024) * nd)
    # Pad the chunk length to a device multiple once; all dispatches reuse it.
    chunk_padded = -(-chunk // nd) * nd
    lanes = jnp.arange(chunk_padded, dtype=jnp.uint32)

    totals: Dict[str, np.ndarray] = {}
    done = 0
    while done < n_sims:
        m = min(chunk, n_sims - done)
        sim_ids = lanes + jnp.uint32(sim_id_offset + done)
        valid = lanes < m
        out = fn(
            arrays, jnp.uint32(seed_lo), jnp.uint32(seed_hi), sim_ids, valid
        )
        out = jax.device_get(out)
        for name, v in out.items():
            totals[name] = totals.get(name, 0) + np.asarray(v)
        done += m
        if progress is not None:
            progress(done, n_sims)
        if cancel is not None and cancel():
            break
    totals["n_done"] = np.asarray(done)
    return totals
