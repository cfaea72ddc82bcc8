"""Batch driver: jit(vmap(run_one_sim)) with on-device count reduction.

The reference's batch driver fans sims out over rayon threads with per-sim
mutable result slices (crates/engine-core/src/batch.rs:636-743). Here the
whole per-sim pipeline — generation, fit, thresholding, corrections, posthoc
— is a pure function of ``(spec, arrays, seed, sim_id)``; ``vmap`` over the
sim axis turns it into one fused batched XLA program and the per-sim u8
flags are reduced to int32 counts before they ever leave the device. The
sequential/parallel bit-identity the reference proves with a twin
(run_batch_st) holds here by construction: results depend only on sim ids,
never on batch shape, chunking, or device placement.

Chunked dispatch (the orchestrator calls run_batch per chunk of sims)
replicates the reference's ~50-reports-per-run progress cadence and its
between-chunk cancellation points without touching the hot loop.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import corrections, datagen, olsfit, rng
from .spec import SimSpec, factor_dependent_cols


def _split_seed(base_seed: int) -> Tuple[int, int]:
    base_seed = int(base_seed) & 0xFFFFFFFFFFFFFFFF
    return base_seed & 0xFFFFFFFF, base_seed >> 32


def _exclusion_colmask(spec: SimSpec, excluded):
    """(G, P_fit) 0/1 mask over FIT columns + (G,) dropped-column counts from
    the per-grid factor exclusion flags."""
    fit_cols = spec.effective_fit_cols
    mask = jnp.ones((spec.n_grid, len(fit_cols)), jnp.float64)
    for f in range(len(spec.factor_levels)):
        dep = [
            i for i, c in enumerate(fit_cols) if c in factor_dependent_cols(spec, f)
        ]
        if not dep:
            continue
        keep = 1.0 - excluded[:, f].astype(jnp.float64)  # (G,)
        mask = mask.at[:, jnp.asarray(dep)].mul(keep[:, None])
    dropped = jnp.round(len(fit_cols) - jnp.sum(mask, axis=1)).astype(jnp.int32)
    return mask, dropped


def _crit_rows(arr: Dict, key2d: str, key3d: str, dropped):
    """Pick the reduced-df crit row per grid point: by_dropped tables are
    (G, D+1, ...) and indexed by how many fit columns were excluded; without
    them the flat (G, ...) table applies (z-based crits are df-free)."""
    if key3d in arr:
        table = arr[key3d]  # (G, D+1, ...)
        d = jnp.clip(dropped, 0, table.shape[1] - 1)
        return jnp.take_along_axis(
            table,
            d.reshape((-1,) + (1,) * (table.ndim - 1)),
            axis=1,
        ).squeeze(1)
    return arr[key2d]


def run_one_sim(
    spec: SimSpec, arr: Dict, seed_lo, seed_hi, sim_id,
    separation_fallback: bool = True,
) -> Dict:
    """All per-sim significance flags across the grid. Pure function.

    ``separation_fallback=False`` compiles the GLM arm WITHOUT the second
    (fallback) IRLS — the cheap program the separation gate dispatches
    first (see ``run_batch``).
    """
    # Per-sim key: one Philox call on the key-derivation stream.
    k0, k1, _, _ = rng.philox4x32(
        jnp.asarray(sim_id, jnp.uint32),
        jnp.uint32(0),
        jnp.uint32(rng.CLASS_SIMKEY),
        jnp.uint32(0),
        jnp.asarray(seed_lo, jnp.uint32),
        jnp.asarray(seed_hi, jnp.uint32),
    )
    key = (k0, k1)

    X, y, ids = datagen.generate(spec, arr, key)

    # Sparse-factor exclusion: flags + fit-column mask, BEFORE the fits so
    # the estimator arms can run the reduced (masked) fit directly and the
    # thresholds can use reduced-df crit rows (reference batch.rs:2418-2570).
    excluded = None
    colmask = None
    dropped = jnp.zeros(spec.n_grid, jnp.int32)
    if spec.factor_levels:
        min_counts = datagen.factor_min_counts(spec, X)  # (G, n_factors)
        excluded = min_counts < spec.factor_min_level_count
        colmask, dropped = _exclusion_colmask(spec, excluded)

    if spec.estimator == "ols":
        stats = olsfit.ols_grid_stats(spec, arr, X, y, colmask=colmask)
    elif spec.estimator == "glm":
        if spec.cluster is not None:
            # clustered binary/count: GLMM via penalized IRLS + Laplace
            from . import glmmfit

            stats = glmmfit.glmm_grid_stats(spec, arr, X, y, ids)
        else:
            from . import glmfit

            stats = glmfit.glm_grid_stats(
                spec, arr, X, y, ids, colmask=colmask,
                fallback=separation_fallback,
            )
    elif spec.estimator == "mle":
        if spec.outcome != "continuous":
            from . import glmmfit

            stats = glmmfit.glmm_grid_stats(spec, arr, X, y, ids)
        else:
            from . import mixedfit

            stats = mixedfit.mixed_grid_stats(spec, arr, X, y, ids)
    else:
        raise ValueError(f"unknown estimator {spec.estimator!r}")

    t2 = stats["t2"]  # (G, k)
    sig_unc = t2 > _crit_rows(arr, "t2_uncorrected", "t2_unc_by_dropped", dropped)
    sig_corr = corrections.apply_correction(
        t2,
        _crit_rows(arr, "t2_corrected_ranks", "t2_corr_by_dropped", dropped),
        spec.correction,
    )
    converged = stats["converged"]
    # Failed fits count as non-significant everywhere.
    sig_unc = sig_unc & converged[:, None]
    sig_corr = sig_corr & converged[:, None]

    out = {
        "sig_unc": sig_unc,
        "sig_corr": sig_corr,
        "converged": converged,
        "t2": t2,
    }

    if spec.report_overall:
        overall_crit = _crit_rows(
            arr, "overall_crit", "overall_crit_by_dropped", dropped
        )
        out["overall"] = (stats["overall"] > overall_crit) & converged

    k = spec.n_targets
    if k > 0:
        nsig_unc = jnp.sum(sig_unc, axis=1)
        nsig_corr = jnp.sum(sig_corr, axis=1)
        out["joint_unc"] = nsig_unc == k
        out["joint_corr"] = nsig_corr == k
        # exactly-j detection histogram, one-hot per sim
        out["nsig_hist_unc"] = nsig_unc[:, None] == jnp.arange(k + 1)[None, :]
        out["nsig_hist_corr"] = nsig_corr[:, None] == jnp.arange(k + 1)[None, :]

    if spec.posthoc and "posthoc_t2" in stats:
        ph_crit = _crit_rows(arr, "posthoc_t2", "posthoc_t2_by_dropped", dropped)
        out["posthoc_sig"] = (stats["posthoc_t2"] > ph_crit) & converged[:, None]

    for extra in (
        "boundary_hit",
        "boundary_hi",
        "singular",
        "tau2_hat",
        "glm_baseline",
        "separation_fallback",
        "pinned_comp",
    ):
        if extra in stats:
            out[extra] = stats[extra]
    # tau2 is meaningful only for converged fits: mask before the sum so the
    # host-side mean (sum / converged count) is the mean over converged sims.
    if "tau2_hat" in out:
        out["tau2_hat"] = jnp.where(converged, out["tau2_hat"], 0.0)

    if excluded is not None:
        out["factor_excluded"] = excluded  # (G, n_factors) bool

    return out


def _reduce_counts(per_sim: Dict, weight=None) -> Dict:
    """On-device count reduction: booleans -> int32 sums over the sim axis;
    float diagnostics -> sums (host divides by n). ``weight`` is an optional
    per-sim 0/1 mask multiplying each sim's contribution."""
    counts = {}
    for name, v in per_sim.items():
        if name == "t2":
            continue
        if weight is not None:
            w = weight.reshape((-1,) + (1,) * (v.ndim - 1))
            if v.dtype == bool:
                v = v & w
            else:
                v = v * w.astype(v.dtype)
        if v.dtype == bool:
            counts[name] = jnp.sum(v.astype(jnp.int32), axis=0)
        else:
            counts[name] = jnp.sum(
                jnp.where(jnp.isfinite(v), v, 0.0).astype(jnp.float64), axis=0
            )
    return counts


@lru_cache(maxsize=64)
def _batch_fn(spec: SimSpec, capture: bool):
    """Build + cache the jitted batched program for one static spec."""

    def batched(arr: Dict, seed_lo, seed_hi, sim_ids):
        per_sim = jax.vmap(
            lambda sid: run_one_sim(spec, arr, seed_lo, seed_hi, sid)
        )(sim_ids)
        if capture:
            return per_sim
        return _reduce_counts(per_sim)

    return jax.jit(batched)


@lru_cache(maxsize=64)
def _primary_fn(spec: SimSpec):
    """Fallback-free program for the separation gate: counts over fully-clean
    sims (every grid cell converged on the primary fit) plus the per-sim
    failure bits the host uses to route the rare failed sims to the rescue
    program. Clean sims' outputs are identical between the fallback-free and
    fused programs (the fallback pass only changes outputs through fb_used
    selects), so primary + rescue totals are bit-identical to one fused run."""

    def batched(arr: Dict, seed_lo, seed_hi, sim_ids):
        per_sim = jax.vmap(
            lambda sid: run_one_sim(
                spec, arr, seed_lo, seed_hi, sid, separation_fallback=False
            )
        )(sim_ids)
        clean = jnp.all(per_sim["converged"], axis=1)  # (n_sims,)
        return _reduce_counts(per_sim, weight=clean), ~clean

    return jax.jit(batched)


@lru_cache(maxsize=64)
def _rescue_fn(spec: SimSpec):
    """Valid-masked fused program: full (primary + fallback) fits for the
    failed sims, padded to the static rescue block size."""

    def batched(arr: Dict, seed_lo, seed_hi, sim_ids, valid):
        per_sim = jax.vmap(
            lambda sid: run_one_sim(spec, arr, seed_lo, seed_hi, sid)
        )(sim_ids)
        return _reduce_counts(per_sim, weight=valid)

    return jax.jit(batched)


# Static pad size for rescue dispatches (one compile); >RESCUE_BLOCK failures
# in a chunk simply dispatch multiple blocks. Separation gating applies to
# the unclustered GLM arm with factors — the only arm with a fallback pass.
RESCUE_BLOCK = 256
SEPARATION_GATE = True  # module switch so tests can pin gated == fused


def _gate_applies(spec: SimSpec) -> bool:
    return (
        SEPARATION_GATE
        and spec.estimator == "glm"
        and spec.cluster is None
        and bool(spec.factor_levels)
    )


def run_batch(
    spec: SimSpec,
    arrays: Dict,
    n_sims: int,
    base_seed: int,
    *,
    sim_id_offset: int = 0,
    chunk_size: Optional[int] = None,
    progress=None,
    cancel=None,
) -> Dict[str, np.ndarray]:
    """Run ``n_sims`` simulations and return host-side count tensors.

    ``progress(done, total) -> None`` is invoked between chunks; ``cancel()``
    returning True stops between chunks (partial counts are returned with
    ``counts['n_done']`` recording how many sims completed — the merge
    algebra handles partial batches).
    """
    spec.validate_layout()
    gated = _gate_applies(spec)
    fn = _primary_fn(spec) if gated else _batch_fn(spec, False)
    seed_lo, seed_hi = _split_seed(base_seed)
    slo, shi = jnp.uint32(seed_lo), jnp.uint32(seed_hi)

    chunk = int(chunk_size) if chunk_size else max(min(n_sims, 4096), 1)
    # Joint-Z (extra-grouping) dispatch-width caps. History: the DENSE
    # joint-Z programs fault the TPU worker at 4096-lane dispatches
    # (observed round 3 on v5e — a runtime resource limit, not a numeric
    # issue), hence the 1024 cap. The round-5 structured-capacitance path
    # (all-intercept plans) is far lighter: measured on-chip, the LMM q1
    # program RUNS at 4096 lanes and is ~12% faster per fit there (one
    # dispatch instead of four also removes the tunnel-latency share that
    # made lmm_extras the noisiest frozen arm). The GLMM q1 program also
    # runs at 4096 but measured ~10% SLOWER per fit than at 1024 (long
    # PIRLS chains lose occupancy at width), so it keeps 1024. Chunking is
    # results-invisible (test_chunking_is_invisible).
    if spec.cluster is not None and spec.cluster.extra_groupings:
        from .mixedfit import _grouping_plan, _plan_all_q1

        wide_ok = spec.estimator == "mle" and _plan_all_q1(
            _grouping_plan(spec)
        )
        capped = min(chunk, 4096 if wide_ok else 1024)
        if capped < chunk and chunk_size:
            # An explicitly requested chunk_size is being overridden — say
            # so once, so bench labels/caller expectations aren't misread
            # (the warmup/timed runs still share the same effective chunk).
            import warnings as _w

            _w.warn(
                f"extra-grouping spec: dispatch chunk capped at {capped} "
                f"lanes (requested {chunk}); timings/progress reflect the "
                "capped width",
                UserWarning,
                stacklevel=2,
            )
        chunk = capped
    totals: Dict[str, np.ndarray] = {}

    def _fold(out):
        for name, v in jax.device_get(out).items():
            totals[name] = totals.get(name, 0) + np.asarray(v)

    done = 0
    while done < n_sims:
        m = min(chunk, n_sims - done)
        sim_ids = jnp.arange(
            sim_id_offset + done, sim_id_offset + done + m, dtype=jnp.uint32
        )
        if gated:
            # Separation gate: cheap fallback-free pass over the chunk, then
            # route only the failed sims through the fused rescue program
            # (reference pays the fallback only on the cold branch,
            # batch.rs:1990-2020). Totals are bit-identical to one fused run.
            out, failed = fn(arrays, slo, shi, sim_ids)
            _fold(out)
            f_ids = np.asarray(sim_ids)[np.asarray(failed)]
            if f_ids.size:
                rescue = _rescue_fn(spec)
                for b0 in range(0, f_ids.size, RESCUE_BLOCK):
                    blk = f_ids[b0 : b0 + RESCUE_BLOCK]
                    pad = np.zeros(RESCUE_BLOCK, np.uint32)
                    pad[: blk.size] = blk
                    valid = np.zeros(RESCUE_BLOCK, bool)
                    valid[: blk.size] = True
                    _fold(
                        rescue(
                            arrays, slo, shi, jnp.asarray(pad),
                            jnp.asarray(valid),
                        )
                    )
            # clean runs never execute a fallback: surface the zero count
            totals.setdefault(
                "separation_fallback", np.zeros(spec.n_grid, np.int32)
            )
        else:
            _fold(fn(arrays, slo, shi, sim_ids))
        done += m
        if progress is not None:
            progress(done, n_sims)
        if cancel is not None and cancel():
            break
    totals["n_done"] = np.asarray(done)
    return totals


def run_batch_capture(
    spec: SimSpec,
    arrays: Dict,
    n_sims: int,
    base_seed: int,
    *,
    sim_id_offset: int = 0,
) -> Dict[str, np.ndarray]:
    """Per-sim statistics (t^2, flags) for debug/introspection — the
    equivalent of the reference's run_batch_st_capture (batch.rs:180)."""
    spec.validate_layout()
    fn = _batch_fn(spec, True)
    seed_lo, seed_hi = _split_seed(base_seed)
    sim_ids = jnp.arange(sim_id_offset, sim_id_offset + n_sims, dtype=jnp.uint32)
    out = fn(arrays, jnp.uint32(seed_lo), jnp.uint32(seed_hi), sim_ids)
    return {k: np.asarray(v) for k, v in jax.device_get(out).items()}
