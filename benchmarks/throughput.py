"""Frozen throughput grid: replicate fits/sec per engine arm, vs a baseline.

The analogue of the reference's regression bench (crates/engine-core/src/bin/
throughput.rs: 21 frozen cases, fits/sec, median of 3, flag >10% drops): a
fixed case grid covering every estimator arm x scenario off/on, timed after a
warmup dispatch at the same shape, compared against a saved baseline JSON.

Usage:
    python benchmarks/throughput.py                 # run + compare
    python benchmarks/throughput.py --save-baseline # freeze current numbers
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "throughput_baseline.json")
N_SIMS = 4000
REPEATS = 3


def _cases():
    from mcpower_tpu.engine.spec import (
        ClusterStatic,
        ScenarioStatic,
        SlopeStatic,
    )

    scen_on = ScenarioStatic(
        label="realistic",
        heterogeneity=0.2,
        heteroskedasticity_ratio=2.0,
        correlation_noise_sd=0.15,
        distribution_change_prob=0.5,
        new_distributions=("right_skewed", "left_skewed", "uniform"),
        residual_change_prob=0.5,
        residual_dists=("high_kurtosis", "right_skewed"),
        residual_df=8.0,
        truth_start=False,
    )
    cl = ClusterStatic(sizing_mode="fixed_clusters", sizing_value=20, tau_squared=0.25)
    corr2 = np.array([[1.0, 0.3], [0.3, 1.0]])
    base = dict(
        grid=[200],
        var_types=["normal", "normal"],
        corr=corr2,
        effects=np.array([0.0, 0.3, 0.2]),
        target_cols=[1, 2],
    )
    cases = []
    for scen, tag in [(None, "base"), (scen_on, "scenario")]:
        kw = dict(base)
        if scen is not None:
            kw["scenario"] = scen
        cases.append((f"ols_{tag}", dict(kw, estimator="ols")))
        cases.append(
            (
                f"logit_{tag}",
                dict(kw, estimator="glm", outcome="binary",
                     effects=np.array([-0.3, 0.3, 0.2])),
            )
        )
        cases.append(
            (
                f"poisson_{tag}",
                dict(kw, estimator="glm", outcome="count",
                     effects=np.array([0.5, 0.2, 0.1])),
            )
        )
        cases.append((f"lmm_{tag}", dict(kw, estimator="mle", cluster=cl)))
        cases.append(
            (
                f"glmm_{tag}",
                dict(kw, estimator="glm", outcome="binary", cluster=cl,
                     effects=np.array([-0.3, 0.3, 0.2])),
            )
        )
    # grid-search case: one batch covering 8 Ns
    cases.append(
        ("ols_grid8", dict(base, grid=[60, 80, 100, 120, 140, 160, 180, 200]))
    )
    # random-slope arms (q=2 theta search) — on the frozen grid so a
    # slope-path regression is flagged like any other arm (VERDICT r2 weak #4)
    cl_slopes = ClusterStatic(
        sizing_mode="fixed_clusters",
        sizing_value=20,
        tau_squared=0.25,
        slopes=(SlopeStatic(design_col=1, variance=0.2, intercept_corr=0.3),),
    )
    cases.append(("lmm_slopes", dict(base, estimator="mle", cluster=cl_slopes)))
    cases.append(
        (
            "glmm_slopes",
            dict(base, estimator="glm", outcome="binary", cluster=cl_slopes,
                 effects=np.array([-0.3, 0.3, 0.2])),
        )
    )
    # crossed-extra-grouping arms (joint-Z capacitance paths)
    from mcpower_tpu.engine.spec import ExtraGroupingStatic

    cl_extras = ClusterStatic(
        sizing_mode="fixed_clusters",
        sizing_value=20,
        tau_squared=0.25,
        extra_groupings=(
            ExtraGroupingStatic(
                relation="crossed", n_levels=10, tau_squared=0.15
            ),
        ),
    )
    cases.append(("lmm_extras", dict(base, estimator="mle", cluster=cl_extras)))
    cases.append(
        (
            "glmm_extras",
            dict(base, estimator="glm", outcome="binary", cluster=cl_extras,
                 effects=np.array([-0.3, 0.3, 0.2])),
        )
    )
    # AGQ arm (nagq=7, the reference's accuracy opt-in — estimator.rs nagq):
    # the quadrature path has its own hot loop (per-node weighted deviance
    # sweep), previously unmonitored by the frozen grid.
    cases.append(
        (
            "glmm_agq7",
            dict(base, estimator="glm", outcome="binary", cluster=cl,
                 effects=np.array([-0.3, 0.3, 0.2]), nagq=7),
        )
    )
    return cases


def run():
    import jax

    # Persistent jit cache: re-timing unchanged arms skips their compiles.
    jax.config.update("jax_compilation_cache_dir", "/tmp/mcpower_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

    from mcpower_tpu.engine import batch, lower

    results = {}
    for name, kw in _cases():
        # Per-arm isolation: one arm failing to compile (a tunnel outage,
        # a compile-helper OOM — both observed round 3) must not lose the
        # other arms' numbers; the failure is reported and the exit code
        # still signals it.
        try:
            spec, arrays = lower.lower(**kw)
            arrays = jax.device_put(arrays)
            batch.run_batch(spec, arrays, N_SIMS, 1, chunk_size=N_SIMS)  # warmup
            times = []
            for r in range(REPEATS):
                t0 = time.perf_counter()
                batch.run_batch(spec, arrays, N_SIMS, 2137 + r, chunk_size=N_SIMS)
                times.append(time.perf_counter() - t0)
            med = statistics.median(times)
            fits = N_SIMS * len(spec.grid)
            results[name] = round(fits / med, 1)
            print(f"{name:16s} {results[name]:>12,.0f} fits/sec  ({med*1e3:.1f} ms)")
        except Exception as e:  # noqa: BLE001 — keep the grid running
            results[name] = None
            msg = str(e).splitlines()[0][:120]
            print(f"{name:16s}       FAILED  ({type(e).__name__}: {msg})")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save-baseline", action="store_true")
    args = ap.parse_args()
    results = run()
    failed = [n for n, v in results.items() if v is None]
    ok = {n: v for n, v in results.items() if v is not None}
    if args.save_baseline:
        if failed:
            sys.exit(f"refusing to freeze a baseline with failed arms: {failed}")
        with open(BASELINE_PATH, "w") as f:
            json.dump(ok, f, indent=1, sort_keys=True)
        print(f"baseline saved to {BASELINE_PATH}")
        return
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            baseline = json.load(f)
        worst = None
        for name, fps in ok.items():
            if name in baseline and baseline[name] > 0:
                ratio = fps / baseline[name]
                flag = "  <-- REGRESSION" if ratio < 0.9 else ""
                print(f"{name:16s} vs baseline: {ratio:6.2f}x{flag}")
                worst = min(worst or ratio, ratio)
        if failed or (worst is not None and worst < 0.9):
            sys.exit(1)
    else:
        print("(no baseline; run with --save-baseline to freeze)")
        if failed:
            sys.exit(1)


if __name__ == "__main__":
    main()
