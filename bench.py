"""Headline benchmark: 10k-replicate random-intercept LMM power run.

North star (BASELINE.md / BASELINE.json): the reference's hardest arm — a
10,000-replicate mixed-model power run — in under 1 second on one TPU chip.
``vs_baseline`` is the speedup against that 1 s target (>1 = beating it).

Prints ONE JSON line: the headline LMM metric, plus ``extra`` timings for
the other driver-visible acceptance arms (BASELINE.json: OLS t-test and GLM
runs at 10k replicates) so every arm's wall-clock is recorded per round.
Run on the real TPU (no env overrides); first compile is excluded by a
warmup batch at the same chunk shape.
"""

import json
import time

import numpy as np


def _timed(spec, arrays, n_sims, min_converged=0.9):
    from mcpower_tpu.engine import batch

    batch.run_batch(spec, arrays, n_sims=n_sims, base_seed=1, chunk_size=n_sims)
    t0 = time.perf_counter()
    counts = batch.run_batch(
        spec, arrays, n_sims=n_sims, base_seed=2137, chunk_size=n_sims
    )
    elapsed = time.perf_counter() - t0
    assert int(counts["n_done"]) == n_sims
    assert counts["converged"][0] > min_converged * n_sims
    return elapsed


def _wait_for_backend(attempts=12, pause_s=90, probe_timeout_s=300):
    """Ride out tunneled-TPU outages before touching jax in THIS process.

    During an outage ``jax.devices()`` does not raise — it BLOCKS
    indefinitely inside backend init (observed round 3), so an in-process
    try/except retry loop never gets its second attempt. Probe in a
    killable subprocess instead, and only let the parent initialize its
    backend once a probe has succeeded. The probe must include a COMPILE:
    round 4 observed half-up windows where ``jax.devices()`` returns
    quickly but every compile RPC hangs indefinitely — a devices-only
    probe green-lights a run that then sits forever in its first warmup.
    Budget ~1.3 h of outage before giving up loudly."""
    import subprocess
    import sys

    for i in range(attempts):
        try:
            subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import jax; jax.jit(lambda x: x + 1)(1.0)",
                ],
                timeout=probe_timeout_s,
                check=True,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            if i == attempts - 1:
                raise RuntimeError(
                    f"TPU backend unavailable after {attempts} probes"
                ) from e
            print(
                f"# backend unavailable ({type(e).__name__}); "
                f"retry {i + 1}/{attempts}",
                flush=True,
            )
            time.sleep(pause_s)


def main():
    # Probe BEFORE this process initializes its own backend: a blocked
    # backend init is not recoverable in-process.
    _wait_for_backend()
    import jax

    # Persistent jit cache: warm re-runs skip unchanged-program compiles
    # (the warmup batch isolates compile time from the timings either way).
    jax.config.update("jax_compilation_cache_dir", "/tmp/mcpower_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

    from mcpower_tpu.engine import lower
    from mcpower_tpu.engine.spec import ClusterStatic, ExtraGroupingStatic

    n_sims = 10_000

    # Headline: the reference's hardest arm — random-intercept LMM.
    spec_lmm, arr_lmm = lower.lower(
        grid=[200],
        var_types=["normal", "normal"],
        corr=np.array([[1.0, 0.3], [0.3, 1.0]]),
        effects=np.array([0.0, 0.3, 0.2]),
        target_cols=[1, 2],
        estimator="mle",
        cluster=ClusterStatic(
            sizing_mode="fixed_clusters", sizing_value=20, tau_squared=0.25
        ),
    )
    lmm_s = _timed(spec_lmm, jax.device_put(arr_lmm), n_sims)

    # BASELINE acceptance arms (same replicate budget, driver-visible).
    spec_ols, arr_ols = lower.lower(
        grid=[200],
        var_types=["binary"],
        var_params=[0.5],
        effects=np.array([0.0, 0.4]),
        target_cols=[1],
    )
    ols_s = _timed(spec_ols, jax.device_put(arr_ols), n_sims)

    spec_glm, arr_glm = lower.lower(
        grid=[300],
        var_types=["normal", "normal", "normal"],
        effects=np.array([-0.4, 0.3, 0.2, 0.15]),
        target_cols=[1, 2, 3],
        outcome="binary",
        estimator="glm",
        correction="bonferroni",
    )
    glm_s = _timed(spec_glm, jax.device_put(arr_glm), n_sims)

    # Power-curve arm (BASELINE acceptance #2): 5 correlated predictors +
    # interaction over an 8-point CRN grid — one batch evaluates all N
    # from a single draw budget (prefix suff-stats).
    corr5 = np.full((5, 5), 0.2) + 0.8 * np.eye(5)
    spec_curve, arr_curve = lower.lower(
        grid=[50, 100, 150, 200, 250, 300, 400, 500],
        var_types=["normal"] * 5,
        corr=corr5,
        effects=np.array([0.0, 0.25, 0.2, 0.15, 0.1, 0.1, 0.1]),
        target_cols=[1, 2, 3, 4, 5, 6],
        interactions=[(1, 2)],
    )
    curve_s = _timed(spec_curve, jax.device_put(arr_curve), n_sims)

    # Cliff arms (VERDICT r4 weak #6): the slow theta-search paths most
    # likely to regress — crossed-extras LMM/GLMM and AGQ — reported as
    # fits/s at a bounded replicate budget so the round artifact the judge
    # reads first carries them.
    cliff_sims = 2_000
    corr2 = np.array([[1.0, 0.3], [0.3, 1.0]])
    cl_extras = ClusterStatic(
        sizing_mode="fixed_clusters",
        sizing_value=20,
        tau_squared=0.25,
        extra_groupings=(
            ExtraGroupingStatic(relation="crossed", n_levels=10, tau_squared=0.15),
        ),
    )
    cliff = {}
    for tag, kw in [
        ("lmm_extras", dict(estimator="mle", cluster=cl_extras)),
        (
            "glmm_extras",
            dict(
                estimator="glm",
                outcome="binary",
                cluster=cl_extras,
                effects=np.array([-0.3, 0.3, 0.2]),
            ),
        ),
        (
            "glmm_agq7",
            dict(
                estimator="glm",
                outcome="binary",
                cluster=ClusterStatic(
                    sizing_mode="fixed_clusters", sizing_value=20,
                    tau_squared=0.25,
                ),
                effects=np.array([-0.3, 0.3, 0.2]),
                nagq=7,
            ),
        ),
    ]:
        base_kw = dict(
            grid=[200],
            var_types=["normal", "normal"],
            corr=corr2,
            effects=np.array([0.0, 0.3, 0.2]),
            target_cols=[1, 2],
        )
        base_kw.update(kw)
        spec_c, arr_c = lower.lower(**base_kw)
        s = _timed(spec_c, jax.device_put(arr_c), cliff_sims)
        cliff[f"{tag}_fits_per_s"] = round(cliff_sims / s, 1)

    print(
        json.dumps(
            {
                "metric": "lmm_10k_replicate_power_run",
                "value": round(lmm_s, 4),
                "unit": "s",
                "vs_baseline": round(1.0 / lmm_s, 2),
                "extra": {
                    "ols_10k_s": round(ols_s, 4),
                    "glm_bonferroni_10k_s": round(glm_s, 4),
                    "curve_5pred_8grid_10k_s": round(curve_s, 4),
                    **cliff,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
