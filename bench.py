"""Headline benchmark: 10k-replicate random-intercept LMM power run.

North star (BASELINE.md / BASELINE.json): the reference's hardest arm — a
10,000-replicate mixed-model power run — in under 1 second on one TPU chip.
``vs_baseline`` is the speedup against that 1 s target (>1 = beating it).

Prints ONE JSON line. Run on the real TPU (no env overrides); first compile
is excluded by a warmup batch.
"""

import json
import time

import numpy as np


def main():
    import jax

    from mcpower_tpu.engine import batch, lower
    from mcpower_tpu.engine.spec import ClusterStatic

    n_sims = 10_000
    spec, arrays = lower.lower(
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
    arrays = jax.device_put(arrays)

    # Warmup: compile + first dispatch at the SAME chunk shape (a different
    # chunk size would compile a different program), excluded from timing.
    batch.run_batch(spec, arrays, n_sims=n_sims, base_seed=1, chunk_size=n_sims)

    t0 = time.perf_counter()
    counts = batch.run_batch(
        spec, arrays, n_sims=n_sims, base_seed=2137, chunk_size=n_sims
    )
    elapsed = time.perf_counter() - t0

    # sanity: the run actually fit 10k mixed models
    assert int(counts["n_done"]) == n_sims
    assert counts["converged"][0] > 0.9 * n_sims

    print(
        json.dumps(
            {
                "metric": "lmm_10k_replicate_power_run",
                "value": round(elapsed, 4),
                "unit": "s",
                "vs_baseline": round(1.0 / elapsed, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
