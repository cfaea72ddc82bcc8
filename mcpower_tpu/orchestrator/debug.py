"""Staged debug introspection — the deep-observability subsystem.

The counterpart of the reference's debug pipeline
(crates/engine-orchestrator/src/debug.rs + engine-core/src/introspect.rs):
a single-seed-chain re-walk that captures, stage by stage,

* D-A  input:     the lowered contract, labels, formula, scenario
* D-B  data:      sim-0 raw design/outcome/cluster ids + column moments
* D-C  dispatch:  estimator arm, statistic convention (t^2 vs z^2 space)
* D-D  stats:     per-sim test statistics (capture mode)
* D-E  crit:      every threshold the run compares against
* D-F  power:     power derived from the captured statistics — must agree
                  with the production pipeline by construction (both are the
                  same pure function of (spec, seed))
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..engine import batch, datagen
from ..engine.spec import SimSpec


STAGES = ("input", "data", "dispatch", "stats", "crit", "power")


def debug_report(
    spec: SimSpec,
    arrays: Dict,
    *,
    contract_dict: Optional[Dict] = None,
    target_labels: Sequence[str] = (),
    base_seed: int = 2137,
    n_sims: int = 200,
    data_rows: int = 12,
    stages: Sequence[str] = STAGES,
) -> Dict:
    """Build the staged report for one lowered scenario."""
    import jax.numpy as jnp

    report: Dict = {"stages": list(stages), "base_seed": int(base_seed)}

    if "input" in stages:
        report["input"] = {
            "contract": contract_dict,
            "target_labels": list(target_labels),
            "estimator": spec.estimator,
            "outcome": spec.outcome,
            "link": spec.link,
            "grid": list(spec.grid),
            "n_predictor_columns": spec.n_predictors,
            "fit_columns": list(spec.effective_fit_cols),
            "scenario": spec.scenario.label,
        }

    if "data" in stages or "dispatch" in stages:
        X, y, ids = datagen.generate_batch(
            spec,
            arrays,
            jnp.uint32(int(base_seed) & 0xFFFFFFFF),
            jnp.uint32((int(base_seed) >> 32) & 0xFFFFFFFF),
            jnp.asarray([0], dtype=jnp.uint32),
        )
        X0 = np.asarray(X)[0]
        y0 = np.asarray(y)[0]
        ids0 = np.asarray(ids)[0]
        if "data" in stages:
            report["data"] = {
                "sim0_design_head": X0[:data_rows].tolist(),
                "sim0_outcome_head": y0[:data_rows].tolist(),
                "sim0_cluster_ids_head": ids0[:data_rows].tolist(),
                "column_means": X0.mean(axis=0).tolist(),
                "column_sds": X0.std(axis=0).tolist(),
                "outcome_mean": float(y0.mean()),
                "outcome_sd": float(y0.std()),
                "effective_correlations": np.corrcoef(
                    X0[:, 1 : 1 + spec.n_cont].T
                ).tolist()
                if spec.n_cont > 1
                else None,
            }

    if "dispatch" in stages:
        statistic = "t^2 (Student-t, df = N - P)" if spec.estimator == "ols" else "z^2 (Wald)"
        report["dispatch"] = {
            "estimator_arm": spec.estimator
            + (
                " (GLMM Laplace)"
                if spec.estimator in ("glm", "mle")
                and spec.cluster is not None
                and spec.outcome != "continuous"
                else ""
            ),
            "statistic_space": statistic,
            "correction": spec.correction,
            "natural_convention": "all comparisons in squared-statistic space "
            "against precomputed criticals",
        }

    if "crit" in stages:
        report["crit"] = {
            "t2_uncorrected": np.asarray(arrays["t2_uncorrected"]).tolist(),
            "t2_corrected_ranks": np.asarray(arrays["t2_corrected_ranks"]).tolist(),
            "overall_crit": np.asarray(arrays["overall_crit"]).tolist(),
        }

    if "stats" in stages or "power" in stages:
        cap = batch.run_batch_capture(spec, arrays, n_sims, base_seed)
        if "stats" in stages:
            report["stats"] = {
                "n_sims": int(n_sims),
                "t2_head": np.asarray(cap["t2"])[: min(10, n_sims)].tolist(),
                "t2_mean": np.nanmean(np.asarray(cap["t2"]), axis=0).tolist(),
                "converged_rate": np.asarray(cap["converged"])
                .mean(axis=0)
                .tolist(),
            }
        if "power" in stages:
            sig = np.asarray(cap["sig_unc"])
            report["power"] = {
                "derived_power_uncorrected": sig.mean(axis=0).tolist(),
                "derived_power_corrected": np.asarray(cap["sig_corr"])
                .mean(axis=0)
                .tolist(),
                "note": "derived from the captured per-sim statistics; equals "
                "the production counts for the same (spec, seed, sim range) "
                "by purity",
            }

    return report
