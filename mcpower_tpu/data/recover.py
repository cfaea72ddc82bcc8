"""get_effects_from_data: fit the canonical design to the pilot data.

The recovery path of the reference (engine-spec-builder upload.rs
``build_recovery_design`` + engine-core introspect.rs ``fit_provided_data``):
build the model's design matrix from the uploaded columns exactly as the
generator would (standardized continuous, 0/1 binary, reference-coded
dummies, interaction products), fit with the family's estimator, and return
semantically-named standardized effects.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from scipy import optimize, stats


def _design_from_upload(registry, upload, y_name: str):
    cols = []
    names = []
    for t in registry.parsed.terms:
        if t["kind"] != "main":
            continue
        name = t["name"]
        if name not in upload.columns:
            raise ValueError(
                f"predictor {name!r} is not in the uploaded data; "
                "get_effects_from_data needs every model predictor"
            )
        col = upload.columns[name]
        if col.kind == "factor":
            for lvl in range(1, col.n_levels):
                cols.append((col.values == lvl).astype(np.float64))
                names.append(f"{name}[{lvl + 1}]")
        else:
            cols.append(col.values)
            names.append(name)
    name_to_idx = {n: i for i, n in enumerate(names)}
    for t in registry.parsed.terms:
        if t["kind"] != "interaction":
            continue
        for label, parts in registry.interaction_effect_names(t["vars"]):
            prod = np.ones(upload.n_rows)
            for v, lvl in parts:
                key = v if lvl == 0 else f"{v}[{lvl}]"
                prod = prod * cols[name_to_idx[key]]
            cols.append(prod)
            names.append(label)
            name_to_idx[label] = len(names) - 1
    X = np.column_stack([np.ones(upload.n_rows)] + cols)
    y = np.asarray(upload.columns[y_name].values, dtype=np.float64)
    # the outcome column was standardized if detected continuous — refit on
    # the standardized scale (that IS the standardized-effect convention)
    return X, y, names


def recover_effects(registry, upload, y_name: str, family: str) -> Tuple[Dict[str, float], str]:
    X, y, names = _design_from_upload(registry, upload, y_name)
    if family in ("logit", "probit"):
        y = (y > 0.5).astype(np.float64) if set(np.unique(y)) != {0.0, 1.0} else y

        def nll(b):
            eta = X @ b
            if family == "probit":
                p = np.clip(stats.norm.cdf(eta), 1e-12, 1 - 1e-12)
                return -(y * np.log(p) + (1 - y) * np.log(1 - p)).sum()
            return (np.logaddexp(0, eta) - y * eta).sum()

        res = optimize.minimize(nll, np.zeros(X.shape[1]), method="BFGS",
                                options={"gtol": 1e-9, "maxiter": 500})
        beta = res.x
        diag = f"{family} ML fit, n={len(y)}"
    elif family == "poisson":
        def nll(b):
            eta = np.clip(X @ b, -30, 30)
            return (np.exp(eta) - y * eta).sum()

        res = optimize.minimize(nll, np.zeros(X.shape[1]), method="BFGS",
                                options={"gtol": 1e-9, "maxiter": 500})
        beta = res.x
        diag = f"poisson ML fit, n={len(y)}"
    else:
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        diag = f"OLS fit, n={len(y)}"
    return {n: float(b) for n, b in zip(names, beta[1:])}, diag
