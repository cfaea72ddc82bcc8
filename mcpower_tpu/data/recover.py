"""get_effects_from_data: fit the canonical design to the pilot data.

The recovery path of the reference (engine-spec-builder upload.rs
``build_recovery_design`` + engine-core introspect.rs ``fit_provided_data``):
build the model's design matrix from the uploaded columns exactly as the
generator would (standardized continuous, 0/1 binary, reference-coded
dummies, interaction products), fit it with the engine's OWN estimator
kernels — the "mirror contract": recovered effects are exactly what the
engine would estimate on the same bytes — and return semantically-named
standardized effects.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..engine import providedfit


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
                names.append(
                    f"{name}[{registry.factor_level_label(name, lvl + 1)}]"
                )
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
                key = (
                    v if lvl == 0
                    else f"{v}[{registry.factor_level_label(v, lvl)}]"
                )
                prod = prod * cols[name_to_idx[key]]
            cols.append(prod)
            names.append(label)
            name_to_idx[label] = len(names) - 1
    X = np.column_stack([np.ones(upload.n_rows)] + cols)
    y = np.asarray(upload.columns[y_name].values, dtype=np.float64)
    # the outcome column was standardized if detected continuous — refit on
    # the standardized scale (that IS the standardized-effect convention)
    return X, y, names


def recover_effects(
    registry, upload, y_name: str, family: str, cluster_ids=None
):
    """Fit the canonical design to the pilot bytes.

    Returns ``(effects, diag)`` for unclustered models, and
    ``(effects, diag, tau_sq, sigma_sq)`` when ``cluster_ids`` is given —
    the clustered path recovers the random-intercept variance so the
    caller can report an estimated ICC (reference model.py clustered
    get_effects_from_data)."""
    X, y, names = _design_from_upload(registry, upload, y_name)
    if family in ("logit", "probit") and set(np.unique(y)) != {0.0, 1.0}:
        y = (y > 0.5).astype(np.float64)
    if cluster_ids is not None:
        beta, tau_sq, sigma_sq, converged, diag = (
            providedfit.fit_provided_clustered(X, y, cluster_ids, family)
        )
        if not converged:
            diag += " (WARNING: fit did not converge)"
        eff = {n: float(b) for n, b in zip(names, beta[1:])}
        return eff, diag, float(tau_sq), float(sigma_sq), float(beta[0])
    beta, converged, diag = providedfit.fit_provided(X, y, family)
    if not converged:
        diag += " (WARNING: fit did not converge)"
    eff = {n: float(b) for n, b in zip(names, beta[1:])}
    return eff, diag, float(beta[0])
