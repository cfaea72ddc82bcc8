"""Mirror-contract fit of user-provided bytes with the sim-loop kernels.

The reference's ``get_effects_from_data`` fits uploaded pilot data with the
SAME kernel arms as ``run_one_sim`` ("mirror contract",
crates/engine-core/src/introspect.rs:174 ``fit_provided_data``) so that
recovered effects are exactly what the engine would estimate on the same
bytes. Here the OLS arm is the smallchol suff-stats Cholesky solve olsfit
runs, and the GLM arms are glmfit._irls — the exact two-phase IRLS the batch
driver jits — cold-started from the data intercept like a non-truth-start sim
fit. No scipy optimizer sits between the upload path and the engine.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from . import glmfit, smallchol

_FAMILY_ARMS = {
    "logit": ("binary", "canonical"),
    "probit": ("binary", "probit"),
    "poisson": ("count", "canonical"),
}


def fit_provided(X, y, family: str) -> Tuple[np.ndarray, bool, str]:
    """Fit one provided (X, y) with the engine's own estimator arm.

    X (n, P) includes the intercept column; y (n,). Returns
    (beta (P,) float64, converged, diagnostic string).
    """
    Xf = jnp.asarray(np.asarray(X, dtype=np.float64))
    yf = jnp.asarray(np.asarray(y, dtype=np.float64))
    n = Xf.shape[0]

    if family in _FAMILY_ARMS:
        outcome, link = _FAMILY_ARMS[family]
        mask = jnp.ones(n, jnp.float64)
        beta0 = (
            jnp.zeros(Xf.shape[1], jnp.float64)
            .at[0]
            .set(glmfit.data_intercept(outcome, link, jnp.mean(yf)))
        )
        beta, _cov, converged, _dev = glmfit._irls(
            outcome, link, Xf, yf, mask, beta0
        )
        label = "logistic" if outcome == "binary" else "poisson"
        if link == "probit":
            label = "probit"
        diag = f"{label} IRLS fit (engine kernel), n={n}"
    else:
        # OLS: the suff-stats Cholesky solve of the olsfit arm.
        xtx = Xf.T @ Xf
        xty = smallchol.colsum(Xf, yf)
        chol = smallchol.chol(xtx)
        beta = smallchol.cho_solve(chol, xty)
        d = jnp.diagonal(chol, axis1=-2, axis2=-1)
        converged = jnp.all(jnp.isfinite(d)) & jnp.all(d > 0.0) & jnp.all(
            jnp.isfinite(beta)
        )
        diag = f"OLS fit (engine kernel), n={n}"

    return np.asarray(beta, dtype=np.float64), bool(converged), diag
