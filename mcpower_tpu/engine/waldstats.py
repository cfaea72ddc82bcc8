"""Shared Wald-statistic assembly: beta/cov -> t^2, omnibus, posthoc tensors.

Every estimator arm ends the same way: a coefficient vector and covariance
per (grid) cell become marginal t^2 values, contrast t^2 values, a joint
Wald chi^2 over the targets, and post-hoc pairwise contrast t^2 values
(reference: the t^2-space writeback shared by the Rust arms,
crates/engine-core/src/batch.rs:1118-1143 and posthoc.rs:40). One helper —
rather than one copy per arm — so the contrast algebra cannot drift.

All inputs are batched over the leading grid axis: ``beta (G, P)``,
``cov (G, P, P)`` where cov is the Wald covariance of beta (for OLS pass
``sigma2[:, None, None] * inv``).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from . import smallchol
from .spec import SimSpec


def t2_targets(spec: SimSpec, beta, cov) -> jnp.ndarray:
    """Marginal + contrast t^2 per target, shape (G, n_targets)."""
    cov_diag = jnp.diagonal(cov, axis1=-2, axis2=-1)
    t2_cols = []
    for tcol in spec.target_cols:
        t2_cols.append(beta[:, tcol] ** 2 / cov_diag[:, tcol])
    for a, b in spec.contrasts:
        d = beta[:, a] - beta[:, b]
        var_c = cov[:, a, a] + cov[:, b, b] - 2.0 * cov[:, a, b]
        t2_cols.append(d * d / var_c)
    if not t2_cols:
        return jnp.zeros((spec.n_grid, 0), jnp.float64)
    return jnp.stack(t2_cols, axis=1)


def overall_wald_chi2(spec: SimSpec, beta, cov) -> jnp.ndarray:
    """Joint Wald chi^2 over the marginal targets: b_T' Cov_T^-1 b_T
    (the MLE omnibus, batch.rs:1453-1473). Shape (G,)."""
    if not spec.target_cols:
        return jnp.zeros(spec.n_grid, jnp.float64)
    tc = jnp.asarray(spec.target_cols)
    bt = beta[:, tc]
    ct = cov[:, tc][:, :, tc]
    sol = smallchol.cho_solve(smallchol.chol(ct), bt)
    return jnp.einsum("gp,gp->g", bt, sol)


def posthoc_t2(spec: SimSpec, beta, cov) -> jnp.ndarray:
    """Pairwise-contrast t^2 per posthoc pair, shape (G, n_pairs).

    Pair columns are design-column ids; -1 denotes the reference level
    (absorbed into the intercept — contributes nothing to the contrast).
    """
    fit_cols = spec.effective_fit_cols
    col_to_fit = {c: i for i, c in enumerate(fit_cols)}
    ph = []
    for block in spec.posthoc:
        for ca, cb in block.pairs:
            ia = col_to_fit.get(ca, -1) if ca >= 0 else -1
            ib = col_to_fit.get(cb, -1) if cb >= 0 else -1
            d = jnp.zeros(spec.n_grid, jnp.float64)
            var_q = jnp.zeros(spec.n_grid, jnp.float64)
            if ia >= 0:
                d = d + beta[:, ia]
                var_q = var_q + cov[:, ia, ia]
            if ib >= 0:
                d = d - beta[:, ib]
                var_q = var_q + cov[:, ib, ib]
            if ia >= 0 and ib >= 0:
                var_q = var_q - 2.0 * cov[:, ia, ib]
            ph.append(d * d / var_q)
    if not ph:
        return jnp.zeros((spec.n_grid, 0), jnp.float64)
    return jnp.stack(ph, axis=1)


def add_posthoc(out: Dict, spec: SimSpec, beta, cov) -> Dict:
    """Attach 'posthoc_t2' to an arm's output dict when the spec asks."""
    if spec.posthoc:
        out["posthoc_t2"] = posthoc_t2(spec, beta, cov)
    return out
