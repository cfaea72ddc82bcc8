"""Batched GLM IRLS: logit / probit / Poisson-log, Wald z tests, LRT omnibus.

The reference fits GLMs per sim with a scalar IRLS loop, truth-started, with
a beta-cap divergence guard and an LRT omnibus (glmm crate ``glm_irls_fit``;
dispatch at crates/engine-core/src/batch.rs:1936-2020). The TPU-native
formulation runs a FIXED-iteration IRLS entirely in batched tensor ops:

* rows beyond the active grid point are masked by zero weights, so one
  (max_n, P) design serves every grid N with static shapes;
* all (sim, grid) cells iterate together; converged cells freeze via
  ``jnp.where`` instead of exiting the loop (branch-free — the XLA idiom for
  the reference's per-cell early return);
* the working-response solve is a batched P x P Cholesky, MXU-shaped.

Statistics in t^2 space: Wald z_j^2 from the final (X'WX)^{-1}; the omnibus
is the likelihood-ratio deviance drop vs the intercept-only fit, compared to
a chi-square crit (the reference's logit LRT, batch.rs:1118-1143).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from . import rng, smallchol
from .spec import SimSpec

N_IRLS_ITERS = 30
BETA_CAP = 30.0
CONV_TOL = 1e-8
MU_EPS = 1e-10


def _link_funcs(outcome: str, link: str):
    if outcome == "binary" and link == "probit":

        def mu_var_dmu(eta):
            mu = jnp.clip(rng.norm_cdf(eta), MU_EPS, 1.0 - MU_EPS)
            var = mu * (1.0 - mu)
            dmu = jnp.exp(-0.5 * eta * eta) * 0.3989422804014327  # phi(eta)
            return mu, var, jnp.maximum(dmu, MU_EPS)

        return mu_var_dmu
    if outcome == "binary":

        def mu_var_dmu(eta):
            mu = jnp.clip(jax.nn.sigmoid(eta), MU_EPS, 1.0 - MU_EPS)
            var = mu * (1.0 - mu)
            return mu, var, var  # canonical: dmu/deta = var

        return mu_var_dmu
    if outcome == "count":

        def mu_var_dmu(eta):
            mu = jnp.clip(jnp.exp(jnp.clip(eta, -30.0, 30.0)), MU_EPS, None)
            return mu, mu, mu

        return mu_var_dmu
    raise ValueError(f"GLM does not support outcome {outcome!r}")


def _deviance(outcome: str, y, mu, mask):
    if outcome == "binary":
        t1 = jnp.where(y > 0.5, -jnp.log(mu), 0.0)
        t2 = jnp.where(y < 0.5, -jnp.log(1.0 - mu), 0.0)
        return 2.0 * jnp.sum((t1 + t2) * mask, axis=-1)
    # poisson: 2 sum[y ln(y/mu) - (y - mu)], y ln y term with 0 ln 0 = 0
    ylogy = jnp.where(y > 0, y * jnp.log(jnp.maximum(y, MU_EPS)), 0.0)
    return 2.0 * jnp.sum((ylogy - y * jnp.log(mu) - (y - mu)) * mask, axis=-1)


def _irls(outcome, link, Xf, yf, mask, beta0):
    """Fixed-iteration IRLS for one (sim, grid) cell.

    Xf (n, P) f64, yf (n,), mask (n,) {0,1}, beta0 (P,). Returns
    (beta, cov, converged, deviance).
    """
    pf = Xf.shape[1]
    mu_var_dmu = _link_funcs(outcome, link)
    ridge = 1e-10 * jnp.eye(pf, dtype=jnp.float64)

    def body(_, carry):
        beta, done = carry
        eta = Xf @ beta
        mu, var, dmu = mu_var_dmu(eta)
        w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask
        z = eta + (yf - mu) / dmu
        xw = Xf * w[:, None]
        xtwx = xw.T @ Xf + ridge
        xtwz = xw.T @ z
        chol = smallchol.chol(xtwx)
        beta_new = smallchol.cho_solve(chol, xtwz)
        beta_new = jnp.clip(beta_new, -BETA_CAP, BETA_CAP)
        ok = jnp.all(jnp.isfinite(beta_new))
        step = jnp.max(jnp.abs(beta_new - beta))
        done_new = done | (step < CONV_TOL)
        beta_out = jnp.where(done | ~ok, beta, beta_new)
        return beta_out, done_new

    beta, done = jax.lax.fori_loop(0, N_IRLS_ITERS, body, (beta0, jnp.bool_(False)))

    eta = Xf @ beta
    mu, var, dmu = mu_var_dmu(eta)
    w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask
    xw = Xf * w[:, None]
    xtwx = xw.T @ Xf + ridge
    chol = smallchol.chol(xtwx)
    cov = smallchol.cho_inverse(chol)
    dev = _deviance(outcome, yf, mu, mask)
    at_cap = jnp.any(jnp.abs(beta) >= BETA_CAP - 1e-6)
    converged = done & jnp.all(jnp.isfinite(beta)) & ~at_cap
    return beta, cov, converged, dev


def _null_deviance(outcome, yf, mask, n):
    """Intercept-only deviance: the canonical-link MLE is mu = ybar."""
    ybar = jnp.sum(yf * mask, axis=-1) / n
    mu0 = jnp.clip(ybar, MU_EPS, 1.0 - MU_EPS if outcome == "binary" else jnp.inf)
    return _deviance(outcome, yf, mu0[..., None], mask)


def glm_grid_stats(spec: SimSpec, arr: Dict, X, y, ids) -> Dict[str, jnp.ndarray]:
    """All GLM test statistics for one sim across the grid."""
    fit_cols = spec.effective_fit_cols
    pf = len(fit_cols)
    Xf = X[:, jnp.asarray(fit_cols)].astype(jnp.float64)
    yf = y.astype(jnp.float64)
    rows = jnp.arange(spec.max_n)

    # Truth start (scenario knob; reference batch.rs truth-start semantics):
    # seed IRLS at the DGP's true coefficients — otherwise a data-driven cold
    # start (link-scale mean intercept, zero slopes).
    if spec.scenario.truth_start:
        beta0_full = arr["effects"].astype(jnp.float64)[jnp.asarray(fit_cols)]
    else:
        beta0_full = jnp.zeros(pf, jnp.float64)

    def per_grid(n):
        mask = (rows < n).astype(jnp.float64)
        nn = jnp.asarray(n, jnp.float64)
        beta0 = beta0_full
        if not spec.scenario.truth_start:
            ybar = jnp.sum(yf * mask) / nn
            ybar = jnp.clip(ybar, 1e-6, 1 - 1e-6 if spec.outcome == "binary" else jnp.inf)
            if spec.outcome == "binary":
                icpt = jnp.log(ybar / (1 - ybar))
                if spec.link == "probit":
                    # crude probit intercept seed; IRLS refines it
                    icpt = icpt / 1.6
            else:
                icpt = jnp.log(ybar)
            beta0 = beta0.at[0].set(icpt)
        beta, cov, converged, dev = _irls(
            spec.outcome, spec.link, Xf, yf, mask, beta0
        )
        dev0 = _null_deviance(spec.outcome, yf, mask, nn)
        ybar_real = jnp.sum(yf * mask) / nn
        return beta, cov, converged, dev, dev0, ybar_real

    # vmap over the grid axis: one traced IRLS regardless of grid length.
    beta, cov, converged, dev, dev0, ybar = jax.vmap(per_grid)(
        jnp.asarray(spec.grid, jnp.int32)
    )

    cov_diag = jnp.diagonal(cov, axis1=-2, axis2=-1)
    t2_cols = []
    for tcol in spec.target_cols:
        t2_cols.append(beta[:, tcol] ** 2 / cov_diag[:, tcol])
    for a, b in spec.contrasts:
        d = beta[:, a] - beta[:, b]
        var_c = cov[:, a, a] + cov[:, b, b] - 2.0 * cov[:, a, b]
        t2_cols.append(d * d / var_c)
    t2 = (
        jnp.stack(t2_cols, axis=1)
        if t2_cols
        else jnp.zeros((spec.n_grid, 0), jnp.float64)
    )

    out = {
        "t2": t2,
        "overall": dev0 - dev,  # LRT statistic vs chi2 crit (df = pf-1)
        "converged": converged,
        "glm_baseline": ybar,
        "singular": ~converged,
    }

    if spec.posthoc:
        ph = []
        col_to_fit = {c: i for i, c in enumerate(fit_cols)}
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
        out["posthoc_t2"] = (
            jnp.stack(ph, axis=1) if ph else jnp.zeros((spec.n_grid, 0), jnp.float64)
        )

    return out
