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
import numpy as np

from . import rng, smallchol, waldstats
from .datagen import factor_min_counts as datagen_factor_min_counts
from .olsfit import EPS_RANK
from .spec import SimSpec

N_IRLS_ITERS = 30
# f64 polish steps after the f32 phase: Newton is quadratic, so f32's
# ~1e-6 residual reaches CONV_TOL in 1-2 steps; 4 leaves margin for cells
# whose f32 phase stalled at its noise floor short of true convergence.
N_IRLS_POLISH = 4
BETA_CAP = 30.0
CONV_TOL = 1e-8
CONV_TOL_F32 = 1e-5
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


def _irls(outcome, link, Xf, yf, mask, beta0, pin=None):
    """Two-phase mixed-precision IRLS for one (sim, grid) cell.

    Xf (n, P) f64, yf (n,), mask (n,) {0,1}, beta0 (P,). ``pin`` (P,) of
    0/1 pins excluded columns: Xf must already have them zeroed; the unit
    diagonal keeps the solve well-posed with beta exactly 0 there (the
    masked-refit idiom for the reference's reduced/reshaped fits).

    Phase 1 runs the bulk of the iterations with f32 state (TPU f64 is
    emulated and the per-iteration exp/sigmoid over the rows dominates
    the GLM arm — ARCHITECTURE.md "Performance notes"); phase 2 polishes
    with a few f64 Newton steps (quadratic convergence: f32's ~1e-6
    residual reaches the 1e-8 tolerance in one or two steps), so the
    returned beta/cov/deviance carry full f64 accuracy and the converged
    flag keeps its strict f64 meaning. Returns
    (beta, cov, converged, deviance).
    """
    pf = Xf.shape[1]
    mu_var_dmu = _link_funcs(outcome, link)
    ridge64 = 1e-10 * jnp.eye(pf, dtype=jnp.float64)
    if pin is not None:
        ridge64 = ridge64 + jnp.diag(pin)
    ridge32 = ridge64.astype(jnp.float32) + 1e-6 * jnp.eye(
        pf, dtype=jnp.float32
    )
    Xf32 = Xf.astype(jnp.float32)
    yf32 = yf.astype(jnp.float32)
    mask32 = mask.astype(jnp.float32)

    def make_body(Xd, yd, md, ridge, tol):
        def body(_, carry):
            beta, done = carry
            eta = smallchol.rowmv(Xd, beta)
            mu, var, dmu = mu_var_dmu(eta)
            w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * md
            z = eta + (yd - mu) / dmu
            xtwx = smallchol.crossprod(Xd, w) + ridge
            xtwz = smallchol.colsum(Xd, w * z)
            chol = smallchol.chol(xtwx)
            beta_new = smallchol.cho_solve(chol, xtwz)
            beta_new = jnp.clip(beta_new, -BETA_CAP, BETA_CAP)
            ok = jnp.all(jnp.isfinite(beta_new))
            step = jnp.max(jnp.abs(beta_new - beta))
            done_new = done | (step < tol)
            beta_out = jnp.where(done | ~ok, beta, beta_new)
            return beta_out, done_new

        return body

    beta32, _ = jax.lax.fori_loop(
        0,
        N_IRLS_ITERS,
        make_body(Xf32, yf32, mask32, ridge32, CONV_TOL_F32),
        (beta0.astype(jnp.float32), jnp.bool_(False)),
    )
    beta, done = jax.lax.fori_loop(
        0,
        N_IRLS_POLISH,
        make_body(Xf, yf, mask, ridge64, CONV_TOL),
        (beta32.astype(jnp.float64), jnp.bool_(False)),
    )

    eta = Xf @ beta
    mu, var, dmu = mu_var_dmu(eta)
    w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask
    xw = Xf * w[:, None]
    xtwx_raw = xw.T @ Xf
    chol = smallchol.chol(xtwx_raw + ridge64)
    cov = smallchol.cho_inverse(chol)
    dev = _deviance(outcome, yf, mu, mask)
    at_cap = jnp.any(jnp.abs(beta) >= BETA_CAP - 1e-6)
    # Rank check on the UNRIDGED information matrix (reference batch.rs:40-41
    # EPS_RANK pivot-ratio rule): the 1e-10 ridge turns an exactly singular
    # X'WX (confounded factor designs) into a barely-PD matrix whose fit
    # "converges" with garbage t² — probe the raw matrix separately so
    # rank deficiency is flagged while the ridge keeps the solve stable.
    # PINNED (masked-out) columns are structurally excluded, not deficient:
    # give them a unit pivot exactly like olsfit's colmask reduced fit, so
    # only the ACTIVE column block is rank-tested.
    probe = xtwx_raw if pin is None else xtwx_raw + jnp.diag(pin)
    raw_diag = jnp.diagonal(smallchol.chol(probe), axis1=-2, axis2=-1)
    rank_ok = (
        jnp.all(jnp.isfinite(raw_diag))
        & (jnp.min(raw_diag) >= EPS_RANK * jnp.max(raw_diag))
    )
    converged = done & jnp.all(jnp.isfinite(beta)) & ~at_cap & rank_ok
    return beta, cov, converged, dev


def data_intercept(outcome: str, link: str, ybar):
    """Cold-start intercept on the link scale from the realized outcome mean
    (the non-truth-start seed every sim fit uses; shared with the
    provided-data mirror fit so both paths start identically)."""
    ybar = jnp.clip(ybar, 1e-6, 1 - 1e-6 if outcome == "binary" else jnp.inf)
    if outcome == "binary":
        icpt = jnp.log(ybar / (1 - ybar))
        if link == "probit":
            # crude probit intercept seed; IRLS refines it
            icpt = icpt / 1.6
    else:
        icpt = jnp.log(ybar)
    return icpt


def _null_deviance(outcome, yf, mask, n):
    """Intercept-only deviance: the canonical-link MLE is mu = ybar."""
    ybar = jnp.sum(yf * mask, axis=-1) / n
    mu0 = jnp.clip(ybar, MU_EPS, 1.0 - MU_EPS if outcome == "binary" else jnp.inf)
    return _deviance(outcome, yf, mu0[..., None], mask)


def glm_grid_stats(
    spec: SimSpec, arr: Dict, X, y, ids, colmask=None, fallback: bool = True
) -> Dict[str, jnp.ndarray]:
    """All GLM test statistics for one sim across the grid.

    ``colmask`` (G, P_fit) runs the sparse-factor reduced fit (masked
    columns pinned at 0). When the primary fit fails to converge —
    separation being the canonical cause for logit — and factors exist, a
    SECOND cold-started IRLS pass drops the sparsest factor's columns and
    replaces the failed cells (the reference's separation fallback,
    crates/engine-core/src/batch.rs:1936-2020); ``separation_fallback``
    counts the cells rescued this way.

    ``fallback=False`` compiles the primary fit only — the cheap program the
    batch driver's separation gate dispatches first; failed sims are then
    re-run through the full (fallback=True) program, so the common
    all-converged case never pays the second IRLS (the reference pays it
    only on the cold branch, batch.rs:1990-2020).
    """
    from .spec import factor_dependent_cols

    fit_cols = spec.effective_fit_cols
    pf = len(fit_cols)
    Xf = X[:, jnp.asarray(fit_cols)].astype(jnp.float64)
    yf = y.astype(jnp.float64)
    rows = jnp.arange(spec.max_n)

    n_factors = len(spec.factor_levels)
    if colmask is None:
        colmask = jnp.ones((spec.n_grid, pf), jnp.float64)
    if n_factors:
        drop_rows = np.zeros((n_factors, pf))
        for f in range(n_factors):
            dep = set(factor_dependent_cols(spec, f))
            for i, c in enumerate(fit_cols):
                if c in dep:
                    drop_rows[f, i] = 1.0
        drop_rows_j = jnp.asarray(drop_rows)
        min_counts = datagen_factor_min_counts(spec, X)  # (G, n_factors)
    else:
        min_counts = None

    # Truth start (scenario knob; reference batch.rs truth-start semantics):
    # seed IRLS at the DGP's true coefficients — otherwise a data-driven cold
    # start (link-scale mean intercept, zero slopes).
    if spec.scenario.truth_start:
        beta0_full = arr["effects"].astype(jnp.float64)[jnp.asarray(fit_cols)]
    else:
        beta0_full = jnp.zeros(pf, jnp.float64)

    def _data_intercept(ybar):
        return data_intercept(spec.outcome, spec.link, ybar)

    def per_grid(n, cmrow, counts_row):
        mask = (rows < n).astype(jnp.float64)
        nn = jnp.asarray(n, jnp.float64)
        ybar_real = jnp.sum(yf * mask) / nn
        beta0 = beta0_full * cmrow
        if not spec.scenario.truth_start:
            beta0 = beta0.at[0].set(_data_intercept(ybar_real))
        pin = 1.0 - cmrow
        beta, cov, converged, dev = _irls(
            spec.outcome, spec.link, Xf * cmrow[None, :], yf, mask, beta0, pin
        )
        fb_used = jnp.bool_(False)
        if n_factors and fallback:
            # Separation fallback: drop the sparsest factor, one cold refit.
            sparsest = jnp.argmin(counts_row)
            cm_fb = cmrow * (1.0 - drop_rows_j[sparsest])
            beta0_fb = (
                jnp.zeros(pf, jnp.float64).at[0].set(_data_intercept(ybar_real))
            )
            beta_fb, cov_fb, conv_fb, dev_fb = _irls(
                spec.outcome,
                spec.link,
                Xf * cm_fb[None, :],
                yf,
                mask,
                beta0_fb,
                1.0 - cm_fb,
            )
            fb_used = (~converged) & conv_fb
            beta = jnp.where(fb_used, beta_fb, beta)
            cov = jnp.where(fb_used, cov_fb, cov)
            dev = jnp.where(fb_used, dev_fb, dev)
            converged = converged | fb_used
        dev0 = _null_deviance(spec.outcome, yf, mask, nn)
        return beta, cov, converged, dev, dev0, ybar_real, fb_used

    # vmap over the grid axis: one traced IRLS regardless of grid length.
    beta, cov, converged, dev, dev0, ybar, fb_used = jax.vmap(per_grid)(
        jnp.asarray(spec.grid, jnp.int32),
        colmask,
        min_counts
        if min_counts is not None
        else jnp.zeros((spec.n_grid, 1), jnp.float64),
    )

    out = {
        "t2": waldstats.t2_targets(spec, beta, cov),
        "overall": dev0 - dev,  # LRT statistic vs chi2 crit (df = pf-1)
        "converged": converged,
        "glm_baseline": ybar,
        "singular": ~converged,
    }
    if n_factors and fallback:
        out["separation_fallback"] = fb_used
    return waldstats.add_posthoc(out, spec, beta, cov)
