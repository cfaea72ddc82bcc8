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


def _golden_scalar(f, lo: float, hi: float, iters: int = 60) -> float:
    """Plain golden-section minimize over [lo, hi] (host scalars — the same
    bracketing search the engine's variance paths run, without jit)."""
    import math

    invphi = (math.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c = b - invphi * (b - a)
    d = a + invphi * (b - a)
    fc, fd = f(c), f(d)
    for _ in range(iters):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - invphi * (b - a)
            fc = f(c)
        else:
            a, c, fc = c, d, fd
            d = a + invphi * (b - a)
            fd = f(d)
    return 0.5 * (a + b)


def fit_provided_clustered(
    X, y, cluster_ids, family: str
) -> Tuple[np.ndarray, float, float, bool, str]:
    """Random-intercept fit of provided bytes on UNBALANCED clusters.

    The reference's clustered get_effects_from_data path
    (fit_uploaded_data with cluster_ids: fixed-effects β plus the primary
    grouping's intercept variance τ̂², introspect.rs/driver.rs): linear
    models run profiled REML (per-cluster Woodbury sums), binary/count
    models a scalar-u Laplace (penalized IRLS with a Schur-complement
    solve), each profiling τ² with the engine's bracketing search.

    Returns (beta, tau_sq_hat, sigma_sq_hat, converged, diagnostic); for
    non-linear families sigma_sq_hat is 1.0 (latent-scale placeholder).
    """
    import math

    Xn = np.asarray(X, dtype=np.float64)
    yn = np.asarray(y, dtype=np.float64)
    cid = np.asarray(cluster_ids, dtype=np.int64)
    n, p = Xn.shape
    m = int(cid.max()) + 1 if cid.size else 0
    nj = np.bincount(cid, minlength=m).astype(np.float64)

    if family in _FAMILY_ARMS:
        outcome, link = _FAMILY_ARMS[family]

        def mu_w(eta):
            if outcome == "binary" and link == "canonical":
                mu = 1.0 / (1.0 + np.exp(-eta))
                return mu, np.maximum(mu * (1.0 - mu), 1e-10)
            if outcome == "binary":  # probit
                from scipy import stats as _st

                mu = _st.norm.cdf(eta)
                phi = _st.norm.pdf(eta)
                v = np.maximum(mu * (1.0 - mu), 1e-10)
                return mu, np.maximum(phi * phi / v, 1e-10)
            mu = np.exp(np.clip(eta, -30.0, 30.0))  # count
            return mu, np.maximum(mu, 1e-10)

        def loglik(eta):
            if outcome == "binary" and link == "canonical":
                return float(np.sum(yn * eta - np.log1p(np.exp(eta))))
            if outcome == "binary":
                from scipy import stats as _st

                mu = np.clip(_st.norm.cdf(eta), 1e-12, 1 - 1e-12)
                return float(np.sum(yn * np.log(mu) + (1 - yn) * np.log1p(-mu)))
            mu = np.exp(np.clip(eta, -30.0, 30.0))
            return float(np.sum(yn * eta - mu))

        def laplace_dev(log_tau2, want_fit=False):
            tau2 = math.exp(log_tau2)
            beta = np.zeros(p)
            beta[0] = float(
                glmfit.data_intercept(outcome, link, float(np.mean(yn)))
            )
            u = np.zeros(m)
            for _ in range(40):
                eta = Xn @ beta + u[cid]
                mu, w = mu_w(eta)
                z = eta + (yn - mu) / w
                # joint penalized WLS in (beta, u), scalar u_j: Schur solve
                swx = np.zeros((m, p))
                np.add.at(swx, cid, w[:, None] * Xn)
                swz = np.bincount(cid, weights=w * z, minlength=m)
                sw = np.bincount(cid, weights=w, minlength=m)
                d = sw + 1.0 / tau2
                A = Xn.T @ (w[:, None] * Xn) - swx.T @ (swx / d[:, None])
                b = Xn.T @ (w * z) - swx.T @ (swz / d)
                chol = smallchol.chol(jnp.asarray(A))
                new_beta = np.asarray(
                    smallchol.cho_solve(chol, jnp.asarray(b)), dtype=np.float64
                )
                new_u = (swz - swx @ new_beta) / d
                if np.max(np.abs(new_beta - beta)) < 1e-9 and np.max(
                    np.abs(new_u - u)
                ) < 1e-9:
                    beta, u = new_beta, new_u
                    break
                beta, u = new_beta, new_u
            eta = Xn @ beta + u[cid]
            _, w = mu_w(eta)
            sw = np.bincount(cid, weights=w, minlength=m)
            dev = (
                -2.0 * loglik(eta)
                + float(np.sum(u * u)) / tau2
                + float(np.sum(np.log(tau2 * sw + 1.0)))
            )
            if want_fit:
                return dev, beta, u
            return dev

        lt = _golden_scalar(laplace_dev, math.log(1e-6), math.log(25.0))
        dev, beta, u = laplace_dev(lt, want_fit=True)
        tau2 = math.exp(lt)
        ok = bool(np.all(np.isfinite(beta)) and math.isfinite(dev))
        label = {"canonical": "logistic", "probit": "probit"}.get(link, "")
        if outcome == "count":
            label = "poisson"
        return beta, tau2, 1.0, ok, (
            f"{label} GLMM Laplace fit (engine kernels), n={n}, "
            f"{m} clusters"
        )

    # Linear: profiled REML over lambda = tau2/sigma2 with per-cluster
    # Woodbury sums — V_j^{-1} = I - (lambda/(1+lambda n_j)) 11'.
    xtx = Xn.T @ Xn
    xty = Xn.T @ yn
    yty = float(yn @ yn)
    sx = np.zeros((m, p))
    np.add.at(sx, cid, Xn)
    sy = np.bincount(cid, weights=yn, minlength=m)

    def reml(log_lam, want_fit=False):
        lam = math.exp(log_lam)
        c = lam / (1.0 + lam * nj)
        XtVX = xtx - sx.T @ (c[:, None] * sx)
        XtVy = xty - sx.T @ (c * sy)
        yVy = yty - float(np.sum(c * sy * sy))
        chol = smallchol.chol(jnp.asarray(XtVX))
        beta = np.asarray(
            smallchol.cho_solve(chol, jnp.asarray(XtVy)), dtype=np.float64
        )
        diag = np.asarray(jnp.diagonal(chol))
        if not (np.all(np.isfinite(diag)) and np.all(diag > 0)):
            return (np.inf, beta, np.nan) if want_fit else np.inf
        rss = max(yVy - float(beta @ XtVy), 1e-12)
        sigma2 = rss / max(n - p, 1)
        crit = (
            (n - p) * math.log(sigma2)
            + float(np.sum(np.log1p(lam * nj)))
            + 2.0 * float(np.sum(np.log(diag)))
        )
        if want_fit:
            return crit, beta, sigma2
        return crit

    ll = _golden_scalar(reml, math.log(1e-8), math.log(1e4))
    crit0, beta0, sig0 = reml(math.log(1e-8), want_fit=True)
    crit, beta, sigma2 = reml(ll, want_fit=True)
    if crit0 <= crit:  # boundary: no between-cluster variance
        beta, sigma2, lam = beta0, sig0, 0.0
    else:
        lam = math.exp(ll)
    tau2 = lam * sigma2
    ok = bool(np.all(np.isfinite(beta)) and math.isfinite(sigma2))
    return beta, tau2, sigma2, ok, (
        f"linear mixed REML fit (engine kernels), n={n}, {m} clusters"
    )
