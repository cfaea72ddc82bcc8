"""Batched OLS over the CRN sample-size grid via prefix sufficient statistics.

The sample-size search evaluates every grid point from ONE draw budget: the
grid is ascending and rows are prefix-stable, so X'X, X'y, y'y at grid point g
are the point-(g-1) statistics plus one row-segment's contribution. On TPU the
segment contributions are batched matmuls over the sim axis (``snp,snq->spq``
einsums — MXU work), followed by a cumulative sum over the (static, small)
grid axis and a batched Cholesky solve per (sim, grid) cell.

This is the TPU-native reformulation of the reference's incremental
suff-stats OLS arm (crates/engine-core/src/batch.rs:876-917 and the glmm
crate's ``fit_suff_stats_t_sq``): where Rust grows one accumulator
sequentially per sim, XLA computes all segments of all sims as one batched
contraction and scans the grid axis.

Statistics produced per (sim, grid) cell, all in t^2 space:
* marginal t_j^2 = beta_j^2 / (sigma^2 (X'X)^{-1}_{jj})
* contrast  t_c^2 = (c'beta)^2 / (sigma^2 c'(X'X)^{-1} c)
* overall F = ((TSS - RSS)/(P-1)) / (RSS/(N-P))
* convergence flag (Cholesky succeeded, sigma^2 finite & positive)

Fits run in float64 (reference parity: OLS beta rel <= 1e-11 vs R lm,
BASELINE.md); generation stays float32.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from . import smallchol, waldstats
from .spec import SimSpec

# Rank-deficiency epsilon for the Cholesky pivot ratio — single source in
# smallchol (reference batch.rs:40-41 EPS_RANK; see the rationale there).
EPS_RANK = smallchol.EPS_RANK


def grid_suffstats(spec: SimSpec, Xf, yf):
    """Prefix sufficient statistics per grid point (single sim).

    Returns (xtx (G,P,P), xty (G,P), yty (G,), ysum (G,)) in f64.
    Static python loop over the (small) grid — unrolled into the XLA graph.
    """
    segs_xtx = []
    segs_xty = []
    segs_yty = []
    segs_ysum = []
    prev = 0
    for n in spec.grid:
        seg = jax.lax.slice_in_dim(Xf, prev, n, axis=0)
        ys = jax.lax.slice_in_dim(yf, prev, n, axis=0)
        # Elementwise-reduction forms (smallchol rowmv-family rationale):
        # a batched (P, n)@(n, P) dot at small P pads every dimension to
        # the 128-lane MXU tile; the outer-product reduce stays on the VPU.
        segs_xtx.append((seg[:, :, None] * seg[:, None, :]).sum(0))
        segs_xty.append(smallchol.colsum(seg, ys))
        segs_yty.append((ys * ys).sum())
        segs_ysum.append(jnp.sum(ys))
        prev = n
    xtx = jnp.cumsum(jnp.stack(segs_xtx), axis=0)
    xty = jnp.cumsum(jnp.stack(segs_xty), axis=0)
    yty = jnp.cumsum(jnp.stack(segs_yty), axis=0)
    ysum = jnp.cumsum(jnp.stack(segs_ysum), axis=0)
    return xtx, xty, yty, ysum


def ols_grid_stats(
    spec: SimSpec, arr: Dict, X, y, colmask=None
) -> Dict[str, jnp.ndarray]:
    """All OLS test statistics for one sim across the grid.

    ``colmask`` (G, P_fit) of 0/1 runs the sparse-factor REDUCED fit: masked
    columns are zeroed out of the suff-stats and their betas pinned to 0 via
    a unit diagonal (the masked-recomputation equivalent of the reference's
    reduced refit, batch.rs:2418-2570); residual df shrinks accordingly and
    the caller compares against reduced-df crit rows.

    Returns dict with 't2' (G, n_targets), 'overall' (G,), 'converged' (G,).
    """
    fit_cols = spec.effective_fit_cols
    pf = len(fit_cols)
    Xf = X[:, jnp.asarray(fit_cols)].astype(jnp.float64)
    yf = y.astype(jnp.float64)

    xtx, xty, yty, ysum = grid_suffstats(spec, Xf, yf)
    ns = jnp.asarray(spec.grid, dtype=jnp.float64)

    if colmask is not None:
        xtx = xtx * colmask[:, :, None] * colmask[:, None, :]
        xtx = xtx + jax.vmap(jnp.diag)(1.0 - colmask)
        xty = xty * colmask
        p_eff = jnp.sum(colmask, axis=1)
    else:
        p_eff = jnp.full(spec.n_grid, float(pf))

    # Batched solve over the grid axis via the unrolled static-p kernel
    # (smallchol): pure fused VPU arithmetic instead of XLA's loop-based
    # cholesky — the difference between ~8 s and ~ms at 10k sims.
    chol = smallchol.chol(xtx)  # (G, P, P); NaN rows when singular
    beta = smallchol.cho_solve(chol, xty)
    inv = smallchol.cho_inverse(chol)

    rss = yty - jnp.einsum("gp,gp->g", beta, xty)
    df_resid = jnp.maximum(ns - p_eff, 1.0)
    sigma2 = rss / df_resid

    cov = sigma2[:, None, None] * inv  # Wald covariance of beta
    t2 = waldstats.t2_targets(spec, beta, cov)

    tss = yty - ysum * ysum / ns
    df1 = jnp.maximum(p_eff - 1.0, 1.0)
    overall = ((tss - rss) / df1) / sigma2

    # Rank test matches the reference's Cholesky pivot-ratio rule
    # (batch.rs:40-41 EPS_RANK, fit_suff_stats_t_sq): a rank-deficient X'X
    # can still produce tiny POSITIVE pivots in floating point, so positivity
    # alone silently passes confounded designs with garbage t².
    diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
    pivot_ok = jnp.min(diag, axis=-1) >= EPS_RANK * jnp.max(diag, axis=-1)
    converged = (
        jnp.isfinite(sigma2)
        & (sigma2 > 0.0)
        & jnp.all(jnp.isfinite(diag), axis=-1)
        & jnp.all(diag > 0.0, axis=-1)
        & pivot_ok
    )

    out = {"t2": t2, "overall": overall, "converged": converged}
    # Post-hoc pairwise contrasts (t^2 against the factor's Tukey/Bonf crit).
    return waldstats.add_posthoc(out, spec, beta, cov)
