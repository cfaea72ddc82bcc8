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

from . import smallchol
from .spec import SimSpec


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
        segs_xtx.append(seg.T @ seg)
        segs_xty.append(seg.T @ ys)
        segs_yty.append(ys @ ys)
        segs_ysum.append(jnp.sum(ys))
        prev = n
    xtx = jnp.cumsum(jnp.stack(segs_xtx), axis=0)
    xty = jnp.cumsum(jnp.stack(segs_xty), axis=0)
    yty = jnp.cumsum(jnp.stack(segs_yty), axis=0)
    ysum = jnp.cumsum(jnp.stack(segs_ysum), axis=0)
    return xtx, xty, yty, ysum


def ols_grid_stats(spec: SimSpec, arr: Dict, X, y) -> Dict[str, jnp.ndarray]:
    """All OLS test statistics for one sim across the grid.

    Returns dict with 't2' (G, n_targets), 'overall' (G,), 'converged' (G,).
    """
    fit_cols = spec.effective_fit_cols
    pf = len(fit_cols)
    Xf = X[:, jnp.asarray(fit_cols)].astype(jnp.float64)
    yf = y.astype(jnp.float64)

    xtx, xty, yty, ysum = grid_suffstats(spec, Xf, yf)
    ns = jnp.asarray(spec.grid, dtype=jnp.float64)

    # Batched solve over the grid axis via the unrolled static-p kernel
    # (smallchol): pure fused VPU arithmetic instead of XLA's loop-based
    # cholesky — the difference between ~8 s and ~ms at 10k sims.
    chol = smallchol.chol(xtx)  # (G, P, P); NaN rows when singular
    beta = smallchol.cho_solve(chol, xty)
    inv = smallchol.cho_inverse(chol)

    rss = yty - jnp.einsum("gp,gp->g", beta, xty)
    df_resid = jnp.maximum(ns - pf, 1.0)
    sigma2 = rss / df_resid

    inv_diag = jnp.diagonal(inv, axis1=-2, axis2=-1)  # (G, P)

    t2_cols = []
    for tcol in spec.target_cols:
        t2_cols.append(beta[:, tcol] ** 2 / (sigma2 * inv_diag[:, tcol]))
    for a, b in spec.contrasts:
        d = beta[:, a] - beta[:, b]
        var_c = sigma2 * (inv[:, a, a] + inv[:, b, b] - 2.0 * inv[:, a, b])
        t2_cols.append(d * d / var_c)
    t2 = (
        jnp.stack(t2_cols, axis=1)
        if t2_cols
        else jnp.zeros((spec.n_grid, 0), jnp.float64)
    )

    tss = yty - ysum * ysum / ns
    df1 = max(pf - 1, 1)
    overall = ((tss - rss) / df1) / sigma2

    converged = (
        jnp.isfinite(sigma2)
        & (sigma2 > 0.0)
        & jnp.all(jnp.isfinite(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
        & jnp.all(jnp.diagonal(chol, axis1=-2, axis2=-1) > 0.0, axis=-1)
    )

    out = {"t2": t2, "overall": overall, "converged": converged}

    # Post-hoc pairwise contrasts (t^2 against the factor's Tukey/Bonf crit).
    if spec.posthoc:
        ph = []
        col_to_fit = {c: i for i, c in enumerate(fit_cols)}
        for block in spec.posthoc:
            for ca, cb in block.pairs:
                ia = col_to_fit.get(ca, -1) if ca >= 0 else -1
                ib = col_to_fit.get(cb, -1) if cb >= 0 else -1
                # c vector has +1 at ia, -1 at ib; -1 index means reference
                # level (no column — contribution 0).
                d = jnp.zeros(spec.n_grid, jnp.float64)
                var_q = jnp.zeros(spec.n_grid, jnp.float64)
                if ia >= 0:
                    d = d + beta[:, ia]
                    var_q = var_q + inv[:, ia, ia]
                if ib >= 0:
                    d = d - beta[:, ib]
                    var_q = var_q + inv[:, ib, ib]
                if ia >= 0 and ib >= 0:
                    var_q = var_q - 2.0 * inv[:, ia, ib]
                ph.append(d * d / (sigma2 * var_q))
        out["posthoc_t2"] = (
            jnp.stack(ph, axis=1) if ph else jnp.zeros((spec.n_grid, 0), jnp.float64)
        )

    return out
