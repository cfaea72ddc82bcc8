"""Unrolled small-matrix Cholesky: the hot-path linear algebra kernel.

XLA's ``lax.linalg.cholesky`` / ``triangular_solve`` lower to sequential
While loops with dynamic-update-slice — catastrophic for millions of tiny
(p x p, p <= ~20) batched factorizations, and doubly so in float64 (TPU f64
is double-double emulation; loop-carried f64 state multiplies the cost).
Profiled on a v5e: a 10k-sim OLS batch spent ~99% of its time inside those
loop kernels.

Since p is STATIC in this engine (it is part of the jit key), the entire
factorization can be unrolled into p(p+1)/2 scalar-lane expressions over the
batch: pure elementwise VPU arithmetic that XLA fuses into one kernel with
the surrounding math. This file is that unroll — factor, triangular solves,
inverse, logdet — for arbitrary batch dims.

This is the moral equivalent of the reference's hand-written dense kernels
(the glmm crate's small-matrix path and chol_lower at
crates/engine-core/src/data_gen.rs:55): own the tiny-matrix hot path, leave
the library path for big matrices.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_UNROLL_P = 32
# Scalar unroll emits O(p^3/6) ops — past this width the program-size cost
# (763 KB StableHLO at p = 30; OOMs the TPU compile helper when repeated)
# outweighs the perfect fusion, so chol/solves route to the vectorized-row
# twins below. Everything the golden tests pin sits well under this.
VEC_FROM_P = 13


def chol(A):
    """Lower Cholesky of (..., p, p) PSD matrices, unrolled over static p.

    Zero/negative pivots produce inf/nan like the library kernel (callers
    detect failure through finiteness checks).
    """
    p = A.shape[-1]
    if p >= VEC_FROM_P:
        return chol_vec(A)
    return chol_scalar(A)


def chol_scalar(A):
    """The raw scalar-lane unroll, no width dispatch: O(p^3/6) elementwise
    ops over the batch — ZERO layout padding on TPU (each op is a full
    (batch,)-lane VPU op), the fastest form per FLOP but O(p^3) program
    size. Call directly (instead of chol) when a wide factorization sits
    inside a loop body that is traced exactly ONCE (the joint-Z search
    body), where the single instance keeps the program compilable and the
    per-eval speed dominates the run."""
    p = A.shape[-1]
    L = [[None] * p for _ in range(p)]
    for j in range(p):
        d = A[..., j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(d)
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, p):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    rows = [
        jnp.stack(
            [L[i][j] if j <= i else jnp.zeros_like(L[i][i]) for j in range(p)],
            axis=-1,
        )
        for i in range(p)
    ]
    return jnp.stack(rows, axis=-2)


def solve_lower(L, b):
    """Solve L y = b (forward substitution), b (..., p)."""
    p = L.shape[-1]
    if p >= VEC_FROM_P:
        return solve_lower_vec(L, b)
    return solve_lower_scalar(L, b)


def solve_lower_scalar(L, b):
    """Raw scalar-lane forward substitution (see chol_scalar)."""
    p = L.shape[-1]
    y = [None] * p
    for i in range(p):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * y[k]
        y[i] = s / L[..., i, i]
    return jnp.stack(y, axis=-1)


def solve_upper_t(L, y):
    """Solve L^T x = y (back substitution with the lower factor)."""
    p = L.shape[-1]
    if p >= VEC_FROM_P:
        return solve_upper_t_vec(L, y)
    return solve_upper_t_scalar(L, y)


def solve_upper_t_scalar(L, y):
    """Raw scalar-lane back substitution (see chol_scalar)."""
    p = L.shape[-1]
    x = [None] * p
    for i in reversed(range(p)):
        s = y[..., i]
        for k in range(i + 1, p):
            s = s - L[..., k, i] * x[k]
        x[i] = s / L[..., i, i]
    return jnp.stack(x, axis=-1)


def cho_solve(L, b):
    """Solve A x = b given A = L L^T."""
    return solve_upper_t(L, solve_lower(L, b))


def cho_solve_scalar(L, b):
    """Solve A x = b given A = L L^T, raw scalar-lane forms."""
    return solve_upper_t_scalar(L, solve_lower_scalar(L, b))


# ---------------------------------------------------------------------------
# Vectorized-row unroll twins for MID-SIZE matrices (p ~ 10-64): the joint-Z
# capacitance path (mixedfit/glmmfit extras) factors M x M systems with
# M = sum_g m_g q_g ~ 30. The scalar unroll above emits O(p^3/6) scalar-lane
# ops — 763 KB of StableHLO at p = 30 per instance, which blew one arm's
# program past the TPU compile helper's memory (observed round 3: 6.2 MB
# StableHLO, remote-compile SIGKILL). These twins do the SAME factorization
# with O(p) stacked matvec steps (program size O(p), ~60x smaller at p = 30),
# trading ~3x redundant FLOPs on zero-padded lanes — irrelevant beside the
# compile-size cliff. Summation ORDER differs from the scalar unroll
# (stacked dot vs sequential subtract), so results agree only to rounding;
# the golden-pinned tiny-p hot paths therefore keep the scalar forms, and
# only the joint-Z paths (whose parity tests are tolerance-based) use these.
# ---------------------------------------------------------------------------


def chol_vec(A):
    """Lower Cholesky of (..., p, p), one stacked matvec per column."""
    p = A.shape[-1]
    if p > MAX_UNROLL_P * 4:
        return jnp.linalg.cholesky(A)
    L = jnp.zeros_like(A)
    idx = jnp.arange(p)
    for j in range(p):
        a_j = A[..., :, j]
        # columns >= j of L are still zero, so the full matvec sums only
        # the computed columns — no slicing, one dot_general per step
        rowj = L[..., j, :]
        s = a_j - jnp.einsum("...ik,...k->...i", L, rowj)
        d = jnp.sqrt(s[..., j])
        colj = jnp.where(idx >= j, s / d[..., None], jnp.zeros_like(s))
        L = L.at[..., :, j].set(colj)
    return L


def solve_lower_vec(L, b):
    """Forward substitution, one stacked dot per row."""
    p = L.shape[-1]
    if p > MAX_UNROLL_P * 4:
        import jax

        return jax.lax.linalg.triangular_solve(
            L, b[..., None], left_side=True, lower=True
        )[..., 0]
    y = jnp.zeros_like(b)
    for i in range(p):
        s = b[..., i] - jnp.einsum("...k,...k->...", L[..., i, :], y)
        y = y.at[..., i].set(s / L[..., i, i])
    return y


def solve_upper_t_vec(L, y):
    """Back substitution with the lower factor, stacked dots."""
    p = L.shape[-1]
    if p > MAX_UNROLL_P * 4:
        import jax

        return jax.lax.linalg.triangular_solve(
            L, y[..., None], left_side=True, lower=True, transpose_a=True
        )[..., 0]
    x = jnp.zeros_like(y)
    for i in reversed(range(p)):
        s = y[..., i] - jnp.einsum("...k,...k->...", L[..., :, i], x)
        x = x.at[..., i].set(s / L[..., i, i])
    return x


def cho_solve_vec(L, b):
    """Solve A x = b given A = L L^T (vectorized-row twins)."""
    return solve_upper_t_vec(L, solve_lower_vec(L, b))


def cho_solve_mat_vec(L, B):
    """Solve A X = B for (..., p, r) right-hand sides in one pass: the
    substitutions above work unchanged on matrix RHS when the dots contract
    the leading solve axis."""
    p = L.shape[-1]
    Y = jnp.zeros_like(B)
    for i in range(p):
        s = B[..., i, :] - jnp.einsum("...k,...kr->...r", L[..., i, :], Y)
        Y = Y.at[..., i, :].set(s / L[..., i, i][..., None])
    X = jnp.zeros_like(B)
    for i in reversed(range(p)):
        s = Y[..., i, :] - jnp.einsum("...k,...kr->...r", L[..., :, i], X)
        X = X.at[..., i, :].set(s / L[..., i, i][..., None])
    return X


def cho_inverse(L):
    """Full inverse of A = L L^T: p unrolled solves against identity."""
    p = L.shape[-1]
    eye = jnp.eye(p, dtype=L.dtype)
    cols = [cho_solve(L, jnp.broadcast_to(eye[j], L.shape[:-2] + (p,))) for j in range(p)]
    return jnp.stack(cols, axis=-1)


def logdet_from_chol(L):
    """log|A| = 2 sum log diag(L)."""
    return 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
    )


def chol_ok(L):
    """True where the factorization succeeded (finite, positive diagonal)."""
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    return jnp.all(jnp.isfinite(d) & (d > 0.0), axis=-1)


# Rank-deficiency epsilon for the Cholesky pivot ratio min(diag)/max(diag) —
# the reference's EPS_RANK rule (batch.rs:40-41) uses 1e-12 with exact
# sequential accumulation where a singular matrix hits an exact 0 pivot;
# XLA's FMA-fused chol leaves ~sqrt(f64 eps) noise in that pivot (observed
# ~3e-9 relative on an exactly confounded two-factor design), so the
# threshold sits above that noise floor. An L-ratio of 1e-6 corresponds to a
# condition number ~1e12 of the underlying matrix — far past where Wald t²
# is meaningful anyway.
EPS_RANK = 1e-6


def chol_rank_ok(L, eps_rank=EPS_RANK):
    """chol_ok plus the pivot-ratio rank test, on an existing UNRIDGED
    factorization."""
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    return (
        jnp.all(jnp.isfinite(d) & (d > 0.0), axis=-1)
        & (jnp.min(d, axis=-1) >= eps_rank * jnp.max(d, axis=-1))
    )


def rank_ok(mat, eps_rank=EPS_RANK):
    """Numerically-full-rank test of a symmetric PSD matrix via the Cholesky
    pivot ratio. Pass the UNRIDGED matrix: a tiny ridge (1e-10 I) lifts an
    exactly singular pivot to ~1e-5 relative, hiding rank deficiency."""
    return chol_rank_ok(chol(mat), eps_rank)


# ---------------------------------------------------------------------------
# Tiny-matvec helpers: MXU-padding-free forms of the p-small contractions.
# A batched (n, p) @ (p,) dot pads every dimension to the 128-lane MXU tile
# (~50-100x its model FLOPs at p <= 5); the elementwise multiply + reduce
# form stays on the VPU with zero padding. Same spirit as the unrolled
# Cholesky above: p is static and tiny, so never hand XLA a "matmul".
# ---------------------------------------------------------------------------


def rowmv(X, b):
    """(..., n, p) x (..., p) -> (..., n): per-row dot, VPU form."""
    return (X * b[..., None, :]).sum(-1)


def colsum(X, v):
    """(..., n, p) x (..., n) -> (..., p): contraction over rows."""
    return (X * v[..., :, None]).sum(-2)


def crossprod(X, w):
    """(..., n, p) with row weights (..., n) -> (..., p, p): X' diag(w) X
    as an elementwise outer-product reduction (fuses; no MXU padding)."""
    Xw = X * w[..., :, None]
    return (Xw[..., :, :, None] * X[..., :, None, :]).sum(-3)


def wouter(c, s):
    """(..., m) weights x (..., m, p) -> (..., p, p): sum_m c_m s_m s_m'
    (the Woodbury/Schur correction term), elementwise-reduction form."""
    return (
        (c[..., :, None, None] * s[..., :, :, None]) * s[..., :, None, :]
    ).sum(-3)


def wvec(c, s, t):
    """(..., m), (..., m, p), (..., m) -> (..., p): sum_m c_m s_m t_m."""
    return (c[..., :, None] * s * t[..., :, None]).sum(-2)
