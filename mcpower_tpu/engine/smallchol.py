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
# Blocked-column unroll twins for MID-SIZE matrices (p ~ 10-64): the joint-Z
# capacitance path (mixedfit/glmmfit extras) factors M x M systems with
# M = sum_g m_g q_g ~ 30. The scalar unroll above emits O(p^3/6) scalar-lane
# ops — 763 KB of StableHLO at p = 30 per instance, which blew one arm's
# program past the TPU compile helper's memory (observed round 3: 6.2 MB
# StableHLO, remote-compile SIGKILL). The round-3 vectorized-row twins kept
# the program small with O(p) stacked matvec steps, but each step ended in a
# dynamic-update-slice of the FULL accumulator — inside a PIRLS/NM loop body
# that is O(p) full-buffer copies per factorization (~330 MB of HBM traffic
# per 1024-lane chunk step at M = 30), which held glmm_extras to 137 fits/s
# (round-3 baseline). These blocked-column forms eliminate the DUS entirely:
# columns are built functionally in Python lists (panel blocks of
# CHOL_BLOCK columns), cross-block updates are ONE batched matmul per block,
# and in-block recurrences are fused elementwise chains on single columns —
# program size O(p * B), zero accumulator copies. Summation ORDER differs
# from the scalar unroll (block matmul + sequential tail), so results agree
# only to rounding; the golden-pinned tiny-p hot paths therefore keep the
# scalar forms, and only tolerance-tested paths (joint-Z, wide-p dispatch)
# use these.
# ---------------------------------------------------------------------------

CHOL_BLOCK = 8


def chol_vec(A, block: int = CHOL_BLOCK):
    """Lower Cholesky of (..., p, p): DUS-free blocked-column unroll."""
    p = A.shape[-1]
    if p > MAX_UNROLL_P * 4:
        return jnp.linalg.cholesky(A)
    idx = jnp.arange(p)
    blocks = []  # (..., p, b) column panels, zero above the diagonal
    for j0 in range(0, p, block):
        j1 = min(j0 + block, p)
        S = A[..., :, j0:j1]
        if blocks:
            Lprev = jnp.concatenate(blocks, axis=-1)  # (..., p, j0)
            S = S - jnp.einsum(
                "...ik,...jk->...ij", Lprev, Lprev[..., j0:j1, :]
            )
        cols = []
        for jj in range(j1 - j0):
            g = j0 + jj
            s = S[..., :, jj]
            for kk in range(jj):
                # rank-1 tail within the block: fused elementwise chain
                s = s - cols[kk] * cols[kk][..., g, None]
            d = jnp.sqrt(s[..., g])
            cols.append(
                jnp.where(idx >= g, s / d[..., None], jnp.zeros_like(s))
            )
        blocks.append(jnp.stack(cols, axis=-1))
    return jnp.concatenate(blocks, axis=-1) if len(blocks) > 1 else blocks[0]


def solve_lower_vec(L, b, block: int = CHOL_BLOCK):
    """Forward substitution, blocked: one matvec per block + scalar tail."""
    p = L.shape[-1]
    if p > MAX_UNROLL_P * 4:
        import jax

        return jax.lax.linalg.triangular_solve(
            L, b[..., None], left_side=True, lower=True
        )[..., 0]
    segs = []
    for j0 in range(0, p, block):
        j1 = min(j0 + block, p)
        r = b[..., j0:j1]
        if segs:
            yprev = jnp.concatenate(segs, axis=-1)
            r = r - jnp.einsum(
                "...jk,...k->...j", L[..., j0:j1, :j0], yprev
            )
        ys = []
        for ii in range(j1 - j0):
            g = j0 + ii
            s = r[..., ii]
            for kk in range(ii):
                s = s - L[..., g, j0 + kk] * ys[kk]
            ys.append(s / L[..., g, g])
        segs.append(jnp.stack(ys, axis=-1))
    return jnp.concatenate(segs, axis=-1) if len(segs) > 1 else segs[0]


def solve_upper_t_vec(L, y, block: int = CHOL_BLOCK):
    """Back substitution with the lower factor, blocked (see above)."""
    p = L.shape[-1]
    if p > MAX_UNROLL_P * 4:
        import jax

        return jax.lax.linalg.triangular_solve(
            L, y[..., None], left_side=True, lower=True, transpose_a=True
        )[..., 0]
    starts = list(range(0, p, block))
    segs = {}
    for j0 in reversed(starts):
        j1 = min(j0 + block, p)
        r = y[..., j0:j1]
        if j1 < p:
            xnext = jnp.concatenate(
                [segs[s0] for s0 in starts if s0 >= j1], axis=-1
            )
            r = r - jnp.einsum(
                "...kj,...k->...j", L[..., j1:, j0:j1], xnext
            )
        xs = [None] * (j1 - j0)
        for ii in reversed(range(j1 - j0)):
            g = j0 + ii
            s = r[..., ii]
            for kk in range(ii + 1, j1 - j0):
                s = s - L[..., j0 + kk, g] * xs[kk]
            xs[ii] = s / L[..., g, g]
        segs[j0] = jnp.stack(xs, axis=-1)
    out = [segs[s0] for s0 in starts]
    return jnp.concatenate(out, axis=-1) if len(out) > 1 else out[0]


def cho_solve_vec(L, b):
    """Solve A x = b given A = L L^T (blocked-column twins)."""
    return solve_upper_t_vec(L, solve_lower_vec(L, b))


def cho_solve_mat_vec(L, B, block: int = CHOL_BLOCK):
    """Solve A X = B for (..., p, r) right-hand sides: the blocked
    substitutions above with the extra RHS axis carried through the
    einsums (one matmul per block instead of a matvec)."""
    p = L.shape[-1]
    if p > MAX_UNROLL_P * 4:
        import jax

        Y = jax.lax.linalg.triangular_solve(
            L, B, left_side=True, lower=True
        )
        return jax.lax.linalg.triangular_solve(
            L, Y, left_side=True, lower=True, transpose_a=True
        )
    starts = list(range(0, p, block))
    # forward: L Y = B
    ysegs = []
    for j0 in starts:
        j1 = min(j0 + block, p)
        r = B[..., j0:j1, :]
        if ysegs:
            yprev = jnp.concatenate(ysegs, axis=-2)  # (..., j0, r)
            r = r - jnp.einsum(
                "...jk,...kr->...jr", L[..., j0:j1, :j0], yprev
            )
        ys = []
        for ii in range(j1 - j0):
            g = j0 + ii
            s = r[..., ii, :]
            for kk in range(ii):
                s = s - L[..., g, j0 + kk, None] * ys[kk]
            ys.append(s / L[..., g, g, None])
        ysegs.append(jnp.stack(ys, axis=-2))
    Y = jnp.concatenate(ysegs, axis=-2) if len(ysegs) > 1 else ysegs[0]
    # backward: L^T X = Y
    xsegs = {}
    for j0 in reversed(starts):
        j1 = min(j0 + block, p)
        r = Y[..., j0:j1, :]
        if j1 < p:
            xnext = jnp.concatenate(
                [xsegs[s0] for s0 in starts if s0 >= j1], axis=-2
            )
            r = r - jnp.einsum(
                "...kj,...kr->...jr", L[..., j1:, j0:j1], xnext
            )
        xs = [None] * (j1 - j0)
        for ii in reversed(range(j1 - j0)):
            g = j0 + ii
            s = r[..., ii, :]
            for kk in range(ii + 1, j1 - j0):
                s = s - L[..., j0 + kk, g, None] * xs[kk]
            xs[ii] = s / L[..., g, g, None]
        xsegs[j0] = jnp.stack(xs, axis=-2)
    out = [xsegs[s0] for s0 in starts]
    return jnp.concatenate(out, axis=-2) if len(out) > 1 else out[0]


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
