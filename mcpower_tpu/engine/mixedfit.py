"""Batched linear mixed models: profiled REML over per-cluster suff-stats.

The reference's hardest component (SURVEY.md §2.8 item 8): LMM REML fits via
the glmm crate's profile deviance + BOBYQA, per sim, per grid point, with
warm-start carries. The TPU-native redesign removes the serial optimizer
entirely for the random-intercept case:

* The REML profile deviance for V0 = I + gamma*ZZ' reduces, via per-cluster
  Woodbury, to pure arithmetic over **per-cluster sufficient statistics**
  (cluster row counts n_j, per-cluster column sums s_j = X_j'1, t_j = y_j'1,
  plus global X'X, X'y, y'y):

      X'V0^-1 X = X'X - sum_j c_j s_j s_j',   c_j = gamma/(1 + gamma n_j)
      log|V0|   = sum_j log(1 + gamma n_j)

  so one deviance evaluation is an (m,p)x(m,p) contraction plus a p x p
  Cholesky — no n-row pass.
* Those suff-stats are **prefix sums over the CRN grid** (segment-sums per
  cluster id, cumsum over grid segments), so one generation pass serves every
  grid N, like the OLS arm.
* The 1-D optimization over gamma = tau^2/sigma^2 is a fixed-round k-section
  search in log-gamma (6 batched probes per round, bracket kept around the
  best) — deterministic, branch-free, identical cost in every lane,
  replacing BOBYQA's data-dependent iteration counts (the reference's
  warm-start carry exists to amortize serial fits; a batched fixed search
  needs no carry) with ~2.6x less sequential depth than the golden-section
  chain it superseded.

Boundary (singular) fits pin gamma at the search floor and are flagged
(``boundary_hit``), mirroring the reference's theta-pinning bitmask
(crates/engine-core/src/spec.rs:562-573). Wald tests are z-based
(EstimatorSpec::uses_student_t == false for Mle, estimator.rs).

Random slopes / extra groupings use a q-dimensional relative covariance and
a batched Nelder-Mead over vech-chol(D/sigma^2); see ``_slope_deviance``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import smallchol, waldstats
from .spec import SimSpec

# log-gamma search window and iteration budget.
LOG_GAMMA_LO = -14.0  # gamma ~ 8e-7: effectively singular
LOG_GAMMA_HI = 7.0  # gamma ~ 1100: ICC 0.999
# Above this the Brent optimum sits against the upper gamma bound — the
# reference's boundary code 2 ("τ̂ implausibly large", spec.rs:562-565),
# surfaced separately from the τ̂=0 pin as boundary_hit_rate_high_tau.
BOUNDARY_LOG_GAMMA_HI = 6.5
# Brent (safeguarded parabolic) search budget. On smooth interior REML
# optima the parabolic steps converge to ~1e-7 in log-gamma within ~10
# evaluations (stress family in tests/test_brent.py); 20 leaves margin.
# The regime is THROUGHPUT-bound (see the k-section postmortem in
# ARCHITECTURE.md: extra vmapped probe lanes LOST on TPU because every
# probe is paid-for work), so minimizing TOTAL evaluations is the whole
# game — Brent needs ~half of golden section's 36. Lanes whose optimum
# sits at a wall degrade to golden-rate walks (~1e-3 positioning at 20
# iters), which is exactly the singular-fit set the explicit gamma = 0
# boundary probe below re-decides.
BRENT_ITERS = 20
GOLDEN_ITERS = 36  # kept for reference/tests of the fallback search
BOUNDARY_LOG_GAMMA = -12.0  # below this, report a boundary (singular) fit
_INV_PHI = 0.6180339887498949


def _cluster_suffstats(spec: SimSpec, Xf, yf, ids, m: int):
    """Per-cluster prefix suff-stats across the grid.

    Returns per grid point g: n_j (G, m), s (G, m, p), t (G, m),
    plus global xtx (G, p, p), xty (G, p), yty (G,), ysum (G,).
    """
    from . import clusterops

    seg_n, seg_s, seg_t = [], [], []
    seg_xtx, seg_xty, seg_yty, seg_ysum = [], [], [], []
    prev = 0
    for n in spec.grid:
        Xseg = jax.lax.slice_in_dim(Xf, prev, n, axis=0)
        yseg = jax.lax.slice_in_dim(yf, prev, n, axis=0)
        # Per-cluster sums via the static-layout reshape (engine.clusterops)
        # instead of one-hot matmuls.
        ones = jnp.ones(n - prev, jnp.float64)
        seg_n.append(clusterops.seg_segment(spec, ones, prev, m))
        seg_s.append(clusterops.seg_segment(spec, Xseg.T, prev, m).T)  # (m, p)
        seg_t.append(clusterops.seg_segment(spec, yseg, prev, m))  # (m,)
        seg_xtx.append(Xseg.T @ Xseg)
        seg_xty.append(Xseg.T @ yseg)
        seg_yty.append(yseg @ yseg)
        seg_ysum.append(jnp.sum(yseg))
        prev = n
    cum = lambda xs: jnp.cumsum(jnp.stack(xs), axis=0)
    return (
        cum(seg_n),
        cum(seg_s),
        cum(seg_t),
        cum(seg_xtx),
        cum(seg_xty),
        cum(seg_yty),
        cum(seg_ysum),
    )


def _reml_quantities(gamma, n_j, s, t, xtx, xty, yty, n, p):
    """Profile-REML pieces at one gamma for one (sim, grid) cell.

    All inputs are that cell's suff-stats; returns (deviance, beta, cov_unscaled,
    sigma2, logdet_v).
    """
    c = gamma / (1.0 + gamma * n_j)  # (m,)
    a_xx = xtx - smallchol.wouter(c, s)
    a_xy = xty - smallchol.wvec(c, s, t)
    a_yy = yty - jnp.sum(c * t * t)

    chol = smallchol.chol(a_xx)
    beta = smallchol.cho_solve(chol, a_xy)
    rss = a_yy - (beta * a_xy).sum()  # r' V0^-1 r at the profiled beta
    df = n - p
    sigma2 = rss / df

    logdet_v = jnp.sum(jnp.log1p(gamma * n_j))
    logdet_xvx = smallchol.logdet_from_chol(chol)
    # Profiled REML deviance (lme4 convention, constants dropped):
    dev = logdet_v + logdet_xvx + df * jnp.log(rss)
    return dev, beta, chol, sigma2, rss


def _golden_minimize(dev_fn, lo: float, hi: float, iters: int):
    """Fixed-iteration golden-section minimum: one NEW evaluation per
    iteration (the classic value-carrying variant)."""
    a = jnp.float64(lo)
    b = jnp.float64(hi)
    x1 = b - _INV_PHI * (b - a)
    x2 = a + _INV_PHI * (b - a)
    f1 = dev_fn(x1)
    f2 = dev_fn(x2)

    def body(_, carry):
        a, b, x1, x2, f1, f2 = carry
        keep_left = f1 < f2  # minimum in [a, x2]
        a2 = jnp.where(keep_left, a, x1)
        b2 = jnp.where(keep_left, x2, b)
        x1_new = b2 - _INV_PHI * (b2 - a2)
        x2_new = a2 + _INV_PHI * (b2 - a2)
        # keep_left: new x2 == old x1 (value known); else new x1 == old x2.
        x_eval = jnp.where(keep_left, x1_new, x2_new)
        f_eval = dev_fn(x_eval)
        x1o = jnp.where(keep_left, x_eval, x2)
        f1o = jnp.where(keep_left, f_eval, f2)
        x2o = jnp.where(keep_left, x1, x_eval)
        f2o = jnp.where(keep_left, f1, f_eval)
        return a2, b2, x1o, x2o, f1o, f2o

    a, b, *_ = jax.lax.fori_loop(0, iters, body, (a, b, x1, x2, f1, f2))
    return 0.5 * (a + b)


_CGOLD = 0.3819660112501051  # 2 - phi: golden fraction into the larger arm


def _brent_minimize(lo, hi, aux0, phases, init_eval=None, tol=1e-9):
    """Fixed-iteration safeguarded parabolic minimization (Brent's method).

    The successive-parabolic-interpolation step converges superlinearly
    (order ~1.32) on the smooth unimodal deviances the variance searches
    minimize, so it reaches the parity-gate tolerance in roughly half the
    evaluations golden section needs — and in the measured
    THROUGHPUT-bound regime (see the k-section postmortem above), total
    evaluations IS the wall-clock. Every step is safeguarded exactly as in
    Brent's algorithm: a parabolic step is taken only when it lands inside
    the bracket and moves less than half the step before last; otherwise
    the iteration is a plain golden step into the larger arm, so the
    fallback behavior is golden section and monotone bracket shrinkage is
    preserved. Branch-free (`jnp.where` lanes) so it vmaps across sims.

    ``phases`` is a tuple of ``(n_iters, eval_fn)`` with
    ``eval_fn(x, aux) -> (f, aux)`` — the aux thread carries warm-start
    state (the GLMM (beta, u) mode) between evaluations, and multiple
    phases express budget schedules (full PIRLS while the bracket is
    wide, warm refinement after). ``init_eval`` evaluates the single cold
    starting point (defaults to the first phase's evaluator).

    Returns ``(x_best, f_best, aux)`` — the best EVALUATED point, not the
    bracket midpoint.
    """
    a = jnp.float64(lo)
    b = jnp.float64(hi)
    x0 = a + _CGOLD * (b - a)
    fx, aux = (init_eval or phases[0][1])(x0, aux0)
    zero = jnp.float64(0.0)

    def make_body(eval_fn):
        def body(_, carry):
            a, b, x, w, v, fx, fw, fv, d, e, aux = carry
            xm = 0.5 * (a + b)
            tol1 = tol * jnp.abs(x) + 1e-13
            tol2 = 2.0 * tol1
            # Trial parabola through (x,fx), (w,fw), (v,fv).
            r = (x - w) * (fx - fv)
            q = (x - v) * (fx - fw)
            p = (x - v) * q - (x - w) * r
            q = 2.0 * (q - r)
            p = jnp.where(q > 0.0, -p, p)
            q = jnp.abs(q)
            # Golden step into the larger arm (the unconditional fallback).
            e_gold = jnp.where(x >= xm, a - x, b - x)
            d_gold = _CGOLD * e_gold
            para_ok = (
                (jnp.abs(e) > tol1)
                & (q > 0.0)
                & (jnp.abs(p) < jnp.abs(0.5 * q * e))
                & (p > q * (a - x))
                & (p < q * (b - x))
            )
            d_para = p / jnp.where(q == 0.0, 1.0, q)
            u_try = x + d_para
            # Keep parabolic landings off the walls.
            d_para = jnp.where(
                (u_try - a < tol2) | (b - u_try < tol2),
                jnp.where(xm >= x, tol1, -tol1),
                d_para,
            )
            e2 = jnp.where(para_ok, d, e_gold)
            d2 = jnp.where(para_ok, d_para, d_gold)
            u = x + jnp.where(
                jnp.abs(d2) >= tol1, d2, jnp.where(d2 >= 0.0, tol1, -tol1)
            )
            fu, aux = eval_fn(u, aux)
            better = fu <= fx
            a2 = jnp.where(
                better, jnp.where(u >= x, x, a), jnp.where(u < x, u, a)
            )
            b2 = jnp.where(
                better, jnp.where(u >= x, b, x), jnp.where(u < x, b, u)
            )
            demote_w = (~better) & ((fu <= fw) | (w == x))
            demote_v = (~better) & (~demote_w) & (
                (fu <= fv) | (v == x) | (v == w)
            )
            v2 = jnp.where(better | demote_w, w, jnp.where(demote_v, u, v))
            fv2 = jnp.where(
                better | demote_w, fw, jnp.where(demote_v, fu, fv)
            )
            w2 = jnp.where(better, x, jnp.where(demote_w, u, w))
            fw2 = jnp.where(better, fx, jnp.where(demote_w, fu, fw))
            x2 = jnp.where(better, u, x)
            fx2 = jnp.where(better, fu, fx)
            return a2, b2, x2, w2, v2, fx2, fw2, fv2, d2, e2, aux

        return body

    carry = (a, b, x0, x0, x0, fx, fx, fx, zero, zero, aux)
    for n_iters, eval_fn in phases:
        carry = jax.lax.fori_loop(0, n_iters, make_body(eval_fn), carry)
    return carry[2], carry[5], carry[10]


def _slope_cluster_suffstats(spec: SimSpec, Xf, yf, ids, m: int, q: int, Zf):
    """Per-cluster prefix suff-stats with a q-column RE design Z.

    Returns per grid g: G (m,q,q), A (m,q,p), b (m,q), n_j (m,), and global
    xtx/xty/yty.
    """
    from . import clusterops

    def seg(x, prev):  # (n_seg, ...) row-first -> (m, ...)
        moved = jnp.moveaxis(x, 0, -1)
        return jnp.moveaxis(
            clusterops.seg_segment(spec, moved, prev, m), -1, 0
        )

    segs = {k: [] for k in ("G", "A", "b", "n", "xtx", "xty", "yty")}
    prev = 0
    for n in spec.grid:
        Xs = jax.lax.slice_in_dim(Xf, prev, n, axis=0)
        ys = jax.lax.slice_in_dim(yf, prev, n, axis=0)
        Zs = jax.lax.slice_in_dim(Zf, prev, n, axis=0)
        segs["G"].append(seg(Zs[:, :, None] * Zs[:, None, :], prev))
        segs["A"].append(seg(Zs[:, :, None] * Xs[:, None, :], prev))
        segs["b"].append(seg(Zs * ys[:, None], prev))
        segs["n"].append(
            clusterops.seg_segment(
                spec, jnp.ones(n - prev, jnp.float64), prev, m
            )
        )
        segs["xtx"].append(Xs.T @ Xs)
        segs["xty"].append(Xs.T @ ys)
        segs["yty"].append(ys @ ys)
        prev = n
    return {k: jnp.cumsum(jnp.stack(v), axis=0) for k, v in segs.items()}


def _vech_to_lower(theta, q: int):
    """theta (q(q+1)/2,) -> lower-triangular (q, q), column-major vech."""
    L = jnp.zeros((q, q), theta.dtype)
    k = 0
    for j in range(q):
        for i in range(j, q):
            L = L.at[i, j].set(theta[k])
            k += 1
    return L


def _reml_quantities_q(Lam, G, A, b, xtx, xty, yty, n, p, q):
    """Profile-REML pieces for the q-dim structure at one (sim, grid) cell.

    All q/p-space contractions in elementwise-reduction form (smallchol
    rowmv-family rationale: tiny batched dots pad to the MXU tile)."""
    # C_i = I_q + Lam' G_i Lam  (m, q, q), SPD
    LtG = (Lam[None, :, :, None] * G[:, :, None, :]).sum(1)  # (m, j, q)
    C = jnp.eye(q, dtype=Lam.dtype)[None] + (
        LtG[:, :, :, None] * Lam[None, None, :, :]
    ).sum(2)
    cholC = smallchol.chol(C)
    # A~ = Lam' A_i : (m, q, p);  b~ = Lam' b_i
    At = (Lam[None, :, :, None] * A[:, :, None, :]).sum(1)  # (m, i, p)
    bt = (Lam[None, :, :] * b[:, :, None]).sum(1)  # (m, i)
    # solve C^{-1} against A~ columns and b~
    sol_b = smallchol.cho_solve(cholC, bt)  # (m, q)
    sol_A = jax.vmap(
        lambda ch, aa: jax.vmap(lambda col: smallchol.cho_solve(ch, col))(aa.T).T,
    )(cholC, At)  # (m, q, p)
    a_xx = xtx - (At[:, :, :, None] * sol_A[:, :, None, :]).sum((0, 1))
    a_xy = xty - (At * sol_b[:, :, None]).sum((0, 1))
    a_yy = yty - (bt * sol_b).sum()

    chol = smallchol.chol(a_xx)
    beta = smallchol.cho_solve(chol, a_xy)
    rss = a_yy - (beta * a_xy).sum()
    df = n - p
    sigma2 = rss / df
    logdet_v = jnp.sum(smallchol.logdet_from_chol(cholC))
    logdet_xvx = smallchol.logdet_from_chol(chol)
    dev = logdet_v + logdet_xvx + df * jnp.log(rss)
    return dev, beta, chol, sigma2


def _slope_grid_stats(spec: SimSpec, arr: Dict, X, y, ids) -> Dict[str, jnp.ndarray]:
    from . import optim

    c = spec.cluster
    m = c.n_clusters_at(spec.max_n)
    q = c.q
    d_theta = q * (q + 1) // 2
    fit_cols = spec.effective_fit_cols
    pf = len(fit_cols)
    Xf = X[:, jnp.asarray(fit_cols)].astype(jnp.float64)
    yf = y.astype(jnp.float64)
    Zf = jnp.concatenate(
        [
            jnp.ones((spec.max_n, 1), jnp.float64),
            X[:, jnp.asarray([s.design_col for s in c.slopes])].astype(jnp.float64),
        ],
        axis=1,
    )
    ss = _slope_cluster_suffstats(spec, Xf, yf, ids, m, q, Zf)
    ns = jnp.asarray(spec.grid, dtype=jnp.float64)

    # Truth start: Gamma_true = D (sigma^2 = 1 in the DGP), theta0 = vech chol D.
    taus = np.sqrt([max(c.tau_squared, 1e-4)] + [max(s.variance, 1e-4) for s in c.slopes])
    corr = np.eye(q)
    for i, s in enumerate(c.slopes):
        corr[0, 1 + i] = corr[1 + i, 0] = s.intercept_corr
    for i, si in enumerate(c.slopes):
        for j, sj in enumerate(c.slopes):
            if i != j:
                corr[1 + i, 1 + j] = si.intercept_corr * sj.intercept_corr
    D = np.outer(taus, taus) * corr
    L0 = np.linalg.cholesky(D + 1e-10 * np.eye(q))
    theta0 = np.concatenate([L0[j:, j] for j in range(q)])
    theta0_j = jnp.asarray(theta0, jnp.float64)
    # lower bounds: diagonal entries >= 0 (boundary pinning), off-diag free.
    lower = []
    k = 0
    for j in range(q):
        for i in range(j, q):
            lower.append(0.0 if i == j else -jnp.inf)
    lower = jnp.asarray(lower, jnp.float64)

    def per_grid(G, A, b, n_j, xtx, xty, yty, n):
        # Mixed-precision theta search (round 5 — the joint-Z extras path's
        # proven plan, mixedfit._joint_grid_stats): the NM candidate
        # rankings are pure per-cluster q x q algebra that TPU f64
        # EMULATES op-by-op; the search ranks on f32 suff-stat twins and
        # only the accepted theta is refit in f64 (an f32-resolved theta
        # is ~1e-3 off the f64 optimum — inside the variance-component
        # parity band, while beta/cov/sigma2 come from the f64 refit).
        f32 = jnp.float32
        ss32 = tuple(
            a.astype(f32) for a in (G, A, b, xtx, xty, yty)
        )
        n32 = n.astype(f32)

        def dev_at32(theta):
            Lam = _vech_to_lower(theta.astype(f32), q)
            dev, *_ = _reml_quantities_q(Lam, *ss32, n32, pf, q)
            return jnp.where(jnp.isfinite(dev), dev, f32(1e30)).astype(
                jnp.float64
            )

        theta_hat, _ = optim.nelder_mead(
            dev_at32, theta0_j, iters=140, init_step=0.3, lower=lower
        )

        def dev_at64(theta):
            Lam = _vech_to_lower(theta, q)
            dev, *_ = _reml_quantities_q(
                Lam, G, A, b, xtx, xty, yty, n, pf, q
            )
            return jnp.where(jnp.isfinite(dev), dev, jnp.float64(1e30))

        # Per-component boundary pinning by explicit f64 ZERO PROBES, the
        # slope-path twin of the intercept path's gamma = 0 re-decision:
        # the f32-ranked search cannot resolve the near-flat deviance of a
        # truly-null component (theta parks O(1e-2) off the floor, so a
        # diag threshold misses the pin — round-5 regression caught by
        # test_pinned_component_rates_null_slope_variance). Zeroing chol
        # COLUMN j removes component j entirely; if that costs no
        # deviance, the component is pinned, and pinned columns are zeroed
        # for the final f64 refit (so tau2_hat/cov reflect the pin).
        dev_hat = dev_at64(theta_hat)
        col_zero = []
        for j in range(q):
            mask = np.ones(d_theta)
            off = sum(q - c for c in range(j))
            mask[off : off + (q - j)] = 0.0
            col_zero.append(jnp.asarray(mask, jnp.float64))
        probes = jnp.stack(
            [dev_at64(theta_hat * cz) for cz in col_zero]
        )  # (q,)
        pinned = probes <= dev_hat + 1e-10
        keep = jnp.ones(d_theta, jnp.float64)
        for j in range(q):
            keep = keep * jnp.where(pinned[j], col_zero[j], 1.0)
        theta_fin = theta_hat * keep

        Lam = _vech_to_lower(theta_fin, q)
        dev, beta, chol, sigma2 = _reml_quantities_q(
            Lam, G, A, b, xtx, xty, yty, n, pf, q
        )
        cov = sigma2 * smallchol.cho_inverse(chol)
        # order [intercept, slope_0, ...] — the reference's
        # pinned_components u64 bitmask (spec.rs:562-573), kept unpacked so
        # the generic bool count reduction sums per bit.
        boundary = jnp.any(pinned)
        Gamma = Lam @ Lam.T
        tau2_hat = Gamma[0, 0] * sigma2
        converged = (
            jnp.isfinite(dev)
            & jnp.all(jnp.isfinite(beta))
            & (sigma2 > 0)
            & smallchol.chol_rank_ok(chol)
        )
        return beta, cov, converged, boundary, tau2_hat, pinned

    beta, cov, converged, boundary, tau2_hat, pinned = jax.vmap(per_grid)(
        ss["G"], ss["A"], ss["b"], ss["n"], ss["xtx"], ss["xty"], ss["yty"], ns
    )
    return _assemble_outputs(
        spec, beta, cov, converged, boundary, tau2_hat, pinned
    )


# ---------------------------------------------------------------------------
# Joint-Z path: crossed/nested extra groupings (with or without slopes).
# The per-cluster Woodbury no longer block-diagonalizes when a crossed
# grouping spans clusters, so the fit uses the JOINT capacitance matrix
#     C = I_M + Lam' (Z'Z) Lam,   Z = [Z_primary | Z_extra...], M = sum m_g q_g
# — dense but tiny (M <= a few dozen), one unrolled M x M Cholesky per
# (sim, grid, theta-eval). All Z' cross-products are prefix suff-stats over
# the CRN grid, so generation is still one pass. This replaces the
# reference's sparse-solver fallback (glmm crate ReStructure) with the
# TPU-shaped dense equivalent.
# ---------------------------------------------------------------------------


def _grouping_plan(spec: SimSpec):
    """[(n_levels, q_g, slope_design_cols, tau2, slopes)] per grouping:
    primary first, then extras in declaration order."""
    from . import datagen

    c = spec.cluster
    plan = [
        (
            c.n_clusters_at(spec.max_n),
            c.q,
            tuple(s.design_col for s in c.slopes),
            c.tau_squared,
            c.slopes,
        )
    ]
    for g, eg in enumerate(c.extra_groupings):
        _, n_lv = datagen.extra_grouping_ids(spec, g)
        plan.append(
            (
                n_lv,
                1 + len(eg.slopes),
                tuple(s.design_col for s in eg.slopes),
                eg.tau_squared,
                eg.slopes,
            )
        )
    return plan


def _build_joint_z(spec: SimSpec, X, ids):
    """Z (max_n, M) f64, level-major within each grouping block
    (col = level * q_g + component) so Lam_all = blockdiag(I_m kron Lam_g)."""
    from . import datagen

    c = spec.cluster
    plan = _grouping_plan(spec)
    blocks = []
    for g, (n_lv, q_g, slope_cols, _tau2, _slopes) in enumerate(plan):
        gids = ids if g == 0 else datagen.extra_grouping_ids(spec, g - 1)[0]
        zrow = jnp.concatenate(
            [jnp.ones((spec.max_n, 1), jnp.float64)]
            + [
                X[:, jnp.asarray([col])].astype(jnp.float64)
                for col in slope_cols
            ],
            axis=1,
        )  # (n, q_g)
        oh = jax.nn.one_hot(gids, n_lv, dtype=jnp.float64)  # (n, m_g)
        blocks.append(
            (oh[:, :, None] * zrow[:, None, :]).reshape(spec.max_n, n_lv * q_g)
        )
    return jnp.concatenate(blocks, axis=1)


def _theta_layout(plan):
    """Per-grouping vech slices + truth start + lower bounds."""
    sizes = [q * (q + 1) // 2 for _, q, _, _, _ in plan]
    theta0, lower = [], []
    for _, q, _, tau2, slopes in plan:
        taus = np.sqrt([max(tau2, 1e-4)] + [max(s.variance, 1e-4) for s in slopes])
        corr = np.eye(q)
        for i, s in enumerate(slopes):
            corr[0, 1 + i] = corr[1 + i, 0] = s.intercept_corr
        for i, si in enumerate(slopes):
            for j, sj in enumerate(slopes):
                if i != j:
                    corr[1 + i, 1 + j] = si.intercept_corr * sj.intercept_corr
        D = np.outer(taus, taus) * corr
        L0 = np.linalg.cholesky(D + 1e-10 * np.eye(q))
        theta0.extend(np.concatenate([L0[j:, j] for j in range(q)]))
        lower.extend(0.0 if i == j else -np.inf for j in range(q) for i in range(j, q))
    return sizes, jnp.asarray(theta0, jnp.float64), jnp.asarray(lower, jnp.float64)


def _lam_all(theta, plan, sizes, M: int):
    """Dense block-diagonal Lam_all (M, M) from the stacked theta."""
    Lam = jnp.zeros((M, M), theta.dtype)
    off_t = 0
    off_c = 0
    for (n_lv, q, _, _, _), sz in zip(plan, sizes):
        Lg = _vech_to_lower(theta[off_t : off_t + sz], q)
        block = jnp.kron(jnp.eye(n_lv, dtype=theta.dtype), Lg)
        Lam = jax.lax.dynamic_update_slice(Lam, block, (off_c, off_c))
        off_t += sz
        off_c += n_lv * q
    return Lam


def _joint_suffstats(spec: SimSpec, Xf, yf, Z):
    """Prefix suff-stats per grid point with the joint Z."""
    segs = {k: [] for k in ("ztz", "ztx", "zty", "xtx", "xty", "yty")}
    prev = 0
    for n in spec.grid:
        Xs = jax.lax.slice_in_dim(Xf, prev, n, axis=0)
        ys = jax.lax.slice_in_dim(yf, prev, n, axis=0)
        Zs = jax.lax.slice_in_dim(Z, prev, n, axis=0)
        segs["ztz"].append(Zs.T @ Zs)
        segs["ztx"].append(Zs.T @ Xs)
        segs["zty"].append(Zs.T @ ys)
        segs["xtx"].append(Xs.T @ Xs)
        segs["xty"].append(Xs.T @ ys)
        segs["yty"].append(ys @ ys)
        prev = n
    return {k: jnp.cumsum(jnp.stack(v), axis=0) for k, v in segs.items()}


def _reml_quantities_joint(Lam, ztz, ztx, zty, xtx, xty, yty, n, p):
    """Profile-REML pieces with the joint capacitance matrix at one cell.

    The M x M work (M ~ sum m_g q_g ~ 30) runs on the blocked-column
    twins (smallchol.chol_vec family): the scalar-lane unroll's O(M^3)
    program size blew this arm to 6.2 MB StableHLO and OOMed the TPU
    compile helper (round 3), and the per-column-DUS vectorized twins
    paid O(M) full-accumulator copies per evaluation inside the NM loop
    body — the blocked forms are both small-program and DUS-free."""
    M = Lam.shape[0]
    C = jnp.eye(M, dtype=Lam.dtype) + Lam.T @ ztz @ Lam
    At = Lam.T @ ztx  # (M, p)
    bt = Lam.T @ zty  # (M,)
    cholC = smallchol.chol_vec(C)
    # one joint [b | A] solve: halves the substitution chains per NM eval
    sol = smallchol.cho_solve_mat_vec(
        cholC, jnp.concatenate([bt[:, None], At], axis=-1)
    )
    sol_b, sol_A = sol[..., 0], sol[..., 1:]
    a_xx = xtx - At.T @ sol_A
    a_xy = xty - At.T @ sol_b
    a_yy = yty - bt @ sol_b
    chol = smallchol.chol(a_xx)
    beta = smallchol.cho_solve(chol, a_xy)
    rss = a_yy - beta @ a_xy
    df = n - p
    sigma2 = rss / df
    logdet_v = smallchol.logdet_from_chol(cholC)
    logdet_xvx = smallchol.logdet_from_chol(chol)
    dev = logdet_v + logdet_xvx + df * jnp.log(rss)
    return dev, beta, chol, sigma2


def _plan_all_q1(plan) -> bool:
    """True when every grouping is intercept-only (q_g == 1) — the random
    intercepts + crossed/nested intercepts regime (the common case and the
    frozen-grid extras arms)."""
    return all(q == 1 for _, q, _, _, _ in plan)


def _extras_scale_q1(lvec, plan):
    """Per-column scale of the EXTRAS block: lvec[g] repeated m_g times.

    For all-q1 plans Lam = diag(d) with d = [lvec[0]]*m_1 ++ extras scales,
    so the whole dense-Lam algebra reduces to column/row scalings."""
    return jnp.concatenate(
        [
            lvec[g + 1] * jnp.ones(n_lv, lvec.dtype)
            for g, (n_lv, _, _, _, _) in enumerate(plan[1:])
        ]
    )


def _cap_factor_q1(l1, dE, gpp, Gpe, Gee):
    """Block factorization of C = I + diag(d) G diag(d) for all-q1 plans.

    Exploits the one-hot structure the dense path ignores: each grouping's
    diagonal block of G = Z'Z (or Z'WZ) is DIAGONAL (every row hits exactly
    one level), so with Lam = diag(d) the capacitance

        C = [[diag(a),  Cpe], [Cpe',  Cee]]

    factors by block elimination — elementwise ops on the primary block
    (size m_1) plus ONE Cholesky of the extras-sized Schur complement
    S = Cee - Cpe' diag(1/a) Cpe (size Me = sum extras levels, ~10, inside
    the scalar-unroll width). Replaces the M x M blocked chol_vec + blocked
    substitutions (M ~ 30, ~30 sequential fused steps per evaluation) the
    dense path pays; summation order differs, so parity is to rounding
    (tolerance-tested like the rest of the joint-Z family).

    ``gpp`` is diag(G_PP) (m1,), ``Gpe`` (m1, Me), ``Gee`` (Me, Me).
    Returns (a, Cpe, cholS).
    """
    a = 1.0 + (l1 * l1) * gpp  # (m1,)
    Cpe = l1 * Gpe * dE[None, :]  # (m1, Me)
    Me = Gee.shape[-1]
    Cee = jnp.eye(Me, dtype=Gee.dtype) + (dE[:, None] * dE[None, :]) * Gee
    S = Cee - Cpe.T @ (Cpe / a[:, None])
    return a, Cpe, smallchol.chol(S)


def _cap_solve_cols_q1(a, Cpe, cholS, rp, re, ncols: int):
    """Solve C [x] = [rp; re] for an (.., p+1)-column RHS via the block
    factorization above. ncols is static (p+1 small unrolled solves)."""
    rp_a = rp / a[:, None]
    t = re - Cpe.T @ rp_a
    xe = jnp.stack(
        [smallchol.cho_solve(cholS, t[..., :, j]) for j in range(ncols)],
        axis=-1,
    )
    xp = rp_a - (Cpe @ xe) / a[:, None]
    return xp, xe


def _cap_logdet_q1(a, cholS):
    return jnp.sum(jnp.log(a)) + smallchol.logdet_from_chol(cholS)


def _reml_quantities_joint_q1(lvec, plan, ztz, ztx, zty, xtx, xty, yty, n, p):
    """Structured profile-REML at one cell for all-intercept-only plans
    (see _cap_factor_q1 for the factorization this rides)."""
    m1 = plan[0][0]
    l1 = lvec[0]
    dE = _extras_scale_q1(lvec, plan)
    a, Cpe, cholS = _cap_factor_q1(
        l1, dE, jnp.diagonal(ztz[:m1, :m1]), ztz[:m1, m1:], ztz[m1:, m1:]
    )
    # rhs [bt | At] split by block: bt = d * zty, At = d[:, None] * ztx
    rp = jnp.concatenate([(l1 * zty[:m1])[:, None], l1 * ztx[:m1]], axis=1)
    re = jnp.concatenate(
        [(dE * zty[m1:])[:, None], dE[:, None] * ztx[m1:]], axis=1
    )  # (Me, p+1)
    xp, xe = _cap_solve_cols_q1(a, Cpe, cholS, rp, re, p + 1)
    sol_b = jnp.concatenate([xp[..., 0], xe[..., 0]])
    sol_A = jnp.concatenate([xp[..., 1:], xe[..., 1:]], axis=0)  # (M, p)
    At_full = jnp.concatenate([l1 * ztx[:m1], dE[:, None] * ztx[m1:]], axis=0)
    bt_full = jnp.concatenate([l1 * zty[:m1], dE * zty[m1:]])
    a_xx = xtx - At_full.T @ sol_A
    a_xy = xty - At_full.T @ sol_b
    a_yy = yty - bt_full @ sol_b
    chol = smallchol.chol(a_xx)
    beta = smallchol.cho_solve(chol, a_xy)
    rss = a_yy - beta @ a_xy
    df = n - p
    sigma2 = rss / df
    logdet_v = _cap_logdet_q1(a, cholS)
    logdet_xvx = smallchol.logdet_from_chol(chol)
    dev = logdet_v + logdet_xvx + df * jnp.log(rss)
    return dev, beta, chol, sigma2


def _joint_grid_stats(spec: SimSpec, arr: Dict, X, y, ids) -> Dict[str, jnp.ndarray]:
    from . import optim

    c = spec.cluster
    fit_cols = spec.effective_fit_cols
    pf = len(fit_cols)
    Xf = X[:, jnp.asarray(fit_cols)].astype(jnp.float64)
    yf = y.astype(jnp.float64)
    plan = _grouping_plan(spec)
    M = sum(n_lv * q for n_lv, q, _, _, _ in plan)
    Z = _build_joint_z(spec, X, ids)
    ss = _joint_suffstats(spec, Xf, yf, Z)
    sizes, theta0, lower = _theta_layout(plan)
    ns = jnp.asarray(spec.grid, dtype=jnp.float64)
    q1 = plan[0][1]
    all_q1 = _plan_all_q1(plan)

    def per_grid(ztz, ztx, zty, xtx, xty, yty, n):
        # Mixed-precision theta search (the engine's established pattern,
        # cf. the GLMM f32 PIRLS twins): the NM evaluations are pure dense
        # M x M algebra, and in f64 v5e EMULATES every op — measured 43.7
        # fits/s with the all-f64 140-iter search (round 3). The search
        # runs entirely in f32 over f32 suff-stat twins. Only the accepted
        # theta is refit in f64: an f32-resolved theta is ~1e-3 off the
        # f64 optimum, which perturbs tau^2 well under the parity
        # tolerances while the beta/cov/sigma2 the t-tests ride come from
        # the f64 refit.
        f32 = jnp.float32
        ss32 = tuple(a.astype(f32) for a in (ztz, ztx, zty, xtx, xty, yty))
        n32 = n.astype(f32)

        if all_q1:
            # Structured capacitance (round 5): intercept-only plans skip
            # the dense Lam build and the M x M blocked chol entirely —
            # see _reml_quantities_joint_q1.
            def dev_at32(theta):
                dev, *_ = _reml_quantities_joint_q1(
                    theta.astype(f32), plan, *ss32, n32, pf
                )
                return jnp.where(jnp.isfinite(dev), dev, f32(1e30)).astype(
                    jnp.float64
                )

        else:
            # Blocked-column kernels at BOTH NM sites. Two measured-and-
            # rejected alternatives: the scalar-lane twin in the body (one
            # instance via f_init, 3.5 MB StableHLO) took >45 min to compile
            # on BOTH backends (XLA:CPU and the TPU compile helper); the
            # round-3 per-column DUS twins copied the full M x M accumulator
            # O(M) times per evaluation inside the NM loop body. See
            # ARCHITECTURE.md round-3/4 notes.
            def dev_at32(theta):
                Lam = _lam_all(theta.astype(f32), plan, sizes, M)
                dev, *_ = _reml_quantities_joint(Lam, *ss32, n32, pf)
                return jnp.where(jnp.isfinite(dev), dev, f32(1e30)).astype(
                    jnp.float64
                )

        theta_hat, _ = optim.nelder_mead(
            dev_at32, theta0, iters=140, init_step=0.3, lower=lower,
        )
        if all_q1:
            dev, beta, chol, sigma2 = _reml_quantities_joint_q1(
                theta_hat, plan, ztz, ztx, zty, xtx, xty, yty, n, pf
            )
        else:
            Lam = _lam_all(theta_hat, plan, sizes, M)
            dev, beta, chol, sigma2 = _reml_quantities_joint(
                Lam, ztz, ztx, zty, xtx, xty, yty, n, pf
            )
        cov = sigma2 * smallchol.cho_inverse(chol)
        Lam1 = _vech_to_lower(theta_hat[: sizes[0]], q1)
        tau2_hat = (Lam1 @ Lam1.T)[0, 0] * sigma2
        # Boundary: any grouping's intercept/slope SD pinned at ~0. Kept
        # per-component (order: primary [intercept, slope_0, ...] then each
        # extra grouping's components) — the reference's pinned_components
        # bitmask (spec.rs:562-573) in unpacked form.
        diag_entries = []
        off = 0
        for (_, q, _, _, _), sz in zip(plan, sizes):
            Lg = _vech_to_lower(theta_hat[off : off + sz], q)
            diag_entries.append(jnp.diagonal(Lg))
            off += sz
        pinned = jnp.concatenate(diag_entries) < 1e-4
        boundary = jnp.any(pinned)
        converged = (
            jnp.isfinite(dev)
            & jnp.all(jnp.isfinite(beta))
            & (sigma2 > 0)
            & smallchol.chol_rank_ok(chol)
        )
        return beta, cov, converged, boundary, tau2_hat, pinned

    beta, cov, converged, boundary, tau2_hat, pinned = jax.vmap(per_grid)(
        ss["ztz"], ss["ztx"], ss["zty"], ss["xtx"], ss["xty"], ss["yty"], ns
    )
    return _assemble_outputs(
        spec, beta, cov, converged, boundary, tau2_hat, pinned
    )


def mixed_grid_stats(spec: SimSpec, arr: Dict, X, y, ids) -> Dict[str, jnp.ndarray]:
    """All LMM (REML) test statistics for one sim across the grid.

    Dispatch: random-intercept-only primary grouping -> 1-D golden section;
    primary random slopes -> q-dim Nelder-Mead theta search; any extra
    (crossed/nested) groupings -> the joint-Z capacitance path, which fits
    the FULL generated variance structure.
    """
    c = spec.cluster
    assert c is not None, "mle estimator requires a cluster spec"
    if c.extra_groupings:
        return _joint_grid_stats(spec, arr, X, y, ids)
    if c.slopes:
        return _slope_grid_stats(spec, arr, X, y, ids)
    m = c.n_clusters_at(spec.max_n)

    fit_cols = spec.effective_fit_cols
    pf = len(fit_cols)
    Xf = X[:, jnp.asarray(fit_cols)].astype(jnp.float64)
    yf = y.astype(jnp.float64)

    n_j_g, s_g, t_g, xtx_g, xty_g, yty_g, _ = _cluster_suffstats(
        spec, Xf, yf, ids, m
    )
    ns = jnp.asarray(spec.grid, dtype=jnp.float64)

    def per_grid(n_j, s, t, xtx, xty, yty, n):
        def dev_at(log_gamma):
            gamma = jnp.exp(log_gamma)
            dev, *_ = _reml_quantities(gamma, n_j, s, t, xtx, xty, yty, n, pf)
            return dev

        log_gamma_hat, _, _ = _brent_minimize(
            LOG_GAMMA_LO,
            LOG_GAMMA_HI,
            (),
            ((BRENT_ITERS, lambda lg, aux: (dev_at(lg), aux)),),
        )
        # Boundary pinning: compare the interior optimum against gamma = 0
        # (exact OLS limit); REML deviance is continuous there.
        dev_interior = dev_at(log_gamma_hat)
        dev_zero = dev_at(jnp.float64(LOG_GAMMA_LO))
        boundary = (dev_zero <= dev_interior + 1e-10) | (
            log_gamma_hat < BOUNDARY_LOG_GAMMA
        )
        # Upper-edge pin: the reference's boundary code 2 (τ̂ implausibly
        # large). Disjoint from the τ̂=0 pin by construction.
        boundary_hi = ~boundary & (log_gamma_hat > BOUNDARY_LOG_GAMMA_HI)
        log_gamma_eff = jnp.where(boundary, jnp.float64(LOG_GAMMA_LO), log_gamma_hat)
        gamma_hat = jnp.where(boundary, 0.0, jnp.exp(log_gamma_eff))

        dev, beta, chol, sigma2, rss = _reml_quantities(
            gamma_hat, n_j, s, t, xtx, xty, yty, n, pf
        )
        cov = sigma2 * smallchol.cho_inverse(chol)
        tau2_hat = gamma_hat * sigma2
        converged = (
            jnp.isfinite(dev)
            & jnp.all(jnp.isfinite(beta))
            & (sigma2 > 0.0)
            & smallchol.chol_rank_ok(chol)
        )
        # Single variance component: the pin vector is just the boundary bit.
        return beta, cov, converged, boundary, tau2_hat, boundary[None], boundary_hi

    # One traced copy of the whole REML search, vmapped over the grid axis —
    # keeps the XLA program size independent of grid length.
    beta, cov, converged, boundary, tau2_hat, pinned, boundary_hi = jax.vmap(
        per_grid
    )(n_j_g, s_g, t_g, xtx_g, xty_g, yty_g, ns)
    return _assemble_outputs(
        spec, beta, cov, converged, boundary, tau2_hat, pinned,
        boundary_hi=boundary_hi,
    )


def _assemble_outputs(
    spec: SimSpec, beta, cov, converged, boundary, tau2_hat, pinned,
    boundary_hi=None,
):
    """t^2 / omnibus / posthoc assembly shared by all LMM paths.

    ``pinned`` is the (G, n_components) per-component boundary-pin matrix in
    diagonal-theta order [intercept, slope_0, ..., extra_1, ...] — the
    reference's pinned_components bitmask (engine-core spec.rs:562-573),
    unpacked so the batch driver's bool reduction yields per-component
    counts. Masked to converged fits: the surfaced rates use the converged
    count as denominator (result.rs:360-386).

    ``boundary_hi`` (G,) bool marks the upper-edge variance pin — the
    reference's boundary code 2 (spec.rs:562-565), emitted only by the
    Brent intercept path; absent elsewhere (general-path parity).
    """
    out = {
        "t2": waldstats.t2_targets(spec, beta, cov),
        # Joint Wald chi^2 over all targets (the MLE omnibus,
        # batch.rs:1453-1473) for the marginal-target subvector.
        "overall": waldstats.overall_wald_chi2(spec, beta, cov),
        "converged": converged,
        "boundary_hit": boundary,
        "tau2_hat": tau2_hat,
        "pinned_comp": pinned & converged[:, None],
    }
    if boundary_hi is not None:
        out["boundary_hi"] = boundary_hi
    return waldstats.add_posthoc(out, spec, beta, cov)
