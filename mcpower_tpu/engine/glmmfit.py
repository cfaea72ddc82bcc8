"""Batched GLMM (random-intercept) via penalized IRLS + Laplace deviance.

The reference fits clustered binary/count models with the glmm crate's
Laplace/AGQ objective driven by BOBYQA (crates/engine-core/src/batch.rs
Mle/Glm-cluster arms). The TPU-native redesign keeps the same statistical
objective but restructures the optimization for lockstep batched execution:

* Inner loop (PIRLS): for fixed tau^2, the joint (beta, u) mode of the
  penalized likelihood. The random-intercept structure lets u be absorbed
  per cluster (u_i = c_i (t_i - s_i' beta), c_i = 1/(W_i + 1/tau^2)), so one
  PIRLS step is: elementwise weights/working-response -> per-cluster
  segment-sums -> a p x p Schur solve (the same Woodbury shape as the LMM
  suff-stats fit, but re-accumulated each iteration because weights move).
* Outer loop: fixed-iteration golden section over log tau^2 of the Laplace
  deviance at the inner mode
      dev(tau^2) = sum_ij dev_cond + sum_i u_i^2/tau^2 + sum_i log(1+tau^2 W_i)
  with (beta, u) warm-carried between evaluations.

Wald SEs use the Schur complement X'WX - sum_i c_i s_i s_i' at the mode —
the reference's "rx" fastmode (WaldSe::Rx, estimator.rs:47). The "hessian"
opt-in computes central finite differences of the mode-profiled Laplace
deviance in beta (cov = 2 H^-1), matching WaldSe::Hessian semantics, on
ALL three structures (intercept, slopes, crossed/nested extras).
Boundary fits pin tau^2 at the floor and flag ``boundary_hit``.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import smallchol, waldstats
from .glmfit import MU_EPS, _deviance, _link_funcs
from .mixedfit import (
    BOUNDARY_LOG_GAMMA,
    LOG_GAMMA_HI,
    LOG_GAMMA_LO,
    _brent_minimize,
)
from .spec import SimSpec

N_PIRLS = 12
# Two-phase Brent budget. While the bracket is WIDE each evaluation jumps
# log-tau2 by multiples, the carried (beta, u) is far from the new mode,
# and an under-converged PIRLS can flip a deviance comparison — the search
# discards intervals irrevocably, so early decisions get the full PIRLS
# budget. After BRENT_FULL_GLMM iterations the parabolic steps have
# collapsed onto the optimum's neighborhood; the carried mode is then a
# genuine warm start and N_PIRLS_WARM iterations re-converge it far below
# the deviance-comparison noise floor. On smooth interior Laplace optima
# ~10 Brent evaluations position log-tau2 to ~1e-7 (tests/test_brent.py),
# well inside the 1e-3 variance-component tolerance band
# (tolerances.R:41-47); 14 leaves margin. The cold starting eval, the
# boundary probe, and the final fit keep the full budget.
N_PIRLS_WARM = 5
BRENT_FULL_GLMM = 6
BRENT_ITERS_GLMM = 14

_LOG_2PI = 1.8378770664093453


def _fd_hessian_cov(dev_beta, beta, cov_fallback, h=1e-4):
    """FD Wald covariance: central differences of a profiled Laplace
    deviance in beta, cov = 2 H^-1 (dev = -2 loglik) — the reference's
    WaldSe::Hessian semantics (estimator.rs:47-84). The full central
    stencil (1 + 2p + 4·C(p,2) evaluations) is vmapped so the compiled
    program holds ONE dev_beta body regardless of p; falls back to the rx
    covariance when the FD covariance is non-finite."""
    pf = beta.shape[0]
    offs = [np.zeros(pf)]
    for i in range(pf):
        e = np.zeros(pf)
        e[i] = 1.0
        offs.extend([e, -e])
    pairs = [(i, j) for i in range(pf) for j in range(i + 1, pf)]
    for i, j in pairs:
        ei = np.zeros(pf)
        ei[i] = 1.0
        ej = np.zeros(pf)
        ej[j] = 1.0
        offs.extend([ei + ej, ei - ej, -ei + ej, -ei - ej])
    offs = jnp.asarray(np.array(offs), jnp.float64)
    vals = jax.vmap(lambda o: dev_beta(beta + h * o))(offs)
    f0 = vals[0]
    H = jnp.zeros((pf, pf), jnp.float64)
    for i in range(pf):
        H = H.at[i, i].set(
            (vals[1 + 2 * i] - 2.0 * f0 + vals[2 + 2 * i]) / (h * h)
        )
    base = 1 + 2 * pf
    for k, (i, j) in enumerate(pairs):
        hij = (
            vals[base + 4 * k]
            - vals[base + 4 * k + 1]
            - vals[base + 4 * k + 2]
            + vals[base + 4 * k + 3]
        ) / (4.0 * h * h)
        H = H.at[i, j].set(hij)
        H = H.at[j, i].set(hij)
    cholH = smallchol.chol(H + 1e-10 * jnp.eye(pf, dtype=jnp.float64))
    cov_h = 2.0 * smallchol.cho_inverse(cholH)
    return jnp.where(jnp.all(jnp.isfinite(cov_h)), cov_h, cov_fallback)


def _loglik_rows(outcome: str, link: str, y, eta):
    """Per-row conditional log-likelihood (constants kept for AGQ ratios)."""
    if outcome == "binary":
        if link == "probit":
            from . import rng as _rng

            mu = jnp.clip(_rng.norm_cdf(eta), MU_EPS, 1.0 - MU_EPS)
        else:
            mu = jnp.clip(jax.nn.sigmoid(eta), MU_EPS, 1.0 - MU_EPS)
        return y * jnp.log(mu) + (1.0 - y) * jnp.log(1.0 - mu)
    # poisson (log link); the y! constant cancels across nodes
    eta_c = jnp.clip(eta, -30.0, 30.0)
    return y * eta_c - jnp.exp(eta_c)


# Slope-path budgets: Nelder-Mead over theta = vech chol(D) with a
# fixed-iteration PIRLS inner solve per evaluation. The search threads
# one (beta, v) mode through the iterations (optim.nelder_mead_carry):
# all four candidates of an NM step start from the accepted mode of the
# previous step. While the simplex is WIDE, candidates sit far from the
# carried mode and get the full PIRLS budget; after NM_FULL_SLOPE steps
# the simplex has contracted around the optimum, the carry is a genuine
# warm start, and N_PIRLS_SLOPE_WARM iterations re-converge it below the
# f64 deviance-comparison noise floor — the slope-path analogue of the
# intercept search's two-phase schedule. The truth-started init simplex
# and the final accepted fit keep the full budget.
N_PIRLS_SLOPE = 8
N_PIRLS_SLOPE_WARM = 3
NM_ITERS_GLMM = 45
NM_FULL_SLOPE = 12


def glmm_grid_stats(spec: SimSpec, arr: Dict, X, y, ids) -> Dict[str, jnp.ndarray]:
    """All GLMM test statistics for one sim across the grid.

    Random-intercept structure takes the 1-D golden-section path; random
    slopes take the q-dimensional Nelder-Mead theta search (below) — the
    TPU reformulation of the glmm crate's Laplace + BOBYQA slope fits
    (crates/engine-core/src/mixed_workspace.rs:57-283).
    """
    if spec.cluster is not None and spec.cluster.extra_groupings:
        return _extras_glmm_grid_stats(spec, arr, X, y, ids)
    if spec.cluster is not None and spec.cluster.slopes:
        return _slope_glmm_grid_stats(spec, arr, X, y, ids)
    return _intercept_glmm_grid_stats(spec, arr, X, y, ids)


def _extras_glmm_grid_stats(
    spec: SimSpec, arr: Dict, X, y, ids
) -> Dict[str, jnp.ndarray]:
    """GLMM with crossed/nested extra groupings: joint-Z Laplace.

    The TPU reformulation of the glmm crate's unified multi-grouping core
    (the reference's engine fits binary/count designs with extra
    groupings through the same sparse machinery as its LMM ReStructure):
    u = Lam_all v over the stacked level-major grouping blocks — the SAME
    joint-Z layout the LMM extras path uses (mixedfit._build_joint_z /
    _lam_all) — with a penalized-IRLS mode solved through the M x M
    capacitance C = I + Lam' Z'WZ Lam and a p x p Schur solve for beta:

        v = C^-1 (Lam' Z'Wz - Lam' Z'WX beta)
        Laplace dev = dev_cond + |v|^2 + log det C

    The theta search is the batched fixed-iteration Nelder-Mead over the
    stacked vech-chol(D_g) (truth-started like every other arm). Wald SEs
    default to the rx Schur covariance; wald_se='hessian' computes FD of
    the v-profiled Laplace deviance through the capacitance solve. AGQ is
    structurally ineligible here (contract invariant 25).
    """
    from . import optim
    from .mixedfit import (
        _build_joint_z,
        _cap_factor_q1,
        _cap_logdet_q1,
        _cap_solve_cols_q1,
        _extras_scale_q1,
        _grouping_plan,
        _lam_all,
        _plan_all_q1,
        _theta_layout,
        _vech_to_lower,
    )

    fit_cols = spec.effective_fit_cols
    pf = len(fit_cols)
    Xf = X[:, jnp.asarray(fit_cols)].astype(jnp.float64)
    yf = y.astype(jnp.float64)
    plan = _grouping_plan(spec)
    M = sum(n_lv * q for n_lv, q, _, _, _ in plan)
    Z = _build_joint_z(spec, X, ids)  # (n, M)
    sizes, theta0, lower = _theta_layout(plan)
    rows = jnp.arange(spec.max_n)
    mu_var_dmu = _link_funcs(spec.outcome, spec.link)
    eye_p = 1e-10 * jnp.eye(pf, dtype=jnp.float64)
    eye_M = jnp.eye(M, dtype=jnp.float64)
    q1 = plan[0][1]

    if spec.scenario.truth_start:
        beta0 = arr["effects"].astype(jnp.float64)[jnp.asarray(fit_cols)]
    else:
        beta0 = jnp.zeros(pf, jnp.float64)
    v0 = jnp.zeros(M, jnp.float64)
    all_q1 = _plan_all_q1(plan)
    m1 = plan[0][0]

    def per_grid(n):
        mask = (rows < n).astype(jnp.float64)

        def _pirls_q1_arrs(Xq, yq, Zq, maskq, eyepq):
            """Structured-capacitance PIRLS for all-intercept-only plans
            (q_g == 1 everywhere): Lam = diag(d), each grouping's diagonal
            block of Z'WZ is diagonal, so the M x M solve collapses to
            elementwise primary-block ops + one extras-sized Schur chol
            (mixedfit._cap_factor_q1). One instance per dtype (f32 search
            twin / f64 final)."""
            dt = Xq.dtype

            def parts_of(lvec):
                l1 = lvec[0]
                dE = _extras_scale_q1(lvec, plan)
                return l1, dE, jnp.concatenate([jnp.full((m1,), l1, dt), dE])

            def step_quants(l1, dE, dfull, beta, v):
                eta = smallchol.rowmv(Xq, beta) + Zq @ (dfull * v)
                mu, var, dmu = mu_var_dmu(eta)
                w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * maskq
                wZ = Zq * w[:, None]
                G = Zq.T @ wZ
                fac = _cap_factor_q1(
                    l1, dE, jnp.diagonal(G[:m1, :m1]), G[:m1, m1:],
                    G[m1:, m1:],
                )
                return eta, mu, dmu, w, wZ, fac

            def loop(lvec, beta, v, iters):
                l1, dE, dfull = parts_of(lvec.astype(dt))

                def body(_, carry):
                    beta, v = carry
                    eta, mu, dmu, w, wZ, (a, Cpe, cholS) = step_quants(
                        l1, dE, dfull, beta, v
                    )
                    z = eta + (yq - mu) / dmu
                    At = dfull[:, None] * (wZ.T @ Xq)
                    bt = dfull * (wZ.T @ z)
                    xp, xe = _cap_solve_cols_q1(
                        a, Cpe, cholS,
                        jnp.concatenate([bt[:m1, None], At[:m1]], axis=1),
                        jnp.concatenate([bt[m1:, None], At[m1:]], axis=1),
                        pf + 1,
                    )
                    sol_b = jnp.concatenate([xp[..., 0], xe[..., 0]])
                    sol_A = jnp.concatenate(
                        [xp[..., 1:], xe[..., 1:]], axis=0
                    )
                    a_xx = smallchol.crossprod(Xq, w) - At.T @ sol_A + eyepq
                    a_xy = smallchol.colsum(Xq, w * z) - At.T @ sol_b
                    cholP = smallchol.chol(a_xx)
                    beta_new = smallchol.cho_solve(cholP, a_xy)
                    v_new = sol_b - sol_A @ beta_new
                    ok = jnp.all(jnp.isfinite(beta_new)) & jnp.all(
                        jnp.isfinite(v_new)
                    )
                    return (
                        jnp.where(ok, beta_new, beta),
                        jnp.where(ok, v_new, v),
                    )

                return jax.lax.fori_loop(0, iters, body, (beta, v))

            def mode(lvec, beta, v, want_schur):
                l1, dE, dfull = parts_of(lvec.astype(dt))
                eta, mu, dmu, w, wZ, (a, Cpe, cholS) = step_quants(
                    l1, dE, dfull, beta, v
                )
                lap = (
                    _deviance(spec.outcome, yq, mu, maskq)
                    + jnp.sum(v * v)
                    + _cap_logdet_q1(a, cholS)
                )
                if not want_schur:
                    return lap, None
                At = dfull[:, None] * (wZ.T @ Xq)
                xpA, xeA = _cap_solve_cols_q1(
                    a, Cpe, cholS, At[:m1], At[m1:], pf
                )
                sol_A = jnp.concatenate([xpA, xeA], axis=0)
                a_xx = smallchol.crossprod(Xq, w) - At.T @ sol_A + eyepq
                return lap, a_xx

            return loop, mode

        def pirls(Lam, beta, v, iters, want_schur=True):
            def body(_, carry):
                beta, v = carry
                eta = smallchol.rowmv(Xf, beta) + Z @ (Lam @ v)
                mu, var, dmu = mu_var_dmu(eta)
                w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask
                z = eta + (yf - mu) / dmu
                wZ = Z * w[:, None]
                # M x M capacitance: blocked-column Cholesky twins (the
                # scalar unroll's program size at M ~ 30 OOMs the TPU
                # compile helper — see smallchol.chol_vec)
                C = eye_M + Lam.T @ (Z.T @ wZ) @ Lam
                cholC = smallchol.chol_vec(C)
                At = Lam.T @ (wZ.T @ Xf)  # (M, p)
                bt = Lam.T @ (wZ.T @ z)  # (M,)
                # one joint [b | A] solve: halves the substitution chains
                sol = smallchol.cho_solve_mat_vec(
                    cholC, jnp.concatenate([bt[:, None], At], axis=-1)
                )
                sol_b, sol_A = sol[..., 0], sol[..., 1:]
                a_xx = smallchol.crossprod(Xf, w) - At.T @ sol_A + eye_p
                a_xy = smallchol.colsum(Xf, w * z) - At.T @ sol_b
                cholP = smallchol.chol(a_xx)
                beta_new = smallchol.cho_solve(cholP, a_xy)
                v_new = sol_b - sol_A @ beta_new
                ok = jnp.all(jnp.isfinite(beta_new)) & jnp.all(
                    jnp.isfinite(v_new)
                )
                return (
                    jnp.where(ok, beta_new, beta),
                    jnp.where(ok, v_new, v),
                )

            beta, v = jax.lax.fori_loop(0, iters, body, (beta, v))
            # Mode-state quantities at the converged (beta, v). The search
            # phase consumes only the deviance, so the (M, p) Schur-block
            # recompute is skipped there (want_schur=False) and done once
            # at the accepted optimum — same plan as the slope path.
            eta = smallchol.rowmv(Xf, beta) + Z @ (Lam @ v)
            mu, var, dmu = mu_var_dmu(eta)
            w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask
            wZ = Z * w[:, None]
            C = eye_M + Lam.T @ (Z.T @ wZ) @ Lam
            cholC = smallchol.chol_vec(C)
            lap = (
                _deviance(spec.outcome, yf, mu, mask)
                + jnp.sum(v * v)
                + smallchol.logdet_from_chol(cholC)
            )
            if not want_schur:
                return beta, v, lap, None
            At = Lam.T @ (wZ.T @ Xf)
            sol_A = smallchol.cho_solve_mat_vec(cholC, At)
            a_xx = smallchol.crossprod(Xf, w) - At.T @ sol_A + eye_p
            return beta, v, lap, a_xx

        # Warm-carried search (the slope path's proven execution plan):
        # every candidate evaluation starts PIRLS from the mode ACCEPTED by
        # the previous Nelder-Mead iteration; after the full-budget phase
        # the contracted simplex makes the carry a genuine warm start and
        # the short-budget phase re-converges it. As on the slope path the
        # SEARCH iteration state runs in f32 — the M x M capacitance chain
        # is emulated-f64-bound on TPU otherwise (the all-f64 LMM twin of
        # this search measured 43.7 fits/s, round 3) — while the deviance
        # consumed by the NM comparisons is recomputed in f64 from each
        # candidate's final mode.
        f32 = jnp.float32
        Xf32, yf32, Z32 = Xf.astype(f32), yf.astype(f32), Z.astype(f32)
        mask32 = mask.astype(f32)
        eye_M32 = jnp.eye(M, dtype=f32)
        eye_p32 = 1e-6 * jnp.eye(pf, dtype=f32)

        def pirls_loop32(Lam32, beta, v, iters):
            # Blocked-column kernels in the search body: DUS-free M x M
            # chol/solves (smallchol blocked twins). The measured
            # alternatives both lost: the scalar-lane unroll compiled for
            # >45 min (program size), and the round-3 per-column DUS twins
            # paid O(M) full-accumulator copies per PIRLS step inside this
            # loop (the round-3 137 fits/s diagnosis).
            def body(_, carry):
                beta, v = carry
                eta = smallchol.rowmv(Xf32, beta) + Z32 @ (Lam32 @ v)
                mu, var, dmu = mu_var_dmu(eta)
                w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask32
                z = eta + (yf32 - mu) / dmu
                wZ = Z32 * w[:, None]
                C = eye_M32 + Lam32.T @ (Z32.T @ wZ) @ Lam32
                At = Lam32.T @ (wZ.T @ Xf32)
                bt = Lam32.T @ (wZ.T @ z)
                cholC = smallchol.chol_vec(C)
                sol = smallchol.cho_solve_mat_vec(
                    cholC, jnp.concatenate([bt[:, None], At], axis=-1)
                )
                sol_b, sol_A = sol[..., 0], sol[..., 1:]
                a_xx = smallchol.crossprod(Xf32, w) - At.T @ sol_A + eye_p32
                a_xy = smallchol.colsum(Xf32, w * z) - At.T @ sol_b
                cholP = smallchol.chol(a_xx)
                beta_new = smallchol.cho_solve(cholP, a_xy)
                v_new = sol_b - sol_A @ beta_new
                ok = jnp.all(jnp.isfinite(beta_new)) & jnp.all(
                    jnp.isfinite(v_new)
                )
                return (
                    jnp.where(ok, beta_new, beta),
                    jnp.where(ok, v_new, v),
                )

            return jax.lax.fori_loop(0, iters, body, (beta, v))

        def dev32_at(Lam32, beta, v):
            # Deviance for candidate RANKING, entirely f32: differences
            # between candidates near convergence are O(0.01-1) against a
            # deviance of O(10^3) — comfortably above f32 resolution, and
            # the LMM joint search already ranks in pure f32 with parity
            # suites green. An f64 pass here costs full-data f64 matmuls
            # per candidate (measured: it held glmm_extras to 65 fits/s).
            eta = smallchol.rowmv(Xf32, beta) + Z32 @ (Lam32 @ v)
            mu, var, dmu = mu_var_dmu(eta)
            wZ = Z32 * (
                (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask32
            )[:, None]
            C = eye_M32 + Lam32.T @ (Z32.T @ wZ) @ Lam32
            return (
                _deviance(spec.outcome, yf32, mu, mask32)
                + jnp.sum(v * v)
                + smallchol.logdet_from_chol(smallchol.chol_vec(C))
            )

        if all_q1:
            loop64, mode64 = _pirls_q1_arrs(Xf, yf, Z, mask, eye_p)
            loop32, mode32 = _pirls_q1_arrs(Xf32, yf32, Z32, mask32, eye_p32)

            def search_eval(theta, carry, iters):
                th = theta.astype(f32)
                beta32, v32 = loop32(th, carry[0], carry[1], iters)
                lap, _ = mode32(th, beta32, v32, False)
                lap = lap.astype(jnp.float64)
                return (
                    jnp.where(jnp.isfinite(lap), lap, jnp.float64(1e30)),
                    (beta32, v32),
                )

        else:

            def search_eval(theta, carry, iters):
                Lam = _lam_all(theta, plan, sizes, M)
                Lam32 = Lam.astype(f32)
                beta32, v32 = pirls_loop32(Lam32, carry[0], carry[1], iters)
                lap = dev32_at(Lam32, beta32, v32).astype(jnp.float64)
                return (
                    jnp.where(jnp.isfinite(lap), lap, jnp.float64(1e30)),
                    (beta32, v32),
                )

        # Blocked-column kernels at every site (the measured scalar-lane
        # twin compiled for >45 min on both backends — reverted; see the
        # mixedfit note). dynamic_budget keeps ONE traced body across the
        # two budget phases, halving even the blocked-form body count.
        # Search-length scales with theta dimension (round 5): the shared
        # 45-iteration budget was sized for the q>=2 slope searches; the
        # common intercepts-only extras plan has d_theta = n_groupings
        # (2-3), where a truth-started simplex contracts in far fewer
        # iterations — 30 for d <= 3 measured indistinguishable on the
        # parity suites while each saved iteration is 4 full PIRLS chains.
        d_theta = int(theta0.shape[0])
        nm_total = 30 if d_theta <= 3 else NM_ITERS_GLMM
        theta_hat, _, _ = optim.nelder_mead_carry(
            search_eval,
            theta0,
            (beta0.astype(f32), v0.astype(f32)),
            phases=(
                (NM_FULL_SLOPE, N_PIRLS_SLOPE),
                (nm_total - NM_FULL_SLOPE, N_PIRLS_SLOPE_WARM),
            ),
            init_step=0.2,
            lower=lower,
            dynamic_budget=True,
        )
        Lam = _lam_all(theta_hat, plan, sizes, M)
        if all_q1:
            beta, v = loop64(theta_hat, beta0, v0, N_PIRLS)
            lap, a_xx = mode64(theta_hat, beta, v, True)
        else:
            beta, v, lap, a_xx = pirls(Lam, beta0, v0, N_PIRLS)
        cholP = smallchol.chol(a_xx)
        cov = smallchol.cho_inverse(cholP)
        if spec.wald_se == "hessian":
            # FD of the v-profiled joint-Z Laplace deviance at the PIRLS
            # beta: v re-optimized at fixed beta through the M x M
            # capacitance solve, dev = dev_cond + |v|^2 + logdet C.
            def dev_beta(beta_q):
                fixed = smallchol.rowmv(Xf, beta_q)

                def vbody(_, v_q):
                    eta = fixed + Z @ (Lam @ v_q)
                    mu, var, dmu = mu_var_dmu(eta)
                    w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask
                    z = eta + (yf - mu) / dmu
                    wZ = Z * w[:, None]
                    C = eye_M + Lam.T @ (Z.T @ wZ) @ Lam
                    rhs = Lam.T @ (wZ.T @ (z - fixed))
                    v_new = smallchol.cho_solve_vec(smallchol.chol_vec(C), rhs)
                    ok = jnp.all(jnp.isfinite(v_new))
                    return jnp.where(ok, v_new, v_q)

                v_q = jax.lax.fori_loop(0, 20, vbody, v)
                eta = fixed + Z @ (Lam @ v_q)
                mu, var, dmu = mu_var_dmu(eta)
                w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask
                wZ = Z * w[:, None]
                C = eye_M + Lam.T @ (Z.T @ wZ) @ Lam
                return (
                    _deviance(spec.outcome, yf, mu, mask)
                    + jnp.sum(v_q * v_q)
                    + smallchol.logdet_from_chol(smallchol.chol_vec(C))
                )

            cov = _fd_hessian_cov(dev_beta, beta, cov)
        Lg1 = _vech_to_lower(theta_hat[: sizes[0]], q1)
        tau2_hat = (Lg1 @ Lg1.T)[0, 0]
        # per-component pins across ALL groupings (primary components
        # first, then each extra grouping's), matching the LMM joint path
        diag_entries = []
        off = 0
        for (_, q, _, _, _), sz in zip(plan, sizes):
            Lg = _vech_to_lower(theta_hat[off : off + sz], q)
            diag_entries.append(jnp.diagonal(Lg))
            off += sz
        pinned = jnp.concatenate(diag_entries) < 1e-3
        boundary = jnp.any(pinned)
        converged = (
            jnp.all(jnp.isfinite(beta))
            & smallchol.chol_ok(cholP)
            # rank probe on the unridged Schur complement (see smallchol.rank_ok)
            & smallchol.rank_ok(a_xx - eye_p)
            & jnp.isfinite(lap)
        )
        ybar = jnp.sum(yf * (rows < n)) / jnp.asarray(n, jnp.float64)
        return beta, cov, converged, boundary, tau2_hat, ybar, pinned

    beta, cov, converged, boundary, tau2_hat, ybar, pinned = jax.vmap(per_grid)(
        jnp.asarray(spec.grid, jnp.int32)
    )
    out = {
        "t2": waldstats.t2_targets(spec, beta, cov),
        "overall": waldstats.overall_wald_chi2(spec, beta, cov),
        "converged": converged,
        "boundary_hit": boundary,
        "singular": boundary,
        "tau2_hat": tau2_hat,
        "glm_baseline": ybar,
        "pinned_comp": pinned & converged[:, None],
    }
    return waldstats.add_posthoc(out, spec, beta, cov)


def _slope_glmm_grid_stats(
    spec: SimSpec, arr: Dict, X, y, ids
) -> Dict[str, jnp.ndarray]:
    """GLMM with primary-grouping random slopes: Laplace deviance over the
    spherical reparameterization u = Lam v, v ~ N(0, I) (lme4's theta
    trick, robust at the D-singular boundary).

    One PIRLS step at fixed Lam: elementwise weights/working response ->
    per-cluster (q,q)/(q,p)/(q,) blocks -> q x q Cholesky per cluster ->
    p x p Schur solve for beta -> per-cluster mode update
        v_i = C_i^-1 (Lam'b_i - Lam'A_i beta),  C_i = I + Lam'G_i Lam.
    Laplace deviance at the mode:
        dev = dev_cond + sum_i |v_i|^2 + sum_i log det C_i.
    The outer theta search is the batched fixed-iteration Nelder-Mead
    with a warm-carried (beta, v) mode and two-phase PIRLS budgets
    (engine.optim.nelder_mead_carry), truth-started at vech chol(D_true);
    AGQ is intercept-only (lme4 parity), so nagq is ignored here.
    """
    from . import optim
    from .mixedfit import _vech_to_lower

    c = spec.cluster
    m = c.n_clusters_at(spec.max_n)
    q = c.q
    fit_cols = spec.effective_fit_cols
    pf = len(fit_cols)
    Xf = X[:, jnp.asarray(fit_cols)].astype(jnp.float64)
    yf = y.astype(jnp.float64)
    Zf = jnp.concatenate(
        [
            jnp.ones((spec.max_n, 1), jnp.float64),
            X[:, jnp.asarray([s.design_col for s in c.slopes])].astype(
                jnp.float64
            ),
        ],
        axis=1,
    )
    rows = jnp.arange(spec.max_n)
    mu_var_dmu = _link_funcs(spec.outcome, spec.link)
    eye_p = 1e-10 * jnp.eye(pf, dtype=jnp.float64)
    eye_q = jnp.eye(q, dtype=jnp.float64)

    from . import clusterops

    # Row-first segment sums / broadcasts over the static cluster layout
    # (reshape reductions instead of one-hot matmuls — engine.clusterops).
    def seg_rows(x):  # (n, ...) -> (m, ...)
        return jnp.moveaxis(
            clusterops.seg_sum(spec, jnp.moveaxis(x, 0, -1)), -1, 0
        )

    def rows_of(v):  # (m, ...) -> (n, ...)
        return jnp.moveaxis(
            clusterops.per_row(spec, jnp.moveaxis(v, 0, -1), spec.max_n),
            -1, 0,
        )

    if spec.scenario.truth_start:
        beta0 = arr["effects"].astype(jnp.float64)[jnp.asarray(fit_cols)]
    else:
        beta0 = jnp.zeros(pf, jnp.float64)

    # Truth-start theta and elementwise lower bounds (chol diagonal >= 0),
    # the same single-factor RE correlation model the generator uses.
    taus = np.sqrt(
        [max(c.tau_squared, 1e-4)] + [max(s.variance, 1e-4) for s in c.slopes]
    )
    corr = np.eye(q)
    for i, s in enumerate(c.slopes):
        corr[0, 1 + i] = corr[1 + i, 0] = s.intercept_corr
    for i, si in enumerate(c.slopes):
        for j, sj in enumerate(c.slopes):
            if i != j:
                corr[1 + i, 1 + j] = si.intercept_corr * sj.intercept_corr
    D0 = np.outer(taus, taus) * corr
    L0 = np.linalg.cholesky(D0 + 1e-10 * np.eye(q))
    theta0 = jnp.asarray(
        np.concatenate([L0[j:, j] for j in range(q)]), jnp.float64
    )
    lower = jnp.asarray(
        [0.0 if i == j else -np.inf for j in range(q) for i in range(j, q)],
        jnp.float64,
    )

    def per_grid(n):
        mask = (rows < n).astype(jnp.float64)

        def make_pirls(dtype):
            """q-dim PIRLS at the given state precision. As in the
            intercept path, the f32 twin serves the theta SEARCH only —
            iteration state runs in f32 (f64 transcendentals are emulated
            on TPU and dominate), while the returned Laplace deviance and
            Schur block are recomputed in f64 from the final mode."""
            Xd = Xf.astype(dtype)
            yd = yf.astype(dtype)
            Zd = Zf.astype(dtype)
            md = mask.astype(dtype)
            eye_pd = (1e-10 if dtype == jnp.float64 else 1e-6) * jnp.eye(
                pf, dtype=dtype
            )
            eye_qd = jnp.eye(q, dtype=dtype)

            def loop(Ld, beta, v, iters):
                def body(_, carry):
                    beta, v = carry
                    u = (v[:, None, :] * Ld[None, :, :]).sum(-1)  # v @ Ld.T
                    eta = smallchol.rowmv(Xd, beta) + jnp.einsum(
                        "nq,nq->n", Zd, rows_of(u)
                    )
                    mu, var, dmu = mu_var_dmu(eta)
                    w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * md
                    z = eta + (yd - mu) / dmu
                    wZ = Zd * w[:, None]
                    G = seg_rows(wZ[:, :, None] * Zd[:, None, :])  # (m,q,r)
                    A = seg_rows(wZ[:, :, None] * Xd[:, None, :])  # (m,q,p)
                    b = seg_rows(wZ * z[:, None])  # (m, q)
                    LtG = (Ld[None, :, :, None] * G[:, :, None, :]).sum(1)
                    C = eye_qd[None] + (
                        LtG[:, :, :, None] * Ld[None, None, :, :]
                    ).sum(2)
                    cholC = smallchol.chol(C)
                    At = (Ld[None, :, :, None] * A[:, :, None, :]).sum(1)
                    bt = (Ld[None, :, :] * b[:, :, None]).sum(1)
                    sol_b = smallchol.cho_solve(cholC, bt)  # (m, q)
                    sol_A = jax.vmap(
                        lambda ch, aa: jax.vmap(
                            lambda col: smallchol.cho_solve(ch, col)
                        )(aa.T).T
                    )(cholC, At)  # (m, q, p)
                    a_xx = (
                        smallchol.crossprod(Xd, w)
                        - (At[:, :, :, None] * sol_A[:, :, None, :]).sum((0, 1))
                        + eye_pd
                    )
                    a_xy = smallchol.colsum(Xd, w * z) - (
                        At * sol_b[:, :, None]
                    ).sum((0, 1))
                    cholP = smallchol.chol(a_xx)
                    beta_new = smallchol.cho_solve(cholP, a_xy)
                    v_new = sol_b - (sol_A * beta_new[None, None, :]).sum(-1)
                    ok = jnp.all(jnp.isfinite(beta_new)) & jnp.all(
                        jnp.isfinite(v_new)
                    )
                    return (
                        jnp.where(ok, beta_new, beta),
                        jnp.where(ok, v_new, v),
                    )

                return jax.lax.fori_loop(0, iters, body, (beta, v))

            def pirls(Lam, beta, v, iters):
                beta, v = loop(Lam.astype(dtype), beta, v, iters)

                # Mode-state quantities in f64 (weights/logdet/Schur).
                beta = beta.astype(jnp.float64)
                v = v.astype(jnp.float64)
                u = (v[:, None, :] * Lam[None, :, :]).sum(-1)  # v @ Lam.T
                eta = smallchol.rowmv(Xf, beta) + jnp.einsum(
                    "nq,nq->n", Zf, rows_of(u)
                )
                mu, var, dmu = mu_var_dmu(eta)
                w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask
                wZ = Zf * w[:, None]
                G = seg_rows(wZ[:, :, None] * Zf[:, None, :])
                A = seg_rows(wZ[:, :, None] * Xf[:, None, :])
                LtG = (Lam[None, :, :, None] * G[:, :, None, :]).sum(1)
                C = eye_q[None] + (
                    LtG[:, :, :, None] * Lam[None, None, :, :]
                ).sum(2)
                cholC = smallchol.chol(C)
                At = (Lam[None, :, :, None] * A[:, :, None, :]).sum(1)
                sol_A = jax.vmap(
                    lambda ch, aa: jax.vmap(
                        lambda col: smallchol.cho_solve(ch, col)
                    )(aa.T).T
                )(cholC, At)
                a_xx = (
                    smallchol.crossprod(Xf, w)
                    - (At[:, :, :, None] * sol_A[:, :, None, :]).sum((0, 1))
                    + eye_p
                )
                dev_cond = _deviance(spec.outcome, yf, mu, mask)
                laplace = (
                    dev_cond
                    + jnp.sum(v * v)
                    + jnp.sum(smallchol.logdet_from_chol(cholC))
                )
                return beta, v, laplace, a_xx

            return loop, pirls

        loop64, pirls = make_pirls(jnp.float64)
        loop32, _ = make_pirls(jnp.float32)
        v0 = jnp.zeros((m, q), jnp.float64)
        v0_32 = jnp.zeros((m, q), jnp.float32)
        beta0_32 = beta0.astype(jnp.float32)

        def dev_tail(dtype):
            """Deviance-only pass at a PIRLS mode (no Schur-block work)."""
            Xd = Xf.astype(dtype)
            yd = yf.astype(dtype)
            Zd = Zf.astype(dtype)
            md = mask.astype(dtype)
            eye_qd = jnp.eye(q, dtype=dtype)

            def tail(Lam, beta, v):
                u = (v[:, None, :] * Lam[None, :, :]).sum(-1)
                eta = smallchol.rowmv(Xd, beta) + jnp.einsum(
                    "nq,nq->n", Zd, rows_of(u)
                )
                mu, var, dmu = mu_var_dmu(eta)
                w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * md
                wZ = Zd * w[:, None]
                G = seg_rows(wZ[:, :, None] * Zd[:, None, :])
                LtG = (Lam[None, :, :, None] * G[:, :, None, :]).sum(1)
                C = eye_qd[None] + (
                    LtG[:, :, :, None] * Lam[None, None, :, :]
                ).sum(2)
                cholC = smallchol.chol(C)
                return (
                    _deviance(spec.outcome, yd, mu, md)
                    + jnp.sum(v * v)
                    + jnp.sum(smallchol.logdet_from_chol(cholC))
                )

            return tail

        dev_tail32 = dev_tail(jnp.float32)
        dev_tail64 = dev_tail(jnp.float64)

        # Search-phase evaluator: f32 PIRLS state from the CARRIED mode and
        # — since round 5 — f32 candidate RANKING too (the extras path's
        # measured plan: one f64 full-data deviance pass per candidate is
        # emulated-transcendental-bound on TPU and dominated each eval;
        # candidate differences near convergence are O(0.01-1) against a
        # deviance of O(1e2-1e3), above f32 resolution). The accepted
        # optimum, final fit, and pin probes stay f64. The (m,q,p)
        # Schur-block work is still skipped in the search entirely.
        def search_eval(theta, carry, iters):
            Lam32 = _vech_to_lower(theta, q).astype(jnp.float32)
            beta, v = loop32(Lam32, carry[0], carry[1], iters)
            lap = dev_tail32(Lam32, beta, v).astype(jnp.float64)
            lap = jnp.where(jnp.isfinite(lap), lap, jnp.float64(1e30))
            return lap, (beta, v)

        theta_hat, _, _ = optim.nelder_mead_carry(
            search_eval,
            theta0,
            (beta0_32, v0_32),
            phases=(
                (NM_FULL_SLOPE, N_PIRLS_SLOPE),
                (NM_ITERS_GLMM - NM_FULL_SLOPE, N_PIRLS_SLOPE_WARM),
            ),
            init_step=0.2,
            lower=lower,
        )
        Lam = _vech_to_lower(theta_hat, q)
        beta, v, lap, a_xx = pirls(Lam, beta0, v0, N_PIRLS)
        cholP = smallchol.chol(a_xx)
        cov = smallchol.cho_inverse(cholP)
        if spec.wald_se == "hessian":
            # FD of the v-profiled Laplace deviance at the PIRLS beta (same
            # convention as the intercept path): per evaluation the modes v
            # are re-optimized at fixed beta by a v-only PIRLS (per-cluster
            # q x q capacitance solves), then dev = dev_cond + |v|^2 +
            # sum_i logdet C_i at Lam(theta-hat).
            def dev_beta(beta_q):
                fixed = smallchol.rowmv(Xf, beta_q)

                def vbody(_, v_q):
                    u = (v_q[:, None, :] * Lam[None, :, :]).sum(-1)
                    eta = fixed + jnp.einsum("nq,nq->n", Zf, rows_of(u))
                    mu, var, dmu = mu_var_dmu(eta)
                    w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask
                    z = eta + (yf - mu) / dmu
                    wZ = Zf * w[:, None]
                    G = seg_rows(wZ[:, :, None] * Zf[:, None, :])
                    r = seg_rows(wZ * (z - fixed)[:, None])  # Z'W(z - Xb)
                    LtG = (Lam[None, :, :, None] * G[:, :, None, :]).sum(1)
                    C = eye_q[None] + (
                        LtG[:, :, :, None] * Lam[None, None, :, :]
                    ).sum(2)
                    rhs = jnp.einsum("ab,ma->mb", Lam, r)  # Lam' r
                    v_new = smallchol.cho_solve(smallchol.chol(C), rhs)
                    ok = jnp.all(jnp.isfinite(v_new))
                    return jnp.where(ok, v_new, v_q)

                v_q = jax.lax.fori_loop(0, 20, vbody, v)
                u = (v_q[:, None, :] * Lam[None, :, :]).sum(-1)
                eta = fixed + jnp.einsum("nq,nq->n", Zf, rows_of(u))
                mu, var, dmu = mu_var_dmu(eta)
                w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask
                wZ = Zf * w[:, None]
                G = seg_rows(wZ[:, :, None] * Zf[:, None, :])
                LtG = (Lam[None, :, :, None] * G[:, :, None, :]).sum(1)
                C = eye_q[None] + (
                    LtG[:, :, :, None] * Lam[None, None, :, :]
                ).sum(2)
                return (
                    _deviance(spec.outcome, yf, mu, mask)
                    + jnp.sum(v_q * v_q)
                    + jnp.sum(smallchol.logdet_from_chol(smallchol.chol(C)))
                )

            cov = _fd_hessian_cov(dev_beta, beta, cov)
        D_hat = Lam @ Lam.T
        tau2_hat = D_hat[0, 0]
        # Per-component pins [intercept, slope_0, ...] by explicit f64
        # ZERO PROBES (the LMM slope path's round-5 semantics): f32
        # candidate ranking lets the simplex park O(1e-2) off a flat
        # null-variance boundary, so a diag threshold under-fires. Each
        # probe re-solves the mode at theta with that chol COLUMN zeroed
        # (warm-started from the accepted mode, short budget); costing no
        # deviance means the component is pinned.
        d_theta = q * (q + 1) // 2
        probes = []
        for j in range(q):
            cz = np.ones(d_theta)
            off = sum(q - c for c in range(j))
            cz[off : off + (q - j)] = 0.0
            Lam_j = _vech_to_lower(
                theta_hat * jnp.asarray(cz, jnp.float64), q
            )
            bj, vj = loop64(Lam_j, beta, v, N_PIRLS_SLOPE_WARM)
            probes.append(dev_tail64(Lam_j, bj, vj))
        pinned = jnp.stack(probes) <= lap + 1e-10
        boundary = jnp.any(pinned)
        converged = (
            jnp.all(jnp.isfinite(beta))
            & smallchol.chol_ok(cholP)
            # rank probe on the unridged Schur complement (see smallchol.rank_ok)
            & smallchol.rank_ok(a_xx - eye_p)
            & jnp.isfinite(lap)
        )
        ybar = jnp.sum(yf * (rows < n)) / jnp.asarray(n, jnp.float64)
        return beta, cov, converged, boundary, tau2_hat, ybar, pinned

    beta, cov, converged, boundary, tau2_hat, ybar, pinned = jax.vmap(per_grid)(
        jnp.asarray(spec.grid, jnp.int32)
    )
    out = {
        "t2": waldstats.t2_targets(spec, beta, cov),
        "overall": waldstats.overall_wald_chi2(spec, beta, cov),
        "converged": converged,
        "boundary_hit": boundary,
        "singular": boundary,
        "tau2_hat": tau2_hat,
        "glm_baseline": ybar,
        "pinned_comp": pinned & converged[:, None],
    }
    return waldstats.add_posthoc(out, spec, beta, cov)


def _intercept_glmm_grid_stats(
    spec: SimSpec, arr: Dict, X, y, ids
) -> Dict[str, jnp.ndarray]:
    """Random-intercept GLMM (golden-section over log tau^2)."""
    from . import clusterops

    c = spec.cluster
    m = c.n_clusters_at(spec.max_n)
    fit_cols = spec.effective_fit_cols
    pf = len(fit_cols)
    max_n = spec.max_n
    Xf = X[:, jnp.asarray(fit_cols)].astype(jnp.float64)
    yf = y.astype(jnp.float64)
    rows = jnp.arange(spec.max_n)
    mu_var_dmu = _link_funcs(spec.outcome, spec.link)
    eye = 1e-10 * jnp.eye(pf, dtype=jnp.float64)

    # Per-cluster sums ride the STATIC row layout (reshape reductions, not
    # one-hot matmuls — see engine.clusterops); u[ids] is a tile/repeat.
    def seg(x):
        return clusterops.seg_sum(spec, x)

    def seg_cols(xnp):  # (n, p) -> (m, p)
        return clusterops.seg_sum(spec, xnp.T).T

    def urow(u):
        return clusterops.per_row(spec, u, max_n)

    if spec.scenario.truth_start:
        beta0 = arr["effects"].astype(jnp.float64)[jnp.asarray(fit_cols)]
    else:
        beta0 = jnp.zeros(pf, jnp.float64)

    def per_grid(n):
        mask = (rows < n).astype(jnp.float64)
        n_per = seg(mask)  # rows per cluster at this N
        active = n_per > 0

        def make_pirls(dtype):
            """PIRLS inner solver at the given state precision.

            f64 is the fit/SE path. The f32 twin serves the variance
            SEARCH only: TPU f64 is double-double emulation and the
            recurring exp/log over the (sims x rows) plane dominates the
            GLMM arm (see ARCHITECTURE.md "Performance notes"), so search
            evaluations run their state math in f32. The returned Laplace
            deviance is always computed in f64 FROM the final mode (one
            f64 elementwise pass per evaluation — 1/iters of the chain),
            so deviance comparisons resolve differences ~1e-5, far below
            the 1e-3 variance-component tolerance band."""
            Xd = Xf.astype(dtype)
            yd = yf.astype(dtype)
            md = mask.astype(dtype)
            ridge = (1e-10 if dtype == jnp.float64 else 1e-6)
            eyed = ridge * jnp.eye(pf, dtype=dtype)

            def pirls(tau2, beta, u, iters):
                inv_tau2 = 1.0 / jnp.maximum(tau2, 1e-12)
                inv_tau2_d = jnp.asarray(inv_tau2, dtype)

                def body(_, carry):
                    beta, u = carry
                    eta = smallchol.rowmv(Xd, beta) + urow(u)
                    mu, var, dmu = mu_var_dmu(eta)
                    w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * md
                    z = eta + (yd - mu) / dmu  # full working response
                    W_i = seg(w)  # (m,)
                    s_i = seg_cols(w[:, None] * Xd)  # (m, p)
                    t_i = seg(w * z)  # (m,)
                    c_i = jnp.where(active, 1.0 / (W_i + inv_tau2_d), 0.0)
                    a_xx = (
                        smallchol.crossprod(Xd, w)
                        - smallchol.wouter(c_i, s_i)
                        + eyed
                    )
                    a_xy = smallchol.colsum(Xd, w * z) - smallchol.wvec(
                        c_i, s_i, t_i
                    )
                    chol = smallchol.chol(a_xx)
                    beta_new = smallchol.cho_solve(chol, a_xy)
                    u_new = c_i * (t_i - smallchol.rowmv(s_i, beta_new))
                    ok = jnp.all(jnp.isfinite(beta_new)) & jnp.all(
                        jnp.isfinite(u_new)
                    )
                    return (
                        jnp.where(ok, beta_new, beta),
                        jnp.where(ok, u_new, u),
                    )

                beta, u = jax.lax.fori_loop(0, iters, body, (beta, u))
                # final state quantities at the mode — deviance in f64
                u64 = u.astype(jnp.float64)
                eta = smallchol.rowmv(Xf, beta.astype(jnp.float64)) + urow(u64)
                mu, var, dmu = mu_var_dmu(eta)
                w = (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask
                W_i = seg(w)
                dev_cond = _deviance(spec.outcome, yf, mu, mask)
                laplace = (
                    dev_cond
                    + jnp.sum(jnp.where(active, u64 * u64, 0.0)) * inv_tau2
                    + jnp.sum(jnp.where(active, jnp.log1p(tau2 * W_i), 0.0))
                )
                return beta, u, w, W_i, laplace

            return pirls

        pirls = make_pirls(jnp.float64)
        pirls32 = make_pirls(jnp.float32)

        # Adaptive Gauss-Hermite nodes (physicists' convention, weight
        # e^{-x^2}); nagq == 1 degenerates to the Laplace objective.
        nagq = max(int(spec.nagq), 1)
        if nagq > 1:
            gh_x_np, gh_w_np = np.polynomial.hermite.hermgauss(nagq)
            gh_x = jnp.asarray(gh_x_np, jnp.float64)
            log_gh_w = jnp.asarray(np.log(gh_w_np), jnp.float64)
            # center node (x = 0 for odd nagq): the hybrid search deviance
            # anchors its f64 base here and measures every other node as an
            # f32 DELTA against it.
            gh_k0 = int(np.argmin(np.abs(gh_x_np)))

        def agq_deviance(tau2, beta, u, w, W_i, mask_local):
            """-2 sum_i log of the adaptive-GH integral at the mode u_i.

            Vectorized over quadrature nodes: one (nodes, n) elementwise pass
            and one (nodes, n) x (n, m) matmul — graph size independent of
            nagq.
            """
            inv_tau2 = 1.0 / jnp.maximum(tau2, 1e-12)
            sigma_i = 1.0 / jnp.sqrt(W_i + inv_tau2)  # (m,)
            lp_x = Xf @ beta  # fixed part per row
            u_k = u[None, :] + jnp.sqrt(2.0) * sigma_i[None, :] * gh_x[:, None]
            eta = lp_x[None, :] + clusterops.per_row(spec, u_k, max_n)
            ll_rows = _loglik_rows(spec.outcome, spec.link, yf[None, :], eta)
            ll_i = seg(ll_rows * mask_local[None, :])  # (nodes, m)
            prior = -0.5 * (u_k * u_k) * inv_tau2 - 0.5 * (
                jnp.log(jnp.maximum(tau2, 1e-12)) + _LOG_2PI
            )
            stacked = log_gh_w[:, None] + gh_x[:, None] ** 2 + ll_i + prior
            log_int = jax.scipy.special.logsumexp(stacked, axis=0) + jnp.log(
                jnp.sqrt(2.0) * sigma_i
            )
            return -2.0 * jnp.sum(jnp.where(active, log_int, 0.0))

        def agq_deviance_hybrid(tau2, beta, u, W_i, mask_local):
            """Search-phase AGQ deviance: f64 center-node base + f32 node
            deltas.

            What held glmm_agq7 ~11x under glmm_base after round 4's f32
            PIRLS twin was the remaining per-evaluation f64 (nagq, n)
            log-likelihood sweep (TPU f64 is double-double emulation; the
            Laplace arm pays ONE f64 (n,) tail pass per eval, AGQ paid
            nagq of them). The full-precision sweep is only needed for
            RESOLUTION, and resolution survives a split:

                log_int_i = s0_i + log sum_k exp(Delta_ki)

            with s0_i (center node: weight + conditional loglik + prior,
            all f64 — one (n,) pass, the same cost the Laplace arm pays)
            and Delta_ki = (node k) - (node k0) accumulated from PER-ROW
            f32 differences: each row's delta is O(0.1-1), so the f32
            segment sums carry ~1e-6 absolute error into a logsumexp of
            O(1) arguments — f64-grade deviance at f32 sweep cost. The
            k0 lane is exactly 0 by construction. Final fit, boundary
            probe, and accepted-optimum deviance stay on the full-f64
            ``agq_deviance`` (tests/test_agq.py parity unchanged)."""
            f32 = jnp.float32
            inv_tau2 = 1.0 / jnp.maximum(tau2, 1e-12)
            sigma_i = 1.0 / jnp.sqrt(W_i + inv_tau2)  # (m,) f64
            eta_c = smallchol.rowmv(Xf, beta) + urow(u)  # center eta, f64
            ll_c_rows = _loglik_rows(spec.outcome, spec.link, yf, eta_c)
            ll_c_sum = jnp.sum(ll_c_rows * mask_local)  # f64, one pass
            prior_c = -0.5 * (u * u) * inv_tau2 - 0.5 * (
                jnp.log(jnp.maximum(tau2, 1e-12)) + _LOG_2PI
            )
            s0 = (
                log_gh_w[gh_k0]
                + gh_x[gh_k0] ** 2
                + prior_c
                + jnp.log(jnp.sqrt(2.0) * sigma_i)
            )  # (m,) — ll_c enters via the separable total below
            # f32 delta sweep over nodes
            eta_c32 = eta_c.astype(f32)
            y32 = yf.astype(f32)
            m32 = mask_local.astype(f32)
            shift = (jnp.sqrt(2.0) * sigma_i).astype(f32)[None, :] * gh_x.astype(
                f32
            )[:, None]  # (nodes, m): u_k - u
            eta_k32 = eta_c32[None, :] + clusterops.per_row(
                spec, shift, max_n
            )
            dll_rows = _loglik_rows(
                spec.outcome, spec.link, y32[None, :], eta_k32
            ) - _loglik_rows(spec.outcome, spec.link, y32, eta_c32)[None, :]
            dll_i = seg(dll_rows * m32[None, :])  # (nodes, m) f32
            u32 = u.astype(f32)
            uk32 = u32[None, :] + shift
            inv_t32 = jnp.asarray(inv_tau2, f32)
            dprior = -0.5 * (uk32 * uk32 - u32[None, :] ** 2) * inv_t32
            dw = (log_gh_w + gh_x**2 - log_gh_w[gh_k0] - gh_x[gh_k0] ** 2).astype(
                f32
            )
            delta = dw[:, None] + dll_i + dprior  # (nodes, m); k0 lane == 0
            lse = jax.scipy.special.logsumexp(delta, axis=0).astype(
                jnp.float64
            )
            return -2.0 * (
                jnp.sum(jnp.where(active, s0 + lse, 0.0)) + ll_c_sum
            )

        def dev_at(log_tau2, beta, u, iters=N_PIRLS_WARM):
            tau2 = jnp.exp(log_tau2)
            beta2, u2, w2, W2, lap = pirls(tau2, beta, u, iters)
            if nagq > 1:
                return agq_deviance(tau2, beta2, u2, w2, W2, mask), beta2, u2
            return lap, beta2, u2

        def dev_at32(log_tau2, beta, u, iters):
            """Search-phase evaluator: f32 PIRLS state, f64 deviance.

            Holds for the AGQ objective too (round 4): the mode chain is
            the SAME penalized IRLS — only the deviance read off at the
            final mode changes — so the search runs its state math in f32
            and the GH-node correction is ONE f64 (nodes, n) pass from the
            f64-cast mode (pirls32's tail already recomputes the cluster
            weights W_i in f64). Round 3 ran the whole AGQ search chain in
            emulated f64 (glmm_agq7 3,341 fits/s, 10x under glmm_base);
            the final fit, boundary probe, and accepted-optimum deviance
            keep the full-f64 path, so the optimum itself is unchanged to
            within the parity tolerances (tests/test_agq.py)."""
            tau2 = jnp.exp(log_tau2)
            beta2, u2, w2, W2, lap = pirls32(tau2, beta, u, iters)
            if nagq > 1:
                lap = agq_deviance_hybrid(
                    tau2,
                    beta2.astype(jnp.float64),
                    u2.astype(jnp.float64),
                    W2,
                    mask,
                )
            return lap, beta2, u2

        # Brent (safeguarded parabolic) search with (beta, u) warm carry.
        # The cold starting eval gets the full PIRLS budget in f64; the
        # search body runs at f32 state precision for BOTH objectives
        # (Laplace, and since round 4 AGQ — its f64 logsumexp correction
        # is one elementwise pass from the final mode, not per-iteration
        # state). The regime is THROUGHPUT-bound (a
        # k-section variant with 6 vmapped probes per round LOST ~1.4x on
        # TPU — extra probe lanes are paid-for work, see ARCHITECTURE.md),
        # so total evaluations is the wall-clock: Brent's superlinear
        # steps position the optimum as well as golden section's 26
        # evaluations did in ~half. The parabolic steps also shrink monotonically near
        # the optimum, so the warm carry's (beta, u) is BETTER conditioned
        # than under golden's alternating-side probes.
        def init_eval(x, _carry):
            f, b2, u2 = dev_at(x, beta0, jnp.zeros(m, jnp.float64), N_PIRLS)
            return f, (b2.astype(jnp.float32), u2.astype(jnp.float32))

        def make_eval(iters):
            def ev(x, carry):
                f, b2, u2 = dev_at32(x, carry[0], carry[1], iters)
                return f, (b2, u2)

            return ev

        log_tau2_hat, _, (beta_c, u_c) = _brent_minimize(
            LOG_GAMMA_LO,
            LOG_GAMMA_HI,
            (None, None),
            (
                (BRENT_FULL_GLMM, make_eval(N_PIRLS)),
                (BRENT_ITERS_GLMM - BRENT_FULL_GLMM, make_eval(N_PIRLS_WARM)),
            ),
            init_eval=init_eval,
        )
        beta_c = beta_c.astype(jnp.float64)
        u_c = u_c.astype(jnp.float64)

        dev_int, beta_c, u_c = dev_at(log_tau2_hat, beta_c, u_c, N_PIRLS)
        dev_zero, _, _ = dev_at(jnp.float64(LOG_GAMMA_LO), beta_c, u_c, N_PIRLS)
        boundary = (dev_zero <= dev_int + 1e-10) | (
            log_tau2_hat < BOUNDARY_LOG_GAMMA
        )
        tau2_hat = jnp.where(boundary, 0.0, jnp.exp(log_tau2_hat))

        beta, u, w, W_i, _ = pirls(
            jnp.maximum(tau2_hat, 1e-12), beta_c, u_c, N_PIRLS
        )
        inv_tau2 = 1.0 / jnp.maximum(tau2_hat, 1e-12)
        s_i = seg_cols(w[:, None] * Xf)
        c_i = jnp.where(active, 1.0 / (W_i + inv_tau2), 0.0)
        a_xx = (
            smallchol.crossprod(Xf, w) - smallchol.wouter(c_i, s_i) + eye
        )
        chol = smallchol.chol(a_xx)
        cov = smallchol.cho_inverse(chol)

        if spec.wald_se == "hessian":
            # Accurate opt-in: central finite differences of the beta-profiled
            # Laplace deviance (u re-optimized per evaluation by a u-only
            # Newton pass), cov = 2 H^-1 since dev = -2 loglik. The rx cov
            # above remains the fast default (reference WaldSe::{Rx, Hessian},
            # estimator.rs:47).
            tau2_c = jnp.maximum(tau2_hat, 1e-12)

            def dev_beta(beta_q):
                def ubody(_, u_q):
                    eta = Xf @ beta_q + urow(u_q)
                    mu, var, dmu = mu_var_dmu(eta)
                    w_q = (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask
                    r = (yf - mu) * mask
                    g_u = seg(r) - u_q / tau2_c
                    h_u = seg(w_q) + 1.0 / tau2_c
                    return jnp.where(active, u_q + g_u / h_u, 0.0)

                u_q = jax.lax.fori_loop(0, 20, ubody, u)
                eta = Xf @ beta_q + urow(u_q)
                mu, var, dmu = mu_var_dmu(eta)
                w_q = (dmu * dmu / jnp.maximum(var, MU_EPS)) * mask
                W_q = seg(w_q)
                dev_cond = _deviance(spec.outcome, yf, mu, mask)
                return (
                    dev_cond
                    + jnp.sum(jnp.where(active, u_q * u_q, 0.0)) / tau2_c
                    + jnp.sum(jnp.where(active, jnp.log1p(tau2_c * W_q), 0.0))
                )

            cov = _fd_hessian_cov(dev_beta, beta, cov)
        converged = (
            jnp.all(jnp.isfinite(beta))
            & smallchol.chol_ok(chol)
            # rank probe on the unridged Schur complement (see smallchol.rank_ok)
            & smallchol.rank_ok(a_xx - eye)
            & jnp.isfinite(dev_int)
        )
        ybar = jnp.sum(yf * (rows < n)) / jnp.asarray(n, jnp.float64)
        return beta, cov, converged, boundary, tau2_hat, ybar

    beta, cov, converged, boundary, tau2_hat, ybar = jax.vmap(per_grid)(
        jnp.asarray(spec.grid, jnp.int32)
    )

    out = {
        "t2": waldstats.t2_targets(spec, beta, cov),
        "overall": waldstats.overall_wald_chi2(spec, beta, cov),
        "converged": converged,
        "boundary_hit": boundary,
        "singular": boundary,
        "tau2_hat": tau2_hat,
        "glm_baseline": ybar,
        # Single variance component: pin vector = the boundary bit (the
        # reference's pinned_components bit 0; spec.rs:562-573).
        "pinned_comp": boundary[:, None] & converged[:, None],
    }
    return waldstats.add_posthoc(out, spec, beta, cov)
