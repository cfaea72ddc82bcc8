"""LMM with crossed/nested extra groupings: the joint-Z capacitance REML
fits the FULL generated variance structure (no silent DGP/fit mismatch).

Oracle: dense-V profile REML written directly from the definition
(V0 = I + g1 Z1 Z1' + g2 Z2 Z2', numpy slogdet/solve, scipy Nelder-Mead)
— independent of all engine code.
"""

import numpy as np
from scipy import optimize

import jax.numpy as jnp

from mcpower_tpu.engine import batch, datagen, lower
from mcpower_tpu.engine.spec import ClusterStatic, ExtraGroupingStatic


def _gen(spec, arrays, sim_id, seed=2137):
    X, y, ids = datagen.generate_batch(
        spec, arrays, jnp.uint32(seed), jnp.uint32(0),
        jnp.asarray([sim_id], dtype=jnp.uint32),
    )
    return (
        np.asarray(X, np.float64)[0],
        np.asarray(y, np.float64)[0],
        np.asarray(ids)[0],
    )


def _oracle_two_grouping_reml(X, y, Z1, Z2):
    """Profile REML over (log g1, log g2), dense V0. Returns
    (tau2_1, tau2_2, sigma2, beta, cov)."""
    n, p = X.shape

    def pieces(g1, g2):
        V0 = np.eye(n) + g1 * (Z1 @ Z1.T) + g2 * (Z2 @ Z2.T)
        Vi = np.linalg.inv(V0)
        a_xx = X.T @ Vi @ X
        a_xy = X.T @ Vi @ y
        beta = np.linalg.solve(a_xx, a_xy)
        rss = y @ Vi @ y - beta @ a_xy
        sigma2 = rss / (n - p)
        dev = (
            np.linalg.slogdet(V0)[1]
            + np.linalg.slogdet(a_xx)[1]
            + (n - p) * np.log(rss)
        )
        return dev, beta, a_xx, sigma2

    def f(lg):
        return pieces(np.exp(lg[0]), np.exp(lg[1]))[0]

    res = optimize.minimize(
        f, np.log([0.3, 0.15]), method="Nelder-Mead",
        options={"xatol": 1e-9, "fatol": 1e-11, "maxiter": 3000},
    )
    g1, g2 = np.exp(res.x)
    dev, beta, a_xx, sigma2 = pieces(g1, g2)
    cov = sigma2 * np.linalg.inv(a_xx)
    return g1 * sigma2, g2 * sigma2, sigma2, beta, cov


def test_lmm_crossed_extra_grouping_parity():
    m, n_lv, n = 12, 8, 192
    spec, arrays = lower.lower(
        grid=[n],
        var_types=["normal"],
        effects=np.array([0.0, 0.4]),
        target_cols=[1],
        estimator="mle",
        cluster=ClusterStatic(
            sizing_mode="fixed_clusters", sizing_value=m, tau_squared=0.3,
            extra_groupings=(
                ExtraGroupingStatic(
                    relation="crossed", n_levels=n_lv, tau_squared=0.15
                ),
            ),
        ),
    )
    cap = batch.run_batch_capture(spec, arrays, 3, 2137)
    rows = np.arange(n)
    for s in range(3):
        X, y, ids = _gen(spec, arrays, s)
        X, y, ids = X[:n], y[:n], ids[:n]
        Z1 = np.eye(m)[ids]  # (n, m) indicators
        # lexicographic crossed layout (generation.rs:402-427): each atom
        # block of m*n_lv rows enumerates every (cluster, level) pair once
        eg_ids = (rows // m) % n_lv
        Z2 = np.eye(n_lv)[eg_ids]
        tau2_1, tau2_2, sigma2, beta, cov = _oracle_two_grouping_reml(
            X[:, :2], y, Z1, Z2
        )
        t2_ref = beta[1] ** 2 / cov[1, 1]
        assert abs(cap["tau2_hat"][s, 0] - tau2_1) <= 0.03 * max(tau2_1, 0.1), (
            s, float(cap["tau2_hat"][s, 0]), tau2_1
        )
        # t2 inherits the joint-Z variance search's positioning radius
        # (fixed evaluation budget, ~2-3% — same band as tau2 above).
        np.testing.assert_allclose(cap["t2"][s, 0, 0], t2_ref, rtol=0.03)


def test_lmm_nested_extra_grouping_runs_and_recovers():
    """Nested grouping: tau^2 recovery at MC tolerance over a batch."""
    m, npp = 10, 3
    spec, arrays = lower.lower(
        grid=[300],
        var_types=["normal"],
        effects=np.array([0.0, 0.4]),
        target_cols=[1],
        estimator="mle",
        cluster=ClusterStatic(
            sizing_mode="fixed_clusters", sizing_value=m, tau_squared=0.4,
            extra_groupings=(
                ExtraGroupingStatic(
                    relation="nested", n_levels=npp, tau_squared=0.2
                ),
            ),
        ),
    )
    counts = batch.run_batch(spec, arrays, n_sims=150, base_seed=5)
    assert counts["converged"][0] > 0.9 * counts["n_done"]
    tau2_mean = counts["tau2_hat"][0] / counts["converged"][0]
    # primary variance recovered despite the nested extra structure
    assert abs(tau2_mean - 0.4) < 0.12, tau2_mean
    power = counts["sig_unc"][0, 0] / counts["n_done"]
    assert 0.3 < power <= 1.0, power


def test_lexicographic_layout_matches_reference_rule():
    """extra_grouping_ids implements the reference's stride chain
    (generation.rs:402-427) exactly: oracle below is transcribed from the
    documented rule, not from engine code."""
    spec, _ = lower.lower(
        grid=[96],
        var_types=["normal"],
        effects=np.array([0.0, 0.3]),
        target_cols=[1],
        estimator="mle",
        cluster=ClusterStatic(
            sizing_mode="fixed_clusters", sizing_value=4, tau_squared=0.2,
            extra_groupings=(
                ExtraGroupingStatic(relation="crossed", n_levels=3,
                                    tau_squared=0.1),
                ExtraGroupingStatic(relation="nested", n_levels=2,
                                    tau_squared=0.1),
            ),
        ),
    )
    s = 4
    i = np.arange(96)
    # grouping 0 (crossed, 3 levels): stride = S = 4
    want0 = (i // 4) % 3
    got0, n_lv0 = datagen.extra_grouping_ids(spec, 0)
    assert n_lv0 == 3
    np.testing.assert_array_equal(np.asarray(got0), want0)
    # grouping 1 (nested, 2 per parent): stride = S * 3 = 12
    want1 = (i % s) * 2 + (i // 12) % 2
    got1, n_lv1 = datagen.extra_grouping_ids(spec, 1)
    assert n_lv1 == 8
    np.testing.assert_array_equal(np.asarray(got1), want1)

    # atom = S * 3 * 2 = 24; within any atom block every (cluster, lvl0)
    # pair appears exactly twice and every (cluster, lvl0, lvl1) once
    from mcpower_tpu.orchestrator.grid import cluster_atom

    assert cluster_atom(spec.cluster) == 24
    ids = i % s
    block = slice(0, 24)
    combos = set(zip(ids[block], want0[block], want1[block]))
    assert len(combos) == 24  # every combination exactly once


# ---------------------------------------------------------------------------
# GLMM (binary) with a crossed extra grouping — joint-Z Laplace parity
# ---------------------------------------------------------------------------


def _oracle_two_grouping_laplace_logit(X, y, Z1, Z2):
    """Independent dense Laplace fit for a two-grouping logistic GLMM:
    joint penalized-IRLS mode in (beta, u) with the full bordered system,
    scipy Nelder-Mead over (log tau1, log tau2). Shares no code with the
    engine (dense linalg, explicit block matrices)."""
    from scipy import optimize

    n, p = X.shape
    Z = np.hstack([Z1, Z2])
    m1, m2 = Z1.shape[1], Z2.shape[1]

    def fit_at(tau1, tau2):
        dinv = np.concatenate([np.full(m1, 1.0 / tau1), np.full(m2, 1.0 / tau2)])
        beta = np.zeros(p)
        u = np.zeros(m1 + m2)
        for _ in range(80):
            eta = X @ beta + Z @ u
            mu = 1.0 / (1.0 + np.exp(-eta))
            w = np.maximum(mu * (1.0 - mu), 1e-10)
            z = eta + (y - mu) / w
            XtW = X.T * w
            ZtW = Z.T * w
            H = np.block(
                [
                    [XtW @ X, XtW @ Z],
                    [ZtW @ X, ZtW @ Z + np.diag(dinv)],
                ]
            )
            rhs = np.concatenate([XtW @ z, ZtW @ z])
            sol = np.linalg.solve(H, rhs)
            nb, nu = sol[:p], sol[p:]
            if max(np.max(np.abs(nb - beta)), np.max(np.abs(nu - u))) < 1e-10:
                beta, u = nb, nu
                break
            beta, u = nb, nu
        eta = X @ beta + Z @ u
        mu = np.clip(1.0 / (1.0 + np.exp(-eta)), 1e-12, 1 - 1e-12)
        w = np.maximum(mu * (1.0 - mu), 1e-10)
        dev_cond = -2.0 * np.sum(y * np.log(mu) + (1 - y) * np.log(1 - mu))
        d_sqrt = np.sqrt(1.0 / dinv)
        C = np.eye(m1 + m2) + (d_sqrt[:, None] * (Z.T * w) @ Z) * d_sqrt[None, :]
        lap = dev_cond + u @ (dinv * u) + np.linalg.slogdet(C)[1]
        # rx covariance: Schur complement of the u block
        XtWZ = (X.T * w) @ Z
        S = (X.T * w) @ X - XtWZ @ np.linalg.solve(
            (Z.T * w) @ Z + np.diag(dinv), XtWZ.T
        )
        return lap, beta, np.linalg.inv(S)

    res = optimize.minimize(
        lambda lt: fit_at(np.exp(lt[0]), np.exp(lt[1]))[0],
        np.log([0.3, 0.2]),
        method="Nelder-Mead",
        options={"xatol": 1e-8, "fatol": 1e-10, "maxiter": 2000},
    )
    t1, t2_ = np.exp(res.x)
    lap, beta, cov = fit_at(t1, t2_)
    return t1, t2_, beta, cov


def test_glmm_crossed_extra_grouping_parity():
    """Binary GLMM + crossed extra grouping: the engine's joint-Z Laplace
    (glmmfit._extras_glmm_grid_stats) against the independent dense
    two-grouping Laplace on the SAME bytes — tau^2 of both groupings and
    the rx-t^2 within the fixed-budget positioning band."""
    m, n_lv, n = 12, 8, 192
    spec, arrays = lower.lower(
        grid=[n],
        var_types=["normal"],
        effects=np.array([-0.4, 0.6]),
        target_cols=[1],
        estimator="glm",
        outcome="binary",
        cluster=ClusterStatic(
            sizing_mode="fixed_clusters", sizing_value=m, tau_squared=0.4,
            extra_groupings=(
                ExtraGroupingStatic(
                    relation="crossed", n_levels=n_lv, tau_squared=0.25
                ),
            ),
        ),
    )
    cap = batch.run_batch_capture(spec, arrays, 3, 2137)
    rows = np.arange(n)
    checked = 0
    for s in range(3):
        X, y, ids = _gen(spec, arrays, s)
        X, y, ids = X[:n], y[:n], ids[:n]
        Z1 = np.eye(m)[ids]
        eg_ids = (rows // m) % n_lv
        Z2 = np.eye(n_lv)[eg_ids]
        tau1_ref, tau2_ref, beta_ref, cov_ref = (
            _oracle_two_grouping_laplace_logit(X[:, :2], y, Z1, Z2)
        )
        if tau1_ref < 0.02 or tau2_ref < 0.02:
            continue  # boundary-pinned oracle: positioning bands differ
        t2_ref = beta_ref[1] ** 2 / cov_ref[1, 1]
        assert abs(cap["tau2_hat"][s, 0] - tau1_ref) <= 0.08 * max(
            tau1_ref, 0.15
        ), (s, float(cap["tau2_hat"][s, 0]), tau1_ref)
        np.testing.assert_allclose(cap["t2"][s, 0, 0], t2_ref, rtol=0.05)
        checked += 1
    assert checked >= 2, "too many boundary-pinned sims to compare"


def test_glmm_nested_extra_grouping_runs_and_recovers():
    """Nested extra grouping on the BINARY GLMM joint-Z path: batch
    converges and the primary latent variance is recovered at MC
    tolerance (the nested layout flows through extra_grouping_ids exactly
    as on the LMM path)."""
    m, npp = 10, 3
    spec, arrays = lower.lower(
        grid=[300],
        var_types=["normal"],
        effects=np.array([-0.4, 0.6]),
        target_cols=[1],
        estimator="glm",
        outcome="binary",
        cluster=ClusterStatic(
            sizing_mode="fixed_clusters", sizing_value=m, tau_squared=0.4,
            extra_groupings=(
                ExtraGroupingStatic(
                    relation="nested", n_levels=npp, tau_squared=0.2
                ),
            ),
        ),
    )
    counts = batch.run_batch(spec, arrays, n_sims=120, base_seed=5)
    assert counts["converged"][0] > 0.9 * counts["n_done"]
    tau2_mean = counts["tau2_hat"][0] / counts["converged"][0]
    # Laplace + 10 clusters: wider band than the LMM twin, same center
    assert abs(tau2_mean - 0.4) < 0.18, tau2_mean
    power = counts["sig_unc"][0, 0] / counts["n_done"]
    assert 0.3 < power <= 1.0, power


def test_glmm_extras_hessian_wald_se_parity():
    """wald_se='hessian' on the joint-Z GLMM extras path: engine t^2
    matches an independent FD-Hessian of the u-profiled two-grouping
    Laplace deviance (cov = 2 H^-1) at the independent (tau1, tau2)
    optimum, FD evaluated AT the penalized-IRLS beta (reference
    WaldSe::Hessian, estimator.rs:47-84)."""
    m, n_lv, n = 12, 8, 192
    spec, arrays = lower.lower(
        grid=[n],
        var_types=["normal"],
        effects=np.array([-0.4, 0.6]),
        target_cols=[1],
        estimator="glm",
        outcome="binary",
        wald_se="hessian",
        cluster=ClusterStatic(
            sizing_mode="fixed_clusters", sizing_value=m, tau_squared=0.4,
            extra_groupings=(
                ExtraGroupingStatic(
                    relation="crossed", n_levels=n_lv, tau_squared=0.25
                ),
            ),
        ),
    )
    cap = batch.run_batch_capture(spec, arrays, 3, 2137)
    rows = np.arange(n)
    checked = 0
    for s in range(3):
        X, y, ids = _gen(spec, arrays, s)
        X, y, ids = X[:n], y[:n], ids[:n]
        Xr = X[:, :2]
        Z1 = np.eye(m)[ids]
        eg_ids = (rows // m) % n_lv
        Z2 = np.eye(n_lv)[eg_ids]
        t1, t2_, beta_ref, _ = _oracle_two_grouping_laplace_logit(
            Xr, y, Z1, Z2
        )
        if t1 < 0.02 or t2_ < 0.02:
            continue  # boundary-pinned oracle: positioning bands differ
        Z = np.hstack([Z1, Z2])
        M = m + n_lv
        dinv = np.concatenate(
            [np.full(m, 1.0 / t1), np.full(n_lv, 1.0 / t2_)]
        )

        def dev_beta(beta):
            u = np.zeros(M)
            for _ in range(120):
                eta = Xr @ beta + Z @ u
                mu = np.clip(1 / (1 + np.exp(-eta)), 1e-12, 1 - 1e-12)
                w = np.maximum(mu * (1 - mu), 1e-10)
                z = eta + (y - mu) / w
                u_new = np.linalg.solve(
                    (Z.T * w) @ Z + np.diag(dinv),
                    (Z.T * w) @ (z - Xr @ beta),
                )
                if np.max(np.abs(u_new - u)) < 1e-11:
                    u = u_new
                    break
                u = u_new
            eta = Xr @ beta + Z @ u
            mu = np.clip(1 / (1 + np.exp(-eta)), 1e-12, 1 - 1e-12)
            w = np.maximum(mu * (1 - mu), 1e-10)
            dev_c = -2 * np.sum(y * np.log(mu) + (1 - y) * np.log(1 - mu))
            d_sqrt = np.sqrt(1.0 / dinv)
            C = np.eye(M) + (d_sqrt[:, None] * (Z.T * w) @ Z) * d_sqrt[None, :]
            return dev_c + u @ (dinv * u) + np.linalg.slogdet(C)[1]

        h = 1e-4
        p = 2
        H = np.zeros((p, p))
        f0 = dev_beta(beta_ref)
        for i in range(p):
            ei = np.zeros(p); ei[i] = h
            H[i, i] = (
                dev_beta(beta_ref + ei) - 2 * f0 + dev_beta(beta_ref - ei)
            ) / h**2
        for i in range(p):
            for j in range(i + 1, p):
                ei = np.zeros(p); ei[i] = h
                ej = np.zeros(p); ej[j] = h
                H[i, j] = H[j, i] = (
                    dev_beta(beta_ref + ei + ej) - dev_beta(beta_ref + ei - ej)
                    - dev_beta(beta_ref - ei + ej) + dev_beta(beta_ref - ei - ej)
                ) / (4 * h**2)
        cov_ref = 2.0 * np.linalg.inv(H)
        t2_ref = beta_ref[1] ** 2 / cov_ref[1, 1]
        np.testing.assert_allclose(cap["t2"][s, 0, 0], t2_ref, rtol=0.05)
        checked += 1
    assert checked >= 2, "too many boundary-pinned sims to compare"
