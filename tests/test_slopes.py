"""Random-slope LMM: parity vs an independent dense REML + power sanity."""

import numpy as np
import pytest
from scipy import optimize

import jax.numpy as jnp

from mcpower_tpu.engine import batch, datagen, lower
from mcpower_tpu.engine.spec import ClusterStatic, SlopeStatic


def _lower_slope(grid, tau2=0.3, slope_var=0.2, corr=0.3, beta=0.4,
                 n_clusters=30):
    cl = ClusterStatic(
        sizing_mode="fixed_clusters",
        sizing_value=n_clusters,
        tau_squared=tau2,
        slopes=(SlopeStatic(design_col=1, variance=slope_var, intercept_corr=corr),),
    )
    return lower.lower(
        grid=grid,
        var_types=["normal"],
        effects=np.array([0.0, beta]),
        target_cols=[1],
        estimator="mle",
        cluster=cl,
    )


def _gen(spec, arrays, sim_id, seed=2137):
    X, y, ids = datagen.generate_batch(
        spec, arrays, jnp.uint32(seed), jnp.uint32(0),
        jnp.asarray([sim_id], dtype=jnp.uint32),
    )
    return np.asarray(X)[0], np.asarray(y)[0], np.asarray(ids)[0]


def _ref_reml_slope(X, y, ids, m):
    """Independent dense REML with a 2-dim RE (intercept + slope)."""
    n, p = X.shape
    Zb = np.zeros((n, 2 * m))
    Zb[np.arange(n), 2 * ids] = 1.0
    Zb[np.arange(n), 2 * ids + 1] = X[:, 1]

    def dev(theta):
        L = np.array([[theta[0], 0.0], [theta[1], theta[2]]])
        Gam = L @ L.T
        Gfull = np.kron(np.eye(m), Gam)
        V = np.eye(n) + Zb @ Gfull @ Zb.T
        Vi = np.linalg.inv(V)
        XtViX = X.T @ Vi @ X
        beta = np.linalg.solve(XtViX, X.T @ Vi @ y)
        r = y - X @ beta
        rss = r @ Vi @ r
        _, ldv = np.linalg.slogdet(V)
        _, ldx = np.linalg.slogdet(XtViX)
        return ldv + ldx + (n - p) * np.log(rss), beta, XtViX, rss

    res = optimize.minimize(
        lambda th: dev(th)[0],
        x0=np.array([0.5, 0.1, 0.4]),
        method="Nelder-Mead",
        options={"xatol": 1e-10, "fatol": 1e-12, "maxiter": 5000},
    )
    d, beta, XtViX, rss = dev(res.x)
    sigma2 = rss / (n - p)
    cov = sigma2 * np.linalg.inv(XtViX)
    L = np.array([[res.x[0], 0.0], [res.x[1], res.x[2]]])
    return beta, np.sqrt(np.diag(cov)), (L @ L.T)[0, 0] * sigma2, d


def test_slope_reml_parity_same_bytes():
    spec, arrays = _lower_slope([240], n_clusters=30)
    cap = batch.run_batch_capture(spec, arrays, 3, 2137)
    for s in range(3):
        X, y, ids = _gen(spec, arrays, s)
        b_ref, se_ref, tau2_ref, _ = _ref_reml_slope(
            X[:, :2].astype(np.float64), y.astype(np.float64), ids, 30
        )
        t2_ref = (b_ref[1] / se_ref[1]) ** 2
        np.testing.assert_allclose(cap["t2"][s, 0, 0], t2_ref, rtol=2e-2,
                                   err_msg=f"sim {s}")
        np.testing.assert_allclose(cap["tau2_hat"][s, 0], tau2_ref, rtol=0.05,
                                   atol=0.01)


def test_slope_power_below_intercept_only_fixed_x_se():
    """Random slope variance inflates the slope SE => less power than the
    intercept-only design with the same effect."""
    spec_s, arr_s = _lower_slope([300], slope_var=0.4, beta=0.3, n_clusters=30)
    spec_i, arr_i = lower.lower(
        grid=[300],
        var_types=["normal"],
        effects=np.array([0.0, 0.3]),
        target_cols=[1],
        estimator="mle",
        cluster=ClusterStatic(
            sizing_mode="fixed_clusters", sizing_value=30, tau_squared=0.3
        ),
    )
    cs = batch.run_batch(spec_s, arr_s, n_sims=400, base_seed=3)
    ci = batch.run_batch(spec_i, arr_i, n_sims=400, base_seed=3)
    p_slope = cs["sig_unc"][0, 0] / cs["n_done"]
    p_icpt = ci["sig_unc"][0, 0] / ci["n_done"]
    assert p_slope < p_icpt - 0.05, (p_slope, p_icpt)
    assert cs["converged"][0] > 0.95 * cs["n_done"]


def test_pinned_component_rates_null_slope_variance():
    """Per-component boundary-pin diagnostics (VERDICT r2 missing #5): a
    design whose TRUE slope variance is 0 must report slope-pin >>
    intercept-pin, not a single any-component flag. Mirrors the reference's
    pinned_components bitmask -> boundary_rate_per_component
    (spec.rs:562-573, result.rs:360-398)."""
    from mcpower_tpu.orchestrator import results

    spec, arrays = _lower_slope(
        [240], tau2=0.3, slope_var=0.0, corr=0.0, n_clusters=30
    )
    counts = batch.run_batch(spec, arrays, 300, 11)
    pc = np.asarray(counts["pinned_comp"])  # (1, [intercept, slope])
    conv = np.asarray(counts["converged"])
    rates = pc[0] / conv[0]
    assert rates[1] > 0.3, rates  # null slope variance pins often
    assert rates[0] < 0.05, rates  # real intercept variance rarely pins
    # surfaced in estimator extras with the converged-count denominator
    res = results.fold_counts(spec, counts, target_labels=["x"])
    extras = res["estimator_extras"]["mle"]
    np.testing.assert_allclose(
        extras["boundary_rate_per_component"][0], pc[0] / conv[0]
    )
    assert extras["boundary_component_counts"][0] == pc[0].tolist()


def test_slope_via_model_api():
    from mcpower_tpu import MCPower

    m = MCPower("y ~ x + (1+x|site)", family="lme")
    m.set_cluster(
        "site", ICC=0.2, n_clusters=20, random_slopes=["x"],
        slope_variance=0.2, slope_intercept_corr=0.3,
    )
    m.set_effects("x=0.4").set_simulations(200)
    res = m.find_power(sample_size=200, verbose=False)
    assert 0.2 < res["powers"]["uncorrected"][0][0] <= 1.0
