"""AGQ (adaptive Gauss-Hermite) GLMM: agrees with Laplace where Laplace is
good, and with an independent high-order quadrature where it is not."""

import numpy as np
import pytest
from scipy import optimize, stats

import jax.numpy as jnp

from mcpower_tpu.engine import batch, datagen, lower
from mcpower_tpu.engine.spec import ClusterStatic


def _lower(nagq, grid=(240,), tau2=0.5, beta=0.4, n_clusters=30):
    return lower.lower(
        grid=list(grid),
        var_types=["normal"],
        effects=np.array([-0.3, beta]),
        target_cols=[1],
        outcome="binary",
        estimator="glm",
        nagq=nagq,
        cluster=ClusterStatic(
            sizing_mode="fixed_clusters", sizing_value=n_clusters, tau_squared=tau2
        ),
    )


def _ref_agq_tau2(X, y, ids, m, n_nodes=40):
    """Independent: maximize the EXACT (high-order GH) marginal likelihood.

    Fully vectorized: per-node row logliks aggregated per cluster with one
    matmul, then a weighted logsumexp over nodes.
    """
    gh_x, gh_w = np.polynomial.hermite.hermgauss(n_nodes)
    one_hot = np.zeros((len(ids), m))
    one_hot[np.arange(len(ids)), ids] = 1.0
    log_w = np.log(gh_w)

    def nll(params):
        beta = params[:-1]
        tau = np.exp(params[-1] / 2)
        lp = X @ beta
        eta = lp[None, :] + (np.sqrt(2.0) * tau * gh_x)[:, None]  # (nodes, n)
        ll_rows = y[None, :] * eta - np.logaddexp(0, eta)
        ll_i = ll_rows @ one_hot  # (nodes, m)
        a = ll_i + log_w[:, None]
        amax = a.max(axis=0)
        log_int = np.log(np.exp(a - amax).sum(axis=0)) + amax
        return -log_int.sum()

    res = optimize.minimize(
        nll, np.array([0.0, 0.2, np.log(0.3)]), method="Nelder-Mead",
        options={"xatol": 1e-7, "fatol": 1e-9, "maxiter": 2000},
    )
    return float(np.exp(res.x[-1])), res.x[:-1]


def test_agq_matches_independent_exact_likelihood():
    spec, arrays = _lower(nagq=15, grid=(240,), tau2=0.5, n_clusters=30)
    cap = batch.run_batch_capture(spec, arrays, 3, 2137)
    for s in range(3):
        X, y, ids = datagen.generate_batch(
            spec, arrays, jnp.uint32(2137), jnp.uint32(0),
            jnp.asarray([s], dtype=jnp.uint32),
        )
        X0 = np.asarray(X)[0][:, :2].astype(np.float64)
        y0 = np.asarray(y)[0].astype(np.float64)
        ids0 = np.asarray(ids)[0]
        tau2_ref, beta_ref = _ref_agq_tau2(X0, y0, ids0, 30)
        np.testing.assert_allclose(
            cap["tau2_hat"][s, 0], tau2_ref, rtol=0.05, atol=0.01,
            err_msg=f"sim {s}",
        )


def test_agq_close_to_laplace_at_moderate_clusters():
    spec_l, arr_l = _lower(nagq=1)
    spec_a, arr_a = _lower(nagq=7)
    cl = batch.run_batch(spec_l, arr_l, 300, 11)
    ca = batch.run_batch(spec_a, arr_a, 300, 11)
    p_l = cl["sig_unc"][0, 0] / cl["n_done"]
    p_a = ca["sig_unc"][0, 0] / ca["n_done"]
    assert abs(p_l - p_a) < 0.05, (p_l, p_a)
    t_l = cl["tau2_hat"][0] / cl["converged"][0]
    t_a = ca["tau2_hat"][0] / ca["converged"][0]
    assert abs(t_l - t_a) < 0.06, (t_l, t_a)


def test_agq_via_model_api():
    from mcpower_tpu import MCPower

    m = MCPower("y ~ x + (1|site)", family="logit")
    m.set_baseline_probability(0.35)
    m.set_cluster("site", ICC=0.25, n_clusters=20)
    m.set_effects("x=0.4").set_simulations(150)
    res = m.find_power(sample_size=200, agq=9, verbose=False)
    assert 0.1 < res["powers"]["uncorrected"][0][0] <= 1.0
    # ineligible agq warns and runs at Laplace
    m2 = MCPower("y ~ x")
    m2.set_effects("x=0.3").set_simulations(50)
    with pytest.warns(UserWarning, match="not eligible"):
        m2.find_power(sample_size=60, agq=9, verbose=False)


def test_agq_multi_grouping_warns_and_falls_back():
    """agq on a crossed-groupings GLMM is structurally ineligible
    (contract invariant 25): the model layer warns and runs at Laplace
    instead of erroring at contract validation."""
    import warnings as _w

    from mcpower_tpu import MCPower

    m = MCPower("y ~ x + (1|a) + (1|b)", family="logit")
    m.set_effects("x=0.5").set_baseline_probability(0.3)
    m.set_cluster("a", ICC=0.1, n_clusters=10)
    m.set_cluster("b", ICC=0.1, n_clusters=8)
    m.set_simulations(20).set_seed(3)
    with _w.catch_warnings(record=True) as w:
        _w.simplefilter("always")
        res = m.find_power(sample_size=160, agq=5, verbose=False)
    assert any("not eligible" in str(x.message) for x in w)
    assert res["powers"]["uncorrected"][0][0] >= 0.0
