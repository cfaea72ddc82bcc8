"""DGP moment checks — the data-generation half of the validation campaign.

Mirrors the reference's DGP moment tests (data_gen.rs test module): every
marginal is standardized (mean 0, var 1 at the documented skew/kurtosis),
factor walks hit exact Hamilton counts at every prefix, logit rates match
sigmoid, Poisson mean matches lambda, cluster ICC is recovered.
"""

import numpy as np
import pytest
from scipy import stats

import jax.numpy as jnp

from mcpower_tpu.engine import batch, datagen, lower, marginals, rng
from mcpower_tpu.engine.spec import ClusterStatic, ScenarioStatic


def _gen_batch(spec, arrays, n_sims=1, seed=2137):
    """Jitted batched generation -> numpy (S, n, P) X, (S, n) y, (S, n) ids."""
    X, y, ids = datagen.generate_batch(
        spec, arrays, jnp.uint32(seed), jnp.uint32(0),
        jnp.arange(n_sims, dtype=jnp.uint32),
    )
    return np.asarray(X), np.asarray(y), np.asarray(ids)


def _gen_xy(spec, arrays, sim_id=0, seed=2137):
    X, y, ids = datagen.generate_batch(
        spec, arrays, jnp.uint32(seed), jnp.uint32(0),
        jnp.asarray([sim_id], dtype=jnp.uint32),
    )
    return np.asarray(X)[0], np.asarray(y)[0], np.asarray(ids)[0]


def _pool(spec_kw, n_sims=30, cols=None):
    spec, arrays = lower.lower(**spec_kw)
    X, y, _ = _gen_batch(spec, arrays, n_sims=n_sims)
    return X.reshape(-1, X.shape[-1]), y.reshape(-1)


def test_marginal_standardization_all_types():
    types = ["normal", "right_skewed", "left_skewed", "high_kurtosis", "uniform"]
    X, _ = _pool(
        dict(
            grid=[2000],
            var_types=types,
            effects=np.zeros(6),
            target_cols=[1],
        ),
        n_sims=25,
    )
    for j, t in enumerate(types):
        col = X[:, 1 + j]
        assert abs(col.mean()) < 0.02, (t, col.mean())
        # t(3) has an infinite 4th moment: the sample-std estimator has
        # unbounded variance, so its MC band cannot be as tight as the
        # finite-kurtosis types' at any draw budget.
        std_tol = 0.05 if t == "high_kurtosis" else 0.02
        assert abs(col.std() - 1.0) < std_tol, (t, col.std())
        skew = stats.skew(col)
        if t == "right_skewed":
            assert 1.6 < skew < 2.2, skew
        elif t == "left_skewed":
            assert -2.2 < skew < -1.6, skew
        elif t == "high_kurtosis":
            assert stats.kurtosis(col) > 3.0
        elif t == "uniform":
            assert abs(col.max() - marginals.SQRT3) < 0.01
            assert stats.kurtosis(col) < -1.0


def test_binary_proportion_preserved():
    X, _ = _pool(
        dict(
            grid=[3000],
            var_types=["binary"],
            var_params=[0.3],
            effects=np.zeros(2),
            target_cols=[1],
        ),
        n_sims=20,
    )
    col = X[:, 1]
    assert set(np.unique(col)) <= {0.0, 1.0}
    assert abs(col.mean() - 0.3) < 0.01


def test_correlation_recovered_through_copula():
    corr = np.array([[1.0, 0.5], [0.5, 1.0]])
    X, _ = _pool(
        dict(
            grid=[4000],
            var_types=["normal", "normal"],
            corr=corr,
            effects=np.zeros(3),
            target_cols=[1],
        ),
        n_sims=15,
    )
    r = np.corrcoef(X[:, 1], X[:, 2])[0, 1]
    assert abs(r - 0.5) < 0.02, r


def test_t3_ppf_accuracy():
    u = np.linspace(1e-6, 1 - 1e-6, 4001)
    got = np.asarray(marginals.t3_ppf(jnp.asarray(u, jnp.float64)))
    want = stats.t.ppf(u, 3)
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


def test_fixed_allocation_exact_counts_every_prefix():
    probs = [0.7, 0.3]
    codes = datagen.fixed_allocation_codes(probs, 200)
    for n in range(1, 201):
        c1 = np.sum(codes[:n] == 0)
        assert abs(c1 - 0.7 * n) <= 1.0, (n, c1)
    # equal proportions reduce to round-robin
    rr = datagen.fixed_allocation_codes([0.5, 0.5], 10)
    np.testing.assert_array_equal(rr, [0, 1] * 5)


def test_factor_dummies_reference_coded():
    spec, arrays = lower.lower(
        grid=[300],
        var_types=[],
        factor_levels=[3],
        factor_props=[0.4, 0.3, 0.3],
        effects=np.zeros(3),
        target_cols=[1],
    )
    X, _, _ = _gen_xy(spec, arrays)
    d1, d2 = X[:, 1], X[:, 2]
    assert set(np.unique(d1)) <= {0.0, 1.0}
    # exact Hamilton counts under fixed allocation
    assert abs(d1.sum() - 0.3 * 300) <= 1.0
    assert abs(d2.sum() - 0.3 * 300) <= 1.0
    assert np.all(d1 * d2 == 0.0)  # one-hot


def test_interaction_is_product():
    spec, arrays = lower.lower(
        grid=[200],
        var_types=["normal", "normal"],
        interactions=[(1, 2)],
        effects=np.zeros(4),
        target_cols=[3],
    )
    X, _, _ = _gen_xy(spec, arrays)
    np.testing.assert_allclose(X[:, 3], X[:, 1] * X[:, 2], rtol=1e-6)


def test_logit_rate_matches_sigmoid():
    # intercept-only logit at p = sigmoid(-0.8) ~ 0.31
    spec, arrays = lower.lower(
        grid=[4000],
        var_types=["normal"],
        effects=np.array([-0.8, 0.0]),
        target_cols=[1],
        outcome="binary",
        estimator="glm",
    )
    # generation only (estimator arm not needed)
    rates = []
    for s in range(10):
        _, y, _ = _gen_xy(spec, arrays, sim_id=s)
        rates.append(y.mean())
    want = 1.0 / (1.0 + np.exp(0.8))
    assert abs(np.mean(rates) - want) < 0.01


def test_probit_rate_matches_phi():
    spec, arrays = lower.lower(
        grid=[4000],
        var_types=["normal"],
        effects=np.array([-0.5, 0.0]),
        target_cols=[1],
        outcome="binary",
        link="probit",
        estimator="glm",
    )
    rates = [np.mean(_gen_xy(spec, arrays, sim_id=s)[1]) for s in range(10)]
    assert abs(np.mean(rates) - stats.norm.cdf(-0.5)) < 0.01


def test_poisson_mean_matches_lambda():
    for lam_log, lam in [(np.log(3.0), 3.0), (np.log(60.0), 60.0)]:
        spec, arrays = lower.lower(
            grid=[3000],
            var_types=["normal"],
            effects=np.array([lam_log, 0.0]),
            target_cols=[1],
            outcome="count",
            estimator="glm",
        )
        ys = [np.asarray(_gen_xy(spec, arrays, sim_id=s)[1]) for s in range(8)]
        y = np.concatenate(ys)
        assert abs(y.mean() - lam) < 0.05 * lam, (lam, y.mean())
        assert abs(y.var() - lam) < 0.08 * lam, (lam, y.var())


def test_cluster_icc_recovered():
    # tau^2 = ICC/(1-ICC) with ICC=0.2 => tau^2=0.25; residual var 1.
    tau2 = 0.25
    spec, arrays = lower.lower(
        grid=[2000],
        var_types=["normal"],
        effects=np.array([0.0, 0.0]),
        target_cols=[1],
        cluster=ClusterStatic(
            sizing_mode="fixed_clusters", sizing_value=100, tau_squared=tau2
        ),
    )
    # Pool within/between variance across sims.
    iccs = []
    for s in range(12):
        _, y, ids = _gen_xy(spec, arrays, sim_id=s)
        groups = [y[ids == c] for c in range(100)]
        rows_per = len(groups[0])
        within = np.mean([g.var(ddof=1) for g in groups])
        # Var(group mean) = tau^2 + sigma^2/m — subtract the within-noise term.
        between = np.var([g.mean() for g in groups], ddof=1) - within / rows_per
        iccs.append(between / (between + within))
    want = tau2 / (tau2 + 1.0)
    assert abs(np.mean(iccs) - want) < 0.03, (np.mean(iccs), want)


def test_heteroskedasticity_variance_ratio():
    # lambda = 4 with driver x: Var(eps | z=+2SD)/Var(eps | z=-2SD) ~ lambda^2...
    # model: Var = sigma^2 exp(gamma z)/exp(gamma^2/2), gamma = ln(4)/4.
    sc = ScenarioStatic(label="het", heteroskedasticity_ratio=4.0)
    spec, arrays = lower.lower(
        grid=[4000],
        var_types=["normal"],
        effects=np.array([0.0, 0.0]),
        target_cols=[1],
        het_driver=1,
        scenario=sc,
    )
    resids_lo, resids_hi, all_r = [], [], []
    for s in range(12):
        X, y, _ = _gen_xy(spec, arrays, sim_id=s)
        x = X[:, 1]
        resids_lo.append(y[x < -1.0])
        resids_hi.append(y[x > 1.0])
        all_r.append(y)
    v_lo = np.var(np.concatenate(resids_lo))
    v_hi = np.var(np.concatenate(resids_hi))
    gamma = np.log(4.0) / 4.0
    # E[var | z>1] / E[var | z<-1]: ratio of E[exp(gamma z)] over truncated
    # normals; MGF of truncated normal: exp(gamma^2/2) Phi-ratio terms.
    def trunc_mgf(a, b):
        num = stats.norm.cdf(b - gamma) - stats.norm.cdf(a - gamma)
        den = stats.norm.cdf(b) - stats.norm.cdf(a)
        return np.exp(gamma**2 / 2) * num / den

    want_ratio = trunc_mgf(1.0, np.inf) / trunc_mgf(-np.inf, -1.0)
    assert abs(v_hi / v_lo - want_ratio) < 0.15 * want_ratio, (v_hi / v_lo, want_ratio)
    # mean variance preserved (renormalization): overall var stays ~1
    assert abs(np.var(np.concatenate(all_r)) - 1.0) < 0.05


def test_heterogeneity_power_ceiling():
    """Per-study beta jitter bounds power at ~Phi(1/h) + (1-Phi(1/h))*alpha."""
    h = 0.5
    sc = ScenarioStatic(label="het2", heterogeneity=h)
    spec, arrays = lower.lower(
        grid=[100000] if False else [4000],  # huge N so per-study truth dominates
        var_types=["normal"],
        effects=np.array([0.0, 0.3]),
        target_cols=[1],
        scenario=sc,
    )
    counts = batch.run_batch(spec, arrays, n_sims=1500, base_seed=3)
    power = counts["sig_unc"][0, 0] / counts["n_done"]
    ceiling = stats.norm.cdf(1 / h) + (1 - stats.norm.cdf(1 / h)) * 0.05
    assert power < ceiling + 0.02, (power, ceiling)
    assert power > 0.8 * ceiling  # at n=4000 the per-study test is near-certain
