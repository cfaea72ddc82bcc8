"""End-to-end OLS power: engine estimates vs analytic truth.

The Monte-Carlo analogue of the reference's statistical-correctness
integration tests (SURVEY.md §4.2): run the full jitted pipeline and compare
the power estimate to closed-form values within Wilson-band tolerance.
"""

import numpy as np
import pytest
from scipy import stats

from mcpower_tpu.engine import batch, lower
from mcpower_tpu.engine.spec import ScenarioStatic


def analytic_ols_power(beta, n, alpha=0.05, p_fit=2, sd_x=1.0):
    """Two-sided t-test power for one standardized coefficient, sigma=1."""
    df = n - p_fit
    ncp = beta * sd_x * np.sqrt(n)
    tcrit = stats.t.ppf(1 - alpha / 2, df)
    # scipy's nct.cdf underflows to NaN in the far-left tail at large ncp;
    # the term is <= 1e-20 there, so zero is the correct limit.
    left = np.nan_to_num(stats.nct.cdf(-tcrit, df, ncp))
    return 1 - stats.nct.cdf(tcrit, df, ncp) + left


def test_single_continuous_predictor_power():
    # y = 0.3 x + eps, n = 100: analytic power ~0.85
    spec, arrays = lower.lower(
        grid=[100],
        var_types=["normal"],
        effects=np.array([0.0, 0.3]),
        target_cols=[1],
    )
    counts = batch.run_batch(spec, arrays, n_sims=4000, base_seed=2137)
    power = counts["sig_unc"][0, 0] / counts["n_done"]
    want = analytic_ols_power(0.3, 100)
    assert abs(power - want) < 0.02, (power, want)
    assert counts["converged"][0] == counts["n_done"]


def test_two_group_t_test_as_binary_ols():
    # Driver acceptance config #1: two-group t-test, n=100, d=0.5.
    # Binary 50/50 predictor, beta = d/2 per unit of the 0/1 dummy... the
    # standardized effect convention: with x in {0,1} (p=.5, sd=.5) and
    # beta=0.5, the group mean difference is 0.5 => classic d=0.5 power ~0.70.
    spec, arrays = lower.lower(
        grid=[100],
        var_types=["binary"],
        var_params=[0.5],
        effects=np.array([0.0, 0.5]),
        target_cols=[1],
    )
    counts = batch.run_batch(spec, arrays, n_sims=4000, base_seed=2137)
    power = counts["sig_unc"][0, 0] / counts["n_done"]
    # analytic two-sample t power, n1=n2=50, d=0.5
    want = analytic_ols_power(0.5, 100, sd_x=0.5)
    assert abs(power - want) < 0.025, (power, want)


def test_null_effect_rejects_at_alpha():
    spec, arrays = lower.lower(
        grid=[80],
        var_types=["normal", "normal"],
        effects=np.array([0.0, 0.0, 0.4]),
        target_cols=[1, 2],
    )
    counts = batch.run_batch(spec, arrays, n_sims=4000, base_seed=7)
    a_hat = counts["sig_unc"][0, 0] / counts["n_done"]
    assert abs(a_hat - 0.05) < 0.012, a_hat


def test_grid_prefix_power_is_monotone_and_matches_single_runs():
    """CRN grid: power from one grid run == power from per-N runs (same seed)."""
    spec_g, arr_g = lower.lower(
        grid=[40, 80, 160],
        var_types=["normal"],
        effects=np.array([0.0, 0.35]),
        target_cols=[1],
    )
    counts_g = batch.run_batch(spec_g, arr_g, n_sims=1500, base_seed=11)
    for gi, n in enumerate([40, 80, 160]):
        spec_1, arr_1 = lower.lower(
            grid=[n],
            var_types=["normal"],
            effects=np.array([0.0, 0.35]),
            target_cols=[1],
        )
        counts_1 = batch.run_batch(spec_1, arr_1, n_sims=1500, base_seed=11)
        assert counts_1["sig_unc"][0, 0] == counts_g["sig_unc"][gi, 0], (
            "prefix stability: grid point must equal standalone run"
        )
    p = counts_g["sig_unc"][:, 0] / counts_g["n_done"]
    assert p[0] < p[1] < p[2]


def test_correlated_predictors_reduce_power():
    effects = np.array([0.0, 0.3, 0.3])
    spec_i, arr_i = lower.lower(
        grid=[120],
        var_types=["normal", "normal"],
        effects=effects,
        target_cols=[1, 2],
    )
    corr = np.array([[1.0, 0.6], [0.6, 1.0]])
    spec_c, arr_c = lower.lower(
        grid=[120],
        var_types=["normal", "normal"],
        corr=corr,
        effects=effects,
        target_cols=[1, 2],
    )
    ci = batch.run_batch(spec_i, arr_i, n_sims=2000, base_seed=3)
    cc = batch.run_batch(spec_c, arr_c, n_sims=2000, base_seed=3)
    p_ind = ci["sig_unc"][0, 0] / ci["n_done"]
    p_cor = cc["sig_unc"][0, 0] / cc["n_done"]
    assert p_cor < p_ind - 0.05, (p_ind, p_cor)


def test_chunking_is_invisible():
    spec, arrays = lower.lower(
        grid=[60],
        var_types=["normal"],
        effects=np.array([0.0, 0.4]),
        target_cols=[1],
    )
    a = batch.run_batch(spec, arrays, n_sims=1000, base_seed=5, chunk_size=1000)
    b = batch.run_batch(spec, arrays, n_sims=1000, base_seed=5, chunk_size=137)
    for k in ("sig_unc", "sig_corr", "converged"):
        np.testing.assert_array_equal(a[k], b[k])


def test_bonferroni_correction_reduces_power():
    spec, arrays = lower.lower(
        grid=[100],
        var_types=["normal", "normal", "normal"],
        effects=np.array([0.0, 0.3, 0.3, 0.3]),
        target_cols=[1, 2, 3],
        correction="bonferroni",
    )
    counts = batch.run_batch(spec, arrays, n_sims=2000, base_seed=13)
    p_unc = counts["sig_unc"][0] / counts["n_done"]
    p_cor = counts["sig_corr"][0] / counts["n_done"]
    assert np.all(p_cor < p_unc)
    # Bonferroni at alpha/3: analytic single-test power at that alpha
    want = analytic_ols_power(0.3, 100, alpha=0.05 / 3, p_fit=4)
    assert np.all(np.abs(p_cor - want) < 0.03), (p_cor, want)


def test_overall_f_null_rate():
    spec, arrays = lower.lower(
        grid=[90],
        var_types=["normal", "normal"],
        effects=np.array([0.0, 0.0, 0.0]),
        target_cols=[1, 2],
        report_overall=True,
    )
    counts = batch.run_batch(spec, arrays, n_sims=3000, base_seed=17)
    rate = counts["overall"][0] / counts["n_done"]
    assert abs(rate - 0.05) < 0.012, rate


def test_power_accuracy_at_5_sigma_alpha():
    """Extreme-tail regime (alpha = 5e-7, the 5-sigma claim of BASELINE.md
    row 2): MC power within 1 pp of the exact oracle.

    Oracle: for simple regression with random N(0,1) x and unit residuals,
    the t statistic given realized Sxx = sum (x_i - xbar)^2 is noncentral-t
    with ncp = beta sqrt(Sxx); Sxx ~ chi2_{N-1}. Power = E_Sxx[nct tail],
    integrated numerically — independent of all engine code.
    """
    alpha = 5e-7
    beta_true, N, n_sims = 0.55, 100, 40_000
    spec, arrays = lower.lower(
        grid=[N],
        alpha=alpha,
        var_types=["normal"],
        effects=np.array([0.0, beta_true]),
        target_cols=[1],
    )
    counts = batch.run_batch(spec, arrays, n_sims=n_sims, base_seed=2137)
    p_hat = counts["sig_unc"][0, 0] / counts["n_done"]

    df = N - 2
    tcrit = stats.t.ppf(1 - alpha / 2, df)
    s_grid = np.linspace(stats.chi2.ppf(1e-10, N - 1),
                         stats.chi2.ppf(1 - 1e-10, N - 1), 4001)
    w = stats.chi2.pdf(s_grid, N - 1)
    ncp = beta_true * np.sqrt(s_grid)
    # left-tail nct.cdf underflows to NaN at large ncp (term <= 1e-20 -> 0)
    tail = (1 - stats.nct.cdf(tcrit, df, ncp)
            + np.nan_to_num(stats.nct.cdf(-tcrit, df, ncp)))
    oracle = np.trapezoid(w * tail, s_grid) / np.trapezoid(w, s_grid)
    assert 0.2 < oracle < 0.95, oracle  # test sits in the informative band
    assert abs(p_hat - oracle) < 0.01, (p_hat, oracle)


def test_power_accuracy_at_5_sigma_composed_scenario():
    """BASELINE.md acceptance row 5 COMPOSED (VERDICT r4 #6): heterogeneous
    effects + non-normal residual swaps (the outlier mechanism:
    high-kurtosis t(8) / right-skewed chi2(8)) at alpha = 5e-7, power
    within 1 pp.

    Oracle: an independent vectorized NumPy simulator implementing the
    documented scenario semantics (data_gen.rs:700-760 beta-jitter with
    toward-zero clipping; residual swap = per-sim Bernoulli(prob) then
    uniform pick from the pool, data_gen.rs:430-505 unit-variance
    families) with its OWN rng — statistical agreement, not bitwise.
    400k oracle + 40k engine sims put the combined MC SE ~0.26 pp against
    the 1 pp bar.
    """
    alpha = 5e-7
    beta_true, N, n_sims = 0.55, 100, 40_000
    het, swap_prob, df = 0.3, 0.5, 8
    scen = ScenarioStatic(
        label="robust5",
        heterogeneity=het,
        residual_change_prob=swap_prob,
        residual_dists=("high_kurtosis", "right_skewed"),
        residual_df=float(df),
    )
    spec, arrays = lower.lower(
        grid=[N],
        alpha=alpha,
        var_types=["normal"],
        effects=np.array([0.0, beta_true]),
        target_cols=[1],
        scenario=scen,
    )
    counts = batch.run_batch(spec, arrays, n_sims=n_sims, base_seed=2137)
    p_hat = counts["sig_unc"][0, 0] / counts["n_done"]

    tcrit = stats.t.ppf(1 - alpha / 2, N - 2)
    rs = np.random.default_rng(424242)
    hits = 0
    B_total, B_chunk = 400_000, 25_000
    t_scale = np.sqrt((df - 2.0) / df)
    chi_scale = 1.0 / np.sqrt(2.0 * df)
    for _ in range(B_total // B_chunk):
        B = B_chunk
        X = rs.standard_normal((B, N))
        # heterogeneity beta-jitter, clipped toward zero (beta_true > 0)
        beta_eff = np.maximum(
            beta_true + rs.standard_normal(B) * het * beta_true, 0.0
        )
        # residual swap: Bernoulli(prob), then uniform pick from the pool
        swap = rs.random(B) < swap_prob
        pick = np.minimum((rs.random(B) * 2).astype(int), 1)
        eps = rs.standard_normal((B, N))
        t_eps = rs.standard_t(df, (B, N)) * t_scale
        chi_eps = (rs.chisquare(df, (B, N)) - df) * chi_scale
        eps = np.where(
            swap[:, None],
            np.where(pick[:, None] == 0, t_eps, chi_eps),
            eps,
        )
        y = X * beta_eff[:, None] + eps
        xm = X.mean(1, keepdims=True)
        ym = y.mean(1, keepdims=True)
        Xc, yc = X - xm, y - ym
        sxx = (Xc * Xc).sum(1)
        b1 = (Xc * yc).sum(1) / sxx
        resid = yc - b1[:, None] * Xc
        s2 = (resid * resid).sum(1) / (N - 2)
        t = b1 / np.sqrt(s2 / sxx)
        hits += int(np.sum(np.abs(t) > tcrit))
    oracle = hits / B_total
    assert 0.1 < oracle < 0.95, oracle  # informative regime
    assert abs(p_hat - oracle) < 0.01, (p_hat, oracle)


def test_overall_f_power_matches_noncentral_f_oracle():
    """Omnibus-F power vs the exact conditional oracle (SURVEY 4.5 oracle
    family): given a realized design, the overall F statistic for H0 "all
    slopes zero" is noncentral F(P-1, N-P, ncp = b' Xc'Xc b) with sigma=1.
    The oracle averages the exact ncf tail over independently drawn
    designs (numpy/scipy only — no engine code)."""
    N, beta = 120, np.array([0.0, 0.25, 0.15, 0.10])
    corr = np.full((3, 3), 0.2) + 0.8 * np.eye(3)
    spec, arrays = lower.lower(
        grid=[N],
        var_types=["normal"] * 3,
        corr=corr,
        effects=beta,
        target_cols=[1],
        report_overall=True,
    )
    counts = batch.run_batch(spec, arrays, n_sims=4000, base_seed=23)
    got = counts["overall"][0] / counts["n_done"]

    rs = np.random.default_rng(99)
    L = np.linalg.cholesky(corr)
    df1, df2 = 3, N - 4
    fcrit = stats.f.ppf(0.95, df1, df2)
    powers = []
    for _ in range(3000):
        X = rs.standard_normal((N, 3)) @ L.T
        Xc = X - X.mean(0, keepdims=True)
        ncp = beta[1:] @ (Xc.T @ Xc) @ beta[1:]
        powers.append(stats.ncf.sf(fcrit, df1, df2, ncp))
    want = float(np.mean(powers))
    assert 0.2 < want < 0.98, want  # informative regime
    assert abs(got - want) < 0.025, (got, want)
