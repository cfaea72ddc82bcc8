"""Tukey-HSD as a MARGINAL correction: per-target studentized-range crits.

The reference's CorrectionMethod::TukeyHsd (wire code 4) is a single-step
per-target comparison against (q_{alpha,k,df}/sqrt(2))^2 where k is the level
count L of the factor each target's column belongs to
(crates/engine-core/src/correction.rs:41-52, critvals.rs:827
build_with_tukey_k, batch.rs:2233 tukey_k_for_kernel_col). These tests pin
that construction (golden values from R qtukey), the per-target k mapping,
and the end-to-end engine behavior (tukey < uncorrected on an ANOVA design;
non-factor targets always fail; reduced-df rows carry real tukey layers).
"""

import numpy as np
import pytest
from scipy import stats as sps

from mcpower_tpu.engine import batch, critvals, lower
from mcpower_tpu.engine.spec import SimSpec, tukey_k_per_target


def test_q_tukey_golden_vs_r():
    # Same external-oracle goldens as the reference's C7 test
    # (critvals.rs:1866): R qtukey(0.95, 3, Inf) and qtukey(0.95, 4, 30).
    assert abs(critvals.q_tukey_ppf(0.95, 3.0, 1e6) - 3.314493) < 0.01
    assert abs(critvals.q_tukey_ppf(0.95, 4.0, 30.0) - 3.845401) < 1e-4
    # Degenerate inputs -> NaN, never finite garbage (critvals.rs:681-686).
    assert np.isnan(critvals.q_tukey_ppf(0.95, 1.0, 30.0))
    assert np.isnan(critvals.q_tukey_ppf(0.95, np.nan, 30.0))
    assert np.isnan(critvals.q_tukey_ppf(0.95, 3.0, 1.0))


def test_tukey_crit_rows_match_reference_construction():
    t = critvals.build_crit_table(
        alpha=0.05,
        grid=[40, 80],
        p_fit=4,
        n_targets=3,
        use_t=True,
        correction="tukey_hsd",
        tukey_k_per_target=[3.0, 3.0, float("nan")],
    )
    for g, n in enumerate([40, 80]):
        df = n - 4
        expected = (sps.studentized_range.ppf(0.95, 3, df) / np.sqrt(2.0)) ** 2
        assert np.isclose(t.t2_corrected_ranks[g, 0], expected, rtol=1e-10)
        assert np.isclose(t.t2_corrected_ranks[g, 1], expected, rtol=1e-10)
        # Non-factor target: NaN threshold -> always fails.
        assert np.isnan(t.t2_corrected_ranks[g, 2])
    # Tukey crit sits strictly above the uncorrected two-sided t crit.
    assert (t.t2_corrected_ranks[:, 0] > t.t2_uncorrected[:, 0]).all()


def test_tukey_uses_residual_df_even_for_wald_z_arms():
    # The reference feeds df = N - P into the studentized range regardless of
    # estimator (critvals.rs:936 computes df before the estimator switch).
    t = critvals.build_crit_table(
        alpha=0.05,
        grid=[50],
        p_fit=3,
        n_targets=1,
        use_t=False,  # Wald-z marginals (GLM/MLE arm)
        correction="tukey_hsd",
        tukey_k_per_target=[3.0],
    )
    expected = (sps.studentized_range.ppf(0.95, 3, 47) / np.sqrt(2.0)) ** 2
    assert np.isclose(t.t2_corrected_ranks[0, 0], expected, rtol=1e-10)


def test_tukey_k_per_target_mapping():
    # Layout: [const | x (cont) | g1 dummies (2) | g2 dummy (1) | x:g1[1]].
    spec = SimSpec(
        max_n=100,
        grid=(100,),
        n_cont=1,
        var_types=(0,),
        var_pinned=(False,),
        factor_levels=(3, 2),
        factor_sampled=(None, None),
        interactions=((1, 2),),
        target_cols=(1, 2, 3, 4, 5),  # x, g1[1], g1[2], g2[1], x:g1[1]
        contrasts=((2, 3),),  # g1[1] - g2[1]: k from the POSITIVE side (g1)
        correction="tukey_hsd",
    )
    ks = tukey_k_per_target(spec)
    assert len(ks) == 6
    assert np.isnan(ks[0])  # continuous predictor -> no factor
    assert ks[1] == 3.0 and ks[2] == 3.0  # g1 dummies
    assert ks[3] == 2.0  # g2 dummy
    assert np.isnan(ks[4])  # interaction column -> no factor
    assert ks[5] == 3.0  # contrast k from positive side's factor


def _anova_counts(correction, n_sims=400, seed=11, effect=0.45, n=60):
    spec, arrays = lower.lower(
        grid=[n],
        var_types=[],
        factor_levels=[3],
        factor_props=[1 / 3] * 3,
        effects=np.array([0.0, effect, effect / 2]),
        target_cols=[1, 2],
        correction=correction,
    )
    return spec, arrays, batch.run_batch(spec, arrays, n_sims=n_sims, base_seed=seed)


def test_tukey_anova_power_below_uncorrected():
    """On a one-factor ANOVA design the Tukey-corrected rejection count must
    sit strictly below the uncorrected count (the round-2 silent no-op made
    them identical) and match an independent recomputation from captured t^2."""
    spec, arrays, counts = _anova_counts("tukey_hsd")
    sig_unc = counts["sig_unc"][0]
    sig_corr = counts["sig_corr"][0]
    assert (sig_corr < sig_unc).all(), (sig_corr, sig_unc)

    # Independent recomputation: capture per-sim t^2 (correction-independent)
    # and threshold against a scipy-built studentized-range crit.
    cap = batch.run_batch_capture(spec, arrays, n_sims=400, base_seed=11)
    t2 = cap["t2"][:, 0, :]  # (sims, targets)
    conv = cap["converged"][:, 0].astype(bool)
    df = 60 - 3
    crit = (sps.studentized_range.ppf(0.95, 3, df) / np.sqrt(2.0)) ** 2
    expected = ((t2 > crit) & conv[:, None]).sum(axis=0)
    np.testing.assert_array_equal(sig_corr, expected)


def test_tukey_joint_and_hist_use_corrected_flags():
    spec, arrays, counts = _anova_counts("tukey_hsd")
    _, _, counts_none = _anova_counts("none")
    # Uncorrected flags identical across the two runs (same seed, same t2).
    np.testing.assert_array_equal(counts["sig_unc"], counts_none["sig_unc"])
    # Corrected joint count can only shrink under Tukey.
    assert counts["joint_corr"][0] <= counts_none["joint_corr"][0]


def test_tukey_nonfactor_target_never_rejects():
    spec, arrays = lower.lower(
        grid=[80],
        var_types=["normal"],
        effects=np.array([0.0, 0.8]),  # huge effect on the continuous column
        target_cols=[1],
        correction="tukey_hsd",
    )
    counts = batch.run_batch(spec, arrays, n_sims=100, base_seed=5)
    assert counts["sig_unc"][0, 0] > 90  # uncorrected: essentially always
    assert counts["sig_corr"][0, 0] == 0  # tukey on a non-factor: always fail


def test_tukey_reduced_df_stack_has_real_layers():
    """Sparse-factor refits must threshold tukey at the REDUCED df."""
    spec, arrays = lower.lower(
        grid=[60],
        var_types=[],
        factor_levels=[3],
        factor_props=[1 / 3] * 3,
        effects=np.zeros(3),
        target_cols=[1, 2],
        correction="tukey_hsd",
    )
    stack = np.asarray(arrays["t2_corr_by_dropped"])  # (G, D+1, k)
    assert stack.shape[1] >= 2
    d0 = (sps.studentized_range.ppf(0.95, 3, 60 - 3) / np.sqrt(2.0)) ** 2
    d2 = (sps.studentized_range.ppf(0.95, 3, 60 - 1) / np.sqrt(2.0)) ** 2
    assert np.isclose(stack[0, 0, 0], d0, rtol=1e-10)
    assert np.isclose(stack[0, 2, 0], d2, rtol=1e-10)


def test_user_alias_tukey_reaches_engine():
    from mcpower_tpu import MCPower

    m = MCPower("y ~ g")
    m.set_variable_type("g=(factor,3)")
    m.set_effects("g[2]=0.5, g[3]=0.5")
    m.set_simulations(150)
    res_t = m.find_power(sample_size=90, correction="tukey", verbose=False)
    m2 = MCPower("y ~ g")
    m2.set_variable_type("g=(factor,3)")
    m2.set_effects("g[2]=0.5, g[3]=0.5")
    m2.set_simulations(150)
    res_n = m2.find_power(sample_size=90, verbose=False)
    assert res_t["alpha_correction"] == "tukey_hsd"
    for j in range(len(res_t["target_labels"])):
        corr_t = res_t["powers"]["corrected"][0][j]
        unc_n = res_n["powers"]["uncorrected"][0][j]
        assert corr_t < unc_n
        # same seed, same draws: the uncorrected side is untouched by tukey
        assert res_t["powers"]["uncorrected"][0][j] == unc_n


def test_tukey_with_explicit_marginal_targets_warns():
    """correction='tukey' + explicitly named marginal targets warns
    (reference spec_builder.py:306-323); the default all-betas shorthand
    (target_test=None) stays silent."""
    import warnings as _w

    from mcpower_tpu import MCPower

    def mk():
        m = MCPower("y ~ x1 + g")
        m.set_variable_type("g=(factor,3)")
        m.set_effects("x1=0.3, g[2]=0.4").set_simulations(40).set_seed(5)
        return m

    with _w.catch_warnings(record=True) as w:
        _w.simplefilter("always")
        mk().find_power(100, target_test="all, all-contrasts",
                        correction="tukey", verbose=False)
    assert any("Tukey HSD" in str(x.message) for x in w), [str(x.message) for x in w]

    with _w.catch_warnings(record=True) as w2:
        _w.simplefilter("always")
        mk().find_power(100, correction="tukey", verbose=False)
    assert not any("Tukey HSD" in str(x.message) for x in w2)
