"""End-to-end user API: the MCPower class drives the full stack."""

import numpy as np
import pytest

from mcpower_tpu import MCPower


def test_simple_regression_find_power():
    m = MCPower("y ~ x1 + x2")
    m.set_effects("x1=0.3, x2=0.2").set_simulations(1200).set_seed(42)
    res = m.find_power(sample_size=120, verbose=False)
    assert res["target_labels"] == ["x1", "x2"]
    p1 = res["power_uncorrected"] if "power_uncorrected" in res else None
    p_x1 = res["powers"]["uncorrected"][0][0]
    p_x2 = res["powers"]["uncorrected"][0][1]
    assert p_x1 > p_x2 > 0.3
    assert res["overall_significant_rate"] is not None
    assert res["result_kind"] == "power"


def test_chained_setters_and_scenarios_envelope():
    m = (
        MCPower("y ~ x1*x2")
        .set_effects({"x1": 0.4, "x2": 0.3, "x1:x2": 0.2})
        .set_correlations("corr(x1, x2)=0.3")
        .set_simulations(600)
    )
    res = m.find_power(sample_size=150, scenarios=True, verbose=False)
    assert set(res["scenarios"]) == {"optimistic", "realistic", "doomer"}
    p_opt = res["scenarios"]["optimistic"]["powers"]["uncorrected"][0][0]
    p_doom = res["scenarios"]["doomer"]["powers"]["uncorrected"][0][0]
    assert p_doom < p_opt  # robustness scenarios cost power


def test_factor_anova_with_posthoc():
    m = MCPower("y ~ g")
    m.set_variable_type("g=(factor,0.4,0.3,0.3)")
    m.set_effects("g[2]=0.5, g[3]=0.25")
    m.set_simulations(800)
    res = m.find_power(
        sample_size=120, target_test="all, all-contrasts", verbose=False
    )
    assert res["target_labels"] == ["g[2]", "g[3]"]
    assert "g" in res["posthoc"]
    assert set(res["posthoc"]["g"]) == {
        "g[1] vs g[2]", "g[1] vs g[3]", "g[2] vs g[3]",
    }
    # g[2] carries the bigger effect
    assert (
        res["powers"]["uncorrected"][0][0] > res["powers"]["uncorrected"][0][1]
    )


def test_logit_with_baseline_probability():
    m = MCPower("y ~ x1", family="logit")
    m.set_baseline_probability(0.3)
    m.set_effects("x1=0.4")
    m.set_simulations(800)
    res = m.find_power(sample_size=250, verbose=False)
    assert 0.4 < res["powers"]["uncorrected"][0][0] < 0.95
    extras = res["estimator_extras"]["glm"]
    assert abs(extras["baseline_prob_realized"][0] - 0.3) < 0.05


def test_poisson_with_baseline_rate():
    m = MCPower("y ~ x1", family="poisson")
    m.set_baseline_rate(2.0)
    m.set_effects("x1=0.15")
    m.set_simulations(600)
    res = m.find_power(sample_size=200, verbose=False)
    assert res["powers"]["uncorrected"][0][0] > 0.5


def test_lme_random_intercept():
    m = MCPower("y ~ x + (1|site)", family="lme")
    m.set_cluster("site", ICC=0.2, n_clusters=20)
    m.set_effects("x=0.35")
    m.set_simulations(500)
    res = m.find_power(sample_size=200, verbose=False)
    assert res["estimator"] == "mle"
    assert 0.8 < res["powers"]["uncorrected"][0][0] <= 1.0
    assert "tau_squared_hat_mean" in res["estimator_extras"]["mle"]


def test_lme_estimator_override_ols():
    m = MCPower("y ~ x + (1|site)", family="lme", estimator="ols")
    m.set_cluster("site", ICC=0.3, n_clusters=20)
    m.set_effects("x=0.3")
    m.set_simulations(400)
    res = m.find_power(sample_size=200, verbose=False)
    assert res["estimator"] == "ols"


def test_find_sample_size_end_to_end():
    m = MCPower("y ~ x1")
    m.set_effects("x1=0.3").set_simulations(1200)
    res = m.find_sample_size(from_size=30, to_size=300, verbose=False)
    fit = res["fitted"]["x1"]
    assert fit["kind"] == "fitted"
    assert 60 <= fit["n_achievable"] <= 120
    assert res["first_achieved"]["x1"] is not None


def test_cluster_snapping_warning():
    m = MCPower("y ~ x + (1|site)", family="lme")
    m.set_cluster("site", ICC=0.2, n_clusters=20)
    m.set_effects("x=0.3").set_simulations(200)
    res = m.find_power(sample_size=205, verbose=False)
    assert res["sample_sizes"] == [200]
    assert any("cluster atom" in w for w in res["warnings"])


def test_correction_argument_aliases():
    m = MCPower("y ~ x1 + x2 + x3")
    m.set_effects("x1=0.3, x2=0.3, x3=0.3").set_simulations(500)
    res = m.find_power(sample_size=100, correction="fdr", verbose=False)
    assert res["alpha_correction"] == "benjamini_hochberg"
    p_corr = np.asarray(res["powers"]["corrected"][0])
    p_unc = np.asarray(res["powers"]["uncorrected"][0])
    assert np.all(p_corr <= p_unc + 1e-12)


def test_target_test_dsl():
    m = MCPower("y ~ x1 + x2")
    m.set_effects("x1=0.4, x2=0.3").set_simulations(300)
    res = m.find_power(
        sample_size=100, target_test="all, -x2, overall", verbose=False
    )
    assert res["target_labels"] == ["x1"]
    assert res["overall_significant_rate"] is not None


def test_error_paths():
    m = MCPower("y ~ x1")
    with pytest.raises(ValueError, match="unknown assignment name"):
        m.set_effects("bogus=0.5")
        m.find_power(sample_size=50, n_sims=10, verbose=False)
    with pytest.raises(ValueError, match="family"):
        MCPower("y ~ x", family="weibull")
    with pytest.raises(ValueError, match="grouping"):
        MCPower("y ~ x + (1|g)", family="lme").set_cluster("h", ICC=0.2, n_clusters=10)
    m2 = MCPower("y ~ x", family="logit")
    with pytest.raises(ValueError, match="baseline_rate"):
        m2.set_baseline_rate(2.0)


def test_reports_render():
    from mcpower_tpu.output.report import power_report, sample_size_report

    m = MCPower("y ~ x1")
    m.set_effects("x1=0.4").set_simulations(400)
    res = m.find_power(sample_size=100, correction="bonferroni", verbose=False)
    txt = power_report(res)
    assert "Power" in txt and "x1" in txt and "CI 95%" in txt
    res2 = m.find_sample_size(from_size=30, to_size=200, n_sims=400, verbose=False)
    txt2 = sample_size_report(res2)
    assert "Required N" in txt2 and "x1" in txt2


def test_contract_roundtrip_and_validation():
    from mcpower_tpu.contract.types import SimulationContract
    from mcpower_tpu.contract.validate import ContractError, validate
    from mcpower_tpu.specbuilder.project import build_contracts
    from mcpower_tpu.specbuilder.variables import VariableRegistry

    reg = VariableRegistry("y ~ x1*x2 + g")
    reg.set_variable_type("g", {"type": "factor", "n_levels": 3,
                                "proportions": [1 / 3] * 3})
    ps = build_contracts(reg, effects={"x1": 0.3, "g[2]": 0.2})[0]
    c = ps.contract
    validate(c)
    # JSON round-trip preserves everything
    c2 = SimulationContract.from_json(c.to_json())
    assert c2.to_dict() == c.to_dict()
    # invariant 01: wrong coefficient count
    c2.outcome.coefficients = c2.outcome.coefficients[:-1]
    with pytest.raises(ContractError, match="invariant 01"):
        validate(c2)
    # invariant 15: bad alpha
    c3 = SimulationContract.from_json(c.to_json())
    c3.test.alpha = 1.5
    with pytest.raises(ContractError, match="invariant 15"):
        validate(c3)


def test_strict_reuse_warning_fires():
    """Strict-bootstrap runs far beyond the pilot size warn the user
    (reference model.py _strict_reuse_warning; VERDICT missing #7)."""
    rng = np.random.default_rng(3)
    d = {"x1": rng.normal(size=100), "y": rng.normal(size=100)}
    m = MCPower("y ~ x1")
    m.set_effects("x1=0.4").set_simulations(50)
    m.upload_data(d, mode="strict")
    res = m.find_power(sample_size=300, verbose=False)
    assert any("strict" in w and "300" in w for w in res["warnings"]), res["warnings"]
    # under the ratio: silent
    res2 = m.find_power(sample_size=150, verbose=False)
    assert not any("strict" in w for w in res2["warnings"])


def test_glmm_laplace_bias_warning_fires():
    """High estimated tau^2 + small clusters => Laplace-bias warning
    (reference model.py:111-147)."""
    m = MCPower("y ~ x + (1|site)", family="logit")
    m.set_cluster("site", ICC=0.5, n_clusters=20)
    m.set_effects("x=0.3").set_simulations(80)
    m.set_baseline_probability(0.5)
    res = m.find_power(sample_size=100, verbose=False)  # 5 rows/cluster < 10
    tau = max(res["estimator_extras"]["glm"]["tau_squared_hat_mean"])
    assert tau > 1.0  # true tau^2 ~ 3.29 at ICC 0.5 (logit)
    assert any("Laplace" in w for w in res["warnings"]), res["warnings"]


def test_result_wrapper_objects():
    """Results are dict-compatible wrappers with .summary() and HTML repr
    (reference ports/py/mcpower/output/results.py)."""
    from mcpower_tpu.output.results import PowerResult, SampleSizeResult

    m = MCPower("y ~ x1")
    m.set_effects("x1=0.5").set_simulations(200)
    res = m.find_power(sample_size=100, verbose=False)
    assert isinstance(res, PowerResult)
    assert isinstance(res, dict)  # raw-tree compatibility
    txt = res.summary()
    assert "Power" in txt and "x1" in txt
    html = res._repr_html_()
    assert "<table" in html and "x1" in html
    assert "optimistic" in res.scenarios

    res2 = m.find_sample_size(
        from_size=40, to_size=160, n_sims=200, verbose=False
    )
    assert isinstance(res2, SampleSizeResult)
    assert "Required N" in res2.summary()
    assert "<table" in res2._repr_html_()

    # scenario envelope wraps too, with merged warnings + comparison intact
    res3 = m.find_power(sample_size=100, scenarios=True, verbose=False)
    assert isinstance(res3, PowerResult)
    assert set(res3.scenarios) >= {"optimistic", "realistic", "doomer"}
    assert "<table" in res3._repr_html_()


def test_to_simulation_spec_round_trips():
    """to_simulation_spec returns the L1 contract dict (reference
    model.py:1621): serializable, scenario-stamped, effects required."""
    import json

    from mcpower_tpu.contract.types import SimulationContract

    m = MCPower("y ~ x1 + x2")
    with pytest.raises(RuntimeError, match="set_effects"):
        m.to_simulation_spec()
    m.set_effects("x1=0.3, x2=0.2")
    d = m.to_simulation_spec("optimistic")
    json.dumps(d)  # wire-serializable
    c = SimulationContract.from_dict(d)
    assert c.scenario.label == "optimistic"
    assert len(c.outcome.coefficients) == 3  # const + x1 + x2
    with pytest.raises(ValueError, match="unknown scenario"):
        m.to_simulation_spec("nope")


def test_removed_setters_raise_instructive_errors():
    """The reference intercepts the removed v2 setters with migration
    pointers (model.py:318-344); unknown names stay plain AttributeErrors."""
    m = MCPower("y ~ x1")
    with pytest.raises(AttributeError, match="target_test=.*find_power"):
        m.set_tests
    with pytest.raises(AttributeError, match="correction=.*find_power"):
        m.set_correction_method
    with pytest.raises(AttributeError, match="no attribute 'set_bogus'"):
        m.set_bogus
    # __getattr__ must not shadow real attributes or break copying/pickling
    assert m.set_seed(7) is m


def test_greens_rule_minimum_sample_size():
    """find_power enforces N >= 15 + p (reference validators.py:165 — a
    hard error, not a warning): p counts design-matrix columns excluding
    the intercept, factor dummies and interactions included."""
    import pytest

    m = MCPower("y ~ x1 + x2")
    m.set_effects("x1=0.4, x2=0.3").set_simulations(50)
    with pytest.raises(ValueError, match="Green"):
        m.find_power(sample_size=16, verbose=False)  # < 15 + 2
    m.find_power(sample_size=17, verbose=False)  # == 15 + 2 passes

    f = MCPower("y ~ g")
    f.set_variable_type("g=(factor,5)")
    f.set_effects("g[2]=0.4").set_simulations(50)
    with pytest.raises(ValueError, match="Green"):
        f.find_power(sample_size=18, verbose=False)  # p = 4 dummies -> 19


def test_logit_effect_scale_warning_tiers():
    """Two-tier scale warning (reference validators.py:386): |β|>5 on any
    logit effect; |β|>3 only on all-continuous effects. Binary predictors
    at |β|=4 stay silent; gaussian models never warn."""
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = MCPower("y ~ x", family="logit")
        m.set_effects("x=6.0").set_simulations(20)
        m._ensure_applied()
    assert any("|β|>5" in str(x.message) for x in w)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = MCPower("y ~ x", family="logit")
        m.set_effects("x=4.0").set_simulations(20)
        m._ensure_applied()
    assert any("|β|>3" in str(x.message) for x in w)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = MCPower("y ~ b", family="logit")
        m.set_variable_type("b=binary")
        m.set_effects("b=4.0").set_simulations(20)
        m._ensure_applied()
    assert not any("|β|" in str(x.message) for x in w)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = MCPower("y ~ x")  # gaussian: β is in SD units, no OR reading
        m.set_effects("x=6.0").set_simulations(20)
        m._ensure_applied()
    assert not any("|β|" in str(x.message) for x in w)


def test_set_cluster_requires_a_sizing_argument():
    import pytest

    m = MCPower("y ~ x1 + (1|school)", family="lme")
    m.set_effects("x1=0.5")
    with pytest.raises(ValueError, match="Must specify"):
        m.set_cluster("school", ICC=0.2)


def test_lme_find_power_without_set_cluster_raises():
    """family='lme' with a formula grouping but no set_cluster call fails
    fast at find_power — the DGP would otherwise silently generate
    without the random effect."""
    import pytest

    m = MCPower("y ~ x1 + (1|school)", family="lme")
    m.set_effects("x1=0.5").set_simulations(50)
    with pytest.raises(ValueError, match="set_cluster"):
        m.find_power(sample_size=100, verbose=False)
    # clustered logit gets the same guard
    g = MCPower("y ~ x1 + (1|site)", family="logit")
    g.set_effects("x1=0.5").set_simulations(50)
    with pytest.raises(ValueError, match="set_cluster"):
        g.find_power(sample_size=100, verbose=False)
    # sizing only ONE of two declared groupings still fails, naming the gap
    c = MCPower("y ~ x + (1|subject) + (1|item)", family="lme")
    c.set_effects("x=0.3").set_simulations(50)
    c.set_cluster("subject", ICC=0.2, n_clusters=10)
    with pytest.raises(ValueError, match="item"):
        c.find_power(sample_size=100, verbose=False)


def test_max_failed_threshold_semantics():
    """_check_failure_threshold edge semantics (reference test suite):
    strictly-above raises, exactly-at passes, threshold 1 never raises,
    the WORST grid point triggers on multi-N results."""
    import pytest

    m = MCPower("y ~ x1")
    m.set_effects("x1=0.3")
    m.max_failed_simulations = 0.10

    m._check_failure_threshold({"convergence_rate": [0.90]})  # exactly at
    m._check_failure_threshold({"convergence_rate": [0.95]})  # below
    with pytest.raises(RuntimeError, match="failed to converge"):
        m._check_failure_threshold({"convergence_rate": [0.85]})
    # multi-N: the worst grid point decides
    with pytest.raises(RuntimeError):
        m._check_failure_threshold({"convergence_rate": [0.99, 0.80, 0.97]})
    m.max_failed_simulations = 1.0
    m._check_failure_threshold({"convergence_rate": [0.0]})  # never raises


def test_poisson_without_baseline_rate_raises():
    import pytest

    m = MCPower("y ~ x1", family="poisson")
    m.set_effects("x1=0.3").set_simulations(50)
    with pytest.raises(ValueError, match="baseline rate required"):
        m.find_power(sample_size=100, verbose=False)


def test_dummy_interaction_effect_names_assignable():
    """Every name the model reports in effect_names is assignable via
    set_effects — including factor-dummy interactions like g1[2]:g2[2] —
    while base factor names (g1, g1:g2) are rejected with the available
    list, matching the reference port's strict post-expansion resolution
    (reference model.py:1484-1502)."""
    def mk():
        m = MCPower("y ~ g1*g2")
        m.set_variable_type("g1=(factor,3)")
        m.set_variable_type("g2=(factor,3)")
        return m

    m = mk()
    m.set_effects("g1[2]:g2[2]=0.25")
    m._ensure_applied()
    assert m._effects == {"g1[2]:g2[2]": 0.25}
    assert "g1[2]:g2[2]" in m.effect_names

    for bad in ("g1:g2=0.3", "g1=0.3"):
        m2 = mk()
        m2.set_effects(bad)
        with pytest.raises(ValueError, match="available:"):
            m2._ensure_applied()


def test_correction_alias_separators():
    """Correction names resolve case- and separator-insensitively
    (reference accepts 'Benjamini-Hochberg', 'holm bonferroni', etc.)."""
    from mcpower_tpu.config import normalize_correction

    assert normalize_correction("Benjamini-Hochberg") == "benjamini_hochberg"
    assert normalize_correction("benjamini hochberg") == "benjamini_hochberg"
    assert normalize_correction("Tukey-HSD") == "tukey_hsd"
    assert normalize_correction("BONFERRONI") == "bonferroni"
    with pytest.raises(ValueError):
        normalize_correction("sidak-marginal-nope")


def test_all_contrasts_requires_factors():
    """Requesting all-pairwise post-hoc contrasts on a factor-free model is
    an immediate error, not a silent no-op."""
    m = MCPower("y ~ x1")
    m.set_effects("x1=0.3").set_simulations(20)
    with pytest.raises(ValueError, match="no factor variables"):
        m.find_power(sample_size=50, target_test="all-contrasts", verbose=False)


def test_confounded_fixed_factors_fail_loud():
    """Two fixed-allocation factors with identical proportions are
    deterministically confounded (reference data_gen.rs:943 runs the same
    Hamilton walk per factor): the preflight names the cause and the
    rank check fails every fit instead of silently returning garbage t²."""
    import warnings as _w

    m = MCPower("y ~ g1 + g2")
    m.set_variable_type("g1=(factor,3)")
    m.set_variable_type("g2=(factor,3)")
    m.set_effects("g1[2]=0.3").set_simulations(20).set_seed(3)
    with _w.catch_warnings(record=True) as w:
        _w.simplefilter("always")
        with pytest.raises(RuntimeError, match="failed to converge"):
            m.find_power(sample_size=150, verbose=False)
    assert any("confounded" in str(x.message) for x in w)


def test_partially_confounded_fixed_factors_named_up_front():
    """Uniform 6- and 4-level fixed walks are both round-robins, so 'level
    parity' is the same exact column in both dummy blocks — NOT caught by
    the identical-proportions rule, but caught by the preflight's exact
    rank check on the deterministic dummy design. The failure error repeats
    the named cause instead of the generic 'design is likely unstable'."""
    import warnings as _w

    m = MCPower("y ~ g1 + g2 + x1")
    m.set_variable_type("g1=(factor,6)")
    m.set_variable_type("g2=(factor,4)")
    m.set_effects("g1[2]=0.3, x1=0.3").set_simulations(20).set_seed(3)
    with _w.catch_warnings(record=True) as w:
        _w.simplefilter("always")
        with pytest.raises(RuntimeError, match="Known cause.*confounded"):
            m.find_power(sample_size=400, verbose=False)
    assert any("structurally confounded" in str(x.message) for x in w)


def test_coprime_fixed_factors_not_flagged():
    """gcd(levels) = 1 walks share no periodic column: the 5x4 uniform pair
    passes the exact rank check and fits cleanly."""
    m = MCPower("y ~ g1 + g2 + x1")
    m.set_variable_type("g1=(factor,5)")
    m.set_variable_type("g2=(factor,4)")
    m.set_effects("g1[2]=0.3, x1=0.3").set_simulations(30).set_seed(3)
    res = m.find_power(sample_size=400, verbose=False)
    assert res["convergence_rate"] == [1.0]
    assert not any("confounded" in w for w in res["warnings"])


def test_crossed_factor_interaction_power_runs():
    """A 2×3 factor interaction (distinct proportions → crossed cells under
    fixed allocation) fits cleanly and detects a large interaction effect."""
    m = MCPower("y ~ g1*g2")
    m.set_variable_type("g1=(factor,2)")
    m.set_variable_type("g2=(factor,3)")
    m.set_effects("g1[2]:g2[2]=1.2").set_simulations(150).set_seed(7)
    res = m.find_power(sample_size=240, verbose=False)
    assert res["convergence_rate"] == [1.0]
    pw = dict(zip(res["target_labels"], res["powers"]["corrected"][0]))
    assert pw["g1[2]:g2[2]"] > 0.8, pw


def test_per_factor_sampled_proportions_override():
    """A per-factor sampled_proportions=True override (reference
    variables.py:266-280) breaks deterministic confounding: two
    identical-proportion factors fit cleanly when one samples per row."""
    m = MCPower("y ~ g1 + g2")
    m.set_variable_type("g1=(factor,3)")
    m.set_variable_type("g2=(factor,3)")
    m._ensure_applied()
    m._registry.set_variable_type(
        "g2",
        {"type": "factor", "n_levels": 3, "proportions": [1 / 3] * 3,
         "sampled_proportions": True},
    )
    m._applied = True  # keep the modified registry
    m._effects = {"g1[2]": 0.5}
    m.set_simulations(40)
    m.seed = 3
    res = m.find_power(sample_size=150, verbose=False)
    assert res["convergence_rate"] == [1.0]
    assert not any("confounded" in w for w in res["warnings"])


def test_progress_cancel_raises_keyboard_interrupt():
    """Reference engine-py boundary semantics: a progress callback that
    returns False — or raises — cancels the run, surfaced as
    KeyboardInterrupt at the API edge."""
    m = MCPower("y ~ x1")
    m.set_effects("x1=0.4").set_simulations(400).set_seed(1)
    with pytest.raises(KeyboardInterrupt):
        m.find_power(100, progress_callback=lambda done, total: False,
                     verbose=False)

    def boom(done, total):
        raise RuntimeError("user bailed")

    m2 = MCPower("y ~ x1")
    m2.set_effects("x1=0.4").set_simulations(400).set_seed(1)
    with pytest.raises(KeyboardInterrupt):
        m2.find_power(100, progress_callback=boom, verbose=False)

    # a well-behaved callback sees (done, total) counts and the run finishes
    seen = []
    m3 = MCPower("y ~ x1")
    m3.set_effects("x1=0.4").set_simulations(400).set_seed(1)
    res = m3.find_power(
        100, progress_callback=lambda d, t: seen.append((d, t)) or True,
        verbose=False,
    )
    assert res["n_sims"] == 400
    assert seen and seen[-1][0] == seen[-1][1] == 400


def test_logit_requires_baseline_probability():
    """Binary families hard-require an anchored baseline at run time
    (reference _validate_logit_runtime: 'baseline probability required') —
    a silent p=0.5 default materially changes rare-event power."""
    m = MCPower("y ~ x", family="logit")
    m.set_effects("x=0.5").set_simulations(20)
    with pytest.raises(ValueError, match="baseline probability required"):
        m.find_power(sample_size=100, verbose=False)
    m.set_baseline_probability(0.3)
    m.find_power(sample_size=100, verbose=False)  # anchored: runs


def test_sample_size_search_preflight_names_clearing_n():
    """The search preflight names the smallest in-range N clearing the
    sparse-level minimum (reference limitations.md 'Sparse factor levels':
    told before the simulation starts, with the clearing N)."""
    m = MCPower("y ~ g")
    m.set_variable_type("g=(factor,0.05,0.95)")
    m.set_effects("g[2]=0.4").set_simulations(50)
    res = m.find_sample_size(from_size=40, to_size=200, by=20, verbose=False)
    ws = [w for w in res["warnings"] if "clearing the minimum" in w]
    assert ws, res["warnings"]
    import re

    n_clear = int(re.search(r"minimum: (\d+)", ws[0]).group(1))
    # 5% level needs ~100 rows for 5 observations; the named N clears it.
    assert n_clear * 0.05 >= 5 and n_clear <= 200


def test_sample_size_search_preflight_unreachable_range():
    m = MCPower("y ~ g")
    m.set_variable_type("g=(factor,0.05,0.95)")
    m.set_effects("g[2]=0.4").set_simulations(50)
    res = m.find_sample_size(from_size=40, to_size=80, by=20, verbose=False)
    assert any("every N in the searched range" in w for w in res["warnings"])
