"""Misspecified test models (test_formula=) and contrast-only target sets.

Regression tests for two bugs the examples surfaced:

1. Targets reference GENERATION design terms; with a test_formula the
   adapter used to key the target map by TEST term index — crashing when a
   kept target followed a dropped term ("score = caffeine" after dropping
   study) and silently testing the WRONG column when the test formula
   reordered predictors (engine/adapter.py).
2. ``target_test="overall, all-contrasts"`` has zero marginal/contrast t^2
   targets (contrasts ride the posthoc block); under correction="tukey"
   the placeholder crit row mismatched the empty per-target k vector
   (engine/critvals.py).
"""

from mcpower_tpu import MCPower


def _base(formula="y = a + b", effects="a=0.5, b=0"):
    m = MCPower(formula)
    m.set_effects(effects)
    m.set_correlations("corr(a, b)=0.6")
    m.set_simulations(600).set_seed(19)
    return m


def test_target_after_dropped_term_runs():
    # b (generation term AFTER the dropped a) as the only fitted predictor:
    # omitted-variable confounding makes the null b spuriously significant.
    m = _base()
    res = m.find_power(
        sample_size=100, target_test="b", test_formula="y = b", verbose=False
    )
    assert res["target_labels"] == ["b"]
    p_b = res["powers"]["uncorrected"][0][0]
    assert p_b > 0.25  # far above alpha — the confounding is visible


def test_reordered_test_formula_maps_correct_columns():
    # Reorder the fitted model relative to generation order. a carries the
    # effect, b is null; the OLD adapter mapped generation term 1 (a) to
    # TEST term 1 (b here) — column swap. Power must follow the NAME.
    m = _base()
    res = m.find_power(
        sample_size=120,
        target_test="a, b",
        test_formula="y = b + a",
        verbose=False,
    )
    by = dict(zip(res["target_labels"], res["powers"]["uncorrected"][0]))
    assert by["a"] > 0.85, by
    assert by["b"] < 0.55, by  # null + variance stolen by correlated a
    assert by["a"] > by["b"] + 0.3


def test_dropping_last_term_still_works():
    # the previously-tested shape (prefix indices aligned) stays green
    m = _base()
    res = m.find_power(
        sample_size=100, target_test="a", test_formula="y = a", verbose=False
    )
    assert res["powers"]["uncorrected"][0][0] > 0.9


def test_unknown_test_formula_predictor_raises():
    m = _base()
    try:
        m.find_power(
            sample_size=100, test_formula="y = nonexistent", verbose=False
        )
    except ValueError as e:
        assert "unknown predictor" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_tukey_with_contrast_only_targets():
    # "overall, all-contrasts" => no marginal t^2 targets at all; the tukey
    # crit table must still build (placeholder row padded with NaN).
    m = MCPower("y = g")
    m.set_variable_type("g=(factor,0.34,0.33,0.33)")
    m.set_effects("g[2]=0.5, g[3]=0.8")
    m.set_simulations(400).set_seed(9)
    res = m.find_power(
        sample_size=130,
        target_test="overall, all-contrasts",
        correction="tukey",
        verbose=False,
    )
    assert res["overall_significant_rate"] is not None
    ph = res["posthoc"]["g"]
    assert set(ph) == {"g[1] vs g[2]", "g[1] vs g[3]", "g[2] vs g[3]"}
    # the big gap (1 vs 3) out-powers the small one (2 vs 3)
    assert ph["g[1] vs g[3]"]["power"][0] > ph["g[2] vs g[3]"]["power"][0]
