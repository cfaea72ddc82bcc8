"""Report-layer depth: section checklist vs the reference's report content.

The reference's long-form report (ports/py/mcpower/output/report.py +
tables.py, text from configs/config.json report.text) ships a boxed header
with the effects echo (+OR for logit outcomes), per-test power tables, the
exactly-k/at-least-k joint significance distribution, per-k joint required-N
tables, per-scenario estimator details, and a cross-scenario robustness
comparison. These tests pin that every section renders with the reference's
wording (VERDICT r2 missing #4).
"""

import numpy as np

from mcpower_tpu import MCPower
from mcpower_tpu.orchestrator import runner


def test_power_report_sections_logit():
    """Logit power report: header box with OR echo, OR column, joint
    distribution table, estimator details, CI footnote."""
    m = MCPower("y ~ x1 + x2", family="logit")
    m.set_baseline_probability(0.3)
    m.set_effects("x1=0.5, x2=0.4").set_simulations(300).set_seed(7)
    res = m.find_power(sample_size=150, correction="holm", verbose=False)
    txt = res.summary()
    # boxed header + meta echo
    assert "MCPower · Power Analysis" in txt
    assert "formula: y ~ x1 + x2" in txt
    assert "estimator: GLM" in txt
    # OR = exp(beta) echo for logit outcomes (display-only readout)
    assert f"x1=0.50 (OR {np.exp(0.5):.2f})" in txt
    assert "correction: holm" in txt
    # OR column present in the power table
    assert "OR" in txt
    # joint significance distribution (exactly-k / at-least-k)
    assert "Joint significance distribution" in txt
    assert "Exactly" in txt and "At least" in txt
    # estimator details block (GLM extras present for logit)
    assert "Estimator details" in txt
    # single-source footnote text
    assert "95% CIs are Monte-Carlo (Wilson), n_sims=300." in txt


def test_power_report_no_or_for_gaussian():
    m = MCPower("y ~ x1")
    m.set_effects("x1=0.4").set_simulations(200).set_seed(3)
    res = m.find_power(sample_size=100, verbose=False)
    txt = res.summary()
    assert "(OR" not in txt
    assert "effects: x1=0.40" in txt


def test_power_report_robustness_section():
    """Multi-scenario runs render the Δ-power-vs-baseline comparison table."""
    m = MCPower("y ~ x1 + x2")
    m.set_effects("x1=0.4, x2=0.3").set_simulations(300).set_seed(11)
    res = m.find_power(sample_size=120, scenarios=True, verbose=False)
    txt = res.summary()
    assert "Robustness" in txt
    assert "baseline: optimistic" in txt
    assert "pp" in txt  # Δ cells in percentage points
    # every non-baseline scenario is a column
    assert "realistic" in txt and "doomer" in txt


def test_sample_size_report_sections():
    """Sample-size report: required-N table with overall row, per-k joint
    required-N table, crossing-fit footnote."""
    m = MCPower("y ~ x1 + x2")
    m.set_effects("x1=0.45, x2=0.35").set_simulations(400).set_seed(5)
    res = m.find_sample_size(
        from_size=40, to_size=200, n_sims=400, verbose=False
    )
    txt = res.summary()
    assert "MCPower · Power Analysis" in txt
    assert "Required sample size per effect" in txt
    assert "Overall F" in txt  # omnibus row, estimator-aware label
    # per-k joint detection table (two targets => '≥ 1 of 2' and '≥ 2 of 2')
    assert "Joint detection → required N" in txt
    assert "≥ 2 of 2 tests" in txt and "≥ 1 of 2 tests" in txt
    assert (
        "Required N from the model-based crossing fit (isotonic); CI by "
        "Wilson band inversion, rounded outward." in txt
    )


def test_joint_per_k_derivation_matches_tail_sums():
    """derive_sample_size_outputs keys fitted_joint/first_joint_achieved by
    j (k = j+1) and fits tail-sums of the CORRECTED histogram — the
    reference derivation (engine-orchestrator/src/grid.rs:254-287)."""
    from mcpower_tpu.orchestrator import crossing

    grid_ns = [40, 80, 120, 160]
    n = 500
    # Hand-built corrected histogram: (G, m+1) with m=2 targets.
    hist = np.array(
        [
            [300, 150, 50],
            [150, 200, 150],
            [50, 150, 300],
            [10, 90, 400],
        ]
    )
    res = {
        "sample_sizes": grid_ns,
        "n_sims": n,
        "target_labels": ["a", "b"],
        "powers": {"corrected": (hist[:, 1:] / n).tolist()},
        "success_counts_corrected": hist[:, 1:].tolist(),
        "success_count_histogram_corrected": hist.tolist(),
    }
    runner.derive_sample_size_outputs(res, target_power=80.0, atom=1)

    assert set(res["first_joint_achieved"]) == {0, 1}
    assert set(res["fitted_joint"]) == {0, 1}
    for j in (0, 1):
        k = j + 1
        counts = hist[:, k:].sum(axis=1)
        # first N with P(>=k) >= 0.8
        expect_first = next(
            (int(g) for g, c in zip(grid_ns, counts) if c / n >= 0.8), None
        )
        assert res["first_joint_achieved"][j] == expect_first, j
        expect_fit = crossing.fit_crossing(
            grid_ns, counts, n, 80.0, 1
        ).to_dict()
        assert res["fitted_joint"][j] == expect_fit, j
    # at-least-1 dominates at-least-2 everywhere => required N is weakly lower
    f1 = res["first_joint_achieved"][0]
    f2 = res["first_joint_achieved"][1]
    if f1 is not None and f2 is not None:
        assert f1 <= f2


def test_factor_header_rows_with_baseline():
    """Factor dummies group under a value-less header naming the baseline
    level (reference build_rows factor_header, tables.py:389); with
    uploaded data the header shows the data-value baseline."""
    m = MCPower("y ~ g + x1")
    m.set_variable_type("g=(factor,0.34,0.33,0.33)")
    m.set_effects("g[2]=0.4, g[3]=0.6, x1=0.3").set_simulations(200)
    m.set_seed(13)
    res = m.find_power(sample_size=120, verbose=False)
    txt = res.summary()
    assert "g (baseline: 1)" in txt
    assert "\n  g[2]" in txt  # indented under the header
    # sample-size table gets the same grouping
    res2 = m.find_sample_size(from_size=60, to_size=240, n_sims=200,
                              verbose=False)
    assert "g (baseline: 1)" in res2.summary()


def test_factor_header_uses_uploaded_labels():
    import numpy as np

    rs = np.random.RandomState(3)
    n = 120
    region = np.asarray(["USA", "Japan", "Europe"], dtype=object)[
        rs.randint(0, 3, n)
    ]
    m = MCPower("y ~ region")
    m.set_simulations(150).set_seed(2)
    m.upload_data({"region": region, "y": rs.normal(size=n)})
    m.set_effects("region[Japan]=0.4, region[USA]=0.2")
    txt = m.find_power(sample_size=100, verbose=False).summary()
    assert "region (baseline: Europe)" in txt
    assert "region[Japan]" in txt


def test_glm_baseline_drift_warning():
    """Large effects shift the marginal rate away from the requested
    baseline; beyond glm_baseline_drift_max the result carries the
    reference's 'GLM baseline drift' diagnostic. A small-effect design
    stays silent."""
    m = MCPower("y ~ x1", family="logit")
    m.set_baseline_probability(0.2)
    m.set_effects("x1=2.5").set_simulations(300).set_seed(5)
    res = m.find_power(sample_size=200, verbose=False)
    assert any("baseline drift" in w for w in res["warnings"]), res["warnings"]

    m2 = MCPower("y ~ x1", family="logit")
    m2.set_baseline_probability(0.2)
    m2.set_effects("x1=0.2").set_simulations(300).set_seed(5)
    res2 = m2.find_power(sample_size=200, verbose=False)
    assert not any("baseline drift" in w for w in res2["warnings"])


def test_short_form_repr():
    """repr() is the compact short form (reference render_short):
    model line, no CI columns, '(same)' for the omnibus corrected cell,
    Target column; summary() stays the long form."""
    m = MCPower("y ~ x1 + x2")
    m.set_effects("x1=0.5, x2=0.3").set_simulations(200).set_seed(2)
    res = m.find_power(sample_size=120, correction="holm", verbose=False)
    short = repr(res)
    # header tokens mirror the reference's render_short (tables.py:582-584)
    assert short.startswith("Power Analysis — OLS  N=120")
    assert "formula: y ~ x1 + x2" in short and "target=" in short
    assert "(same)" in short            # omnibus corrected cell
    assert "Uncorr." in short and "Corr." in short
    assert "CI 95%" not in short        # no CI columns in the short form
    assert "Target" in short and "80%" in short
    assert res.short() == short
    long = res.summary()
    assert "CI 95%" in long             # the long form keeps them


def test_short_form_target_respects_override():
    """find_sample_size(target_power=90): the short form's Target column
    reads the per-run tree value, not the model default."""
    m = MCPower("y ~ x1")
    m.set_effects("x1=0.5").set_simulations(150).set_seed(3)
    res = m.find_sample_size(
        from_size=40, to_size=240, n_sims=150, target_power=90,
        verbose=False,
    )
    assert "90%" in repr(res) and "80%" not in repr(res)


def test_power_result_tree_carries_target_power():
    """Power trees carry target_power (proportion) so the plot rule and
    short form render the model's real target."""
    m = MCPower("y ~ x1")
    m.set_effects("x1=0.5").set_simulations(100).set_seed(3)
    m.set_power(90)
    res = m.find_power(sample_size=100, verbose=False)
    assert res["target_power"] == 0.9
    spec = res.plots()["power_bars"]
    assert spec["layer"][-1]["data"]["values"] == [{"target": 90.0}]


def test_small_cluster_warning():
    """Thin clusters (< reliable rows each) surface a reliability warning
    (reference cluster validator's warn-below-10); healthy sizes stay
    silent."""
    m = MCPower("y ~ x + (1|site)", family="lme")
    m.set_effects("x=0.4").set_cluster("site", ICC=0.1, n_clusters=30)
    m.set_simulations(150).set_seed(6)
    res = m.find_power(sample_size=90, verbose=False)  # 3 rows/cluster
    assert any("rows each" in w for w in res["warnings"]), res["warnings"]
    res2 = m.find_power(sample_size=600, verbose=False)  # 20 rows/cluster
    assert not any("rows each" in w for w in res2["warnings"])


def test_boundary_warning_gates_on_high_tau_only():
    """The report's boundary red flag gates on the HIGH-tau rate only
    (reference tables.py diagnostic_warnings, decision 2.2): a large benign
    tau-zero rate must NOT warn; a high-tau rate above the threshold must."""
    from mcpower_tpu.output.report import _diagnostics as diagnostic_lines

    base = {
        "convergence_rate": [1.0],
        "boundary_hit_rate_tau_zero": [0.40],
        "boundary_hit_rate_high_tau": [0.0],
        "warnings": [],
    }
    assert not [w for w in diagnostic_lines(base) if "boundary" in w]
    base["boundary_hit_rate_high_tau"] = [0.05]
    warns = diagnostic_lines(base)
    assert any("high-τ̂ boundary" in w and "5.0%" in w for w in warns), warns
