"""Debug introspection + Vega-Lite plot emitters + scenario perturbations."""

import json

import numpy as np
import pytest

from mcpower_tpu import MCPower
from mcpower_tpu.engine import batch, lower
from mcpower_tpu.engine.spec import ScenarioStatic


def test_debug_report_stages():
    m = MCPower("y ~ x1 + x2")
    m.set_effects("x1=0.4, x2=0.2").set_simulations(100)
    rep = m.debug(sample_size=80, n_sims=100)
    assert set(rep["stages"]) == {"input", "data", "dispatch", "stats", "crit", "power"}
    assert rep["input"]["target_labels"] == ["x1", "x2"]
    assert rep["input"]["contract"]["outcome"]["coefficients"][1] == 0.4
    # D-B: design moments look standardized
    assert abs(rep["data"]["column_means"][1]) < 0.2
    assert abs(rep["data"]["column_sds"][1] - 1.0) < 0.2
    assert rep["dispatch"]["statistic_space"].startswith("t^2")
    # D-F: derived power equals a production run on the same (spec, seed, ids)
    res = m.find_power(sample_size=80, n_sims=100, verbose=False)
    want = res["powers"]["uncorrected"][0]
    got = rep["power"]["derived_power_uncorrected"][0]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_debug_is_json_serializable():
    m = MCPower("y ~ x1")
    m.set_effects("x1=0.3")
    rep = m.debug(sample_size=50, n_sims=20)
    json.dumps(rep)  # must not raise


def test_plot_specs_are_valid_vegalite_shapes():
    m = MCPower("y ~ x1 + x2")
    m.set_effects("x1=0.4, x2=0.3").set_simulations(300)
    m.find_power(sample_size=100, correction="holm", verbose=False)
    plots = m.plot_power()
    assert "power_bars" in plots and "power_bars_corrected" in plots
    spec = plots["power_bars"]
    assert spec["$schema"].endswith("v5.json")
    vals = spec["data"]["values"]
    assert {v["test"] for v in vals} == {"x1", "x2"}
    assert all(0 <= v["power"] <= 100 for v in vals)
    json.dumps(spec)

    m.find_sample_size(from_size=40, to_size=200, n_sims=300, verbose=False)
    plots2 = m.plot_sample_size()
    assert "power_curves" in plots2 and "joint_detection" in plots2
    from mcpower_tpu.output.plotting import to_html

    html = to_html(plots2["power_curves"])
    assert "vegaEmbed" in html


def test_scenario_distribution_swaps_active():
    """Under a 100% swap probability no column stays normal."""
    import jax.numpy as jnp
    from mcpower_tpu.engine import datagen

    sc = ScenarioStatic(
        label="swap",
        distribution_change_prob=1.0,
        new_distributions=("right_skewed",),
    )
    spec, arrays = lower.lower(
        grid=[4000],
        var_types=["normal", "normal"],
        effects=np.zeros(3),
        target_cols=[1],
        scenario=sc,
    )
    X, _, _ = datagen.generate_batch(
        spec, arrays, jnp.uint32(1), jnp.uint32(0),
        jnp.arange(6, dtype=jnp.uint32),
    )
    from scipy import stats

    x = np.asarray(X)[:, :, 1].reshape(-1)
    assert stats.skew(x) > 1.2  # every sim swapped to right_skewed


def test_scenario_pinned_column_never_swaps():
    import jax.numpy as jnp
    from mcpower_tpu.engine import datagen
    from scipy import stats

    sc = ScenarioStatic(
        label="swap2",
        distribution_change_prob=1.0,
        new_distributions=("right_skewed",),
    )
    spec, arrays = lower.lower(
        grid=[4000],
        var_types=["normal"],
        var_pinned=[True],
        effects=np.zeros(2),
        target_cols=[1],
        scenario=sc,
    )
    X, _, _ = datagen.generate_batch(
        spec, arrays, jnp.uint32(1), jnp.uint32(0),
        jnp.arange(6, dtype=jnp.uint32),
    )
    x = np.asarray(X)[:, :, 1].reshape(-1)
    assert abs(stats.skew(x)) < 0.15  # still normal


def test_scenario_correlation_noise_moves_correlations():
    import jax.numpy as jnp
    from mcpower_tpu.engine import datagen

    corr = np.array([[1.0, 0.4], [0.4, 1.0]])
    sc = ScenarioStatic(label="cn", correlation_noise_sd=0.25)
    spec, arrays = lower.lower(
        grid=[1500],
        var_types=["normal", "normal"],
        corr=corr,
        effects=np.zeros(3),
        target_cols=[1],
        scenario=sc,
    )
    X, _, _ = datagen.generate_batch(
        spec, arrays, jnp.uint32(5), jnp.uint32(0),
        jnp.arange(120, dtype=jnp.uint32),
    )
    Xn = np.asarray(X)
    rs = [np.corrcoef(Xn[s, :, 1], Xn[s, :, 2])[0, 1] for s in range(120)]
    # correlations vary across sims around the base value (SE of the mean
    # at sd=.25 over 120 sims ~ .023 -> 4 SE band)
    assert np.std(rs) > 0.12
    assert abs(np.mean(rs) - 0.4) < 0.09
    assert max(rs) <= 0.85  # clipped at +-0.8 (plus sampling noise)
