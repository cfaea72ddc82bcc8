"""Sparse-factor machinery: preflight warnings + per-sim exclusion flags."""

import numpy as np
import pytest

from mcpower_tpu import MCPower
from mcpower_tpu.engine import batch, lower


def test_preflight_warning_for_rare_level():
    m = MCPower("y ~ g")
    m.set_variable_type("g=(factor,0.9,0.05,0.05)")
    m.set_effects("g[2]=0.4")
    m.set_simulations(100)
    res = m.find_power(sample_size=40, verbose=False)
    assert any("rarest level" in w for w in res["warnings"])


def test_no_preflight_for_balanced_factor():
    m = MCPower("y ~ g")
    m.set_variable_type("g=(factor,3)")
    m.set_effects("g[2]=0.4")
    m.set_simulations(100)
    res = m.find_power(sample_size=120, verbose=False)
    assert not any("rarest level" in w for w in res["warnings"])


def test_exclusion_flags_counted_under_sampling():
    """Sampled allocation + a rare level => nonzero exclusion counts."""
    from mcpower_tpu.engine.spec import ScenarioStatic

    sc = ScenarioStatic(label="s", sampled_factor_proportions=True)
    spec, arrays = lower.lower(
        grid=[60],
        var_types=[],
        factor_levels=[3],
        factor_props=[0.9, 0.05, 0.05],
        effects=np.zeros(3),
        target_cols=[1],
        scenario=sc,
    )
    counts = batch.run_batch(spec, arrays, n_sims=300, base_seed=3)
    # with E[count] = 3 < 5, most sims flag the factor
    assert counts["factor_excluded"][0, 0] > 150


def test_no_exclusion_when_cells_big():
    spec, arrays = lower.lower(
        grid=[300],
        var_types=[],
        factor_levels=[3],
        factor_props=[1 / 3] * 3,
        effects=np.zeros(3),
        target_cols=[1],
    )
    counts = batch.run_batch(spec, arrays, n_sims=200, base_seed=3)
    assert counts["factor_excluded"][0, 0] == 0
