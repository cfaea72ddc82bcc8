"""Port-surface validation parity (reference tests/spec/test_apic_surface.py):
setter/input validation must fail loudly at the same call sites as the
reference port. Each test cites its APIC id."""

import warnings

import numpy as np
import pytest

from mcpower_tpu import MCPower


def test_alpha_soft_warn_above_quarter():  # APIC-01
    m = MCPower("y ~ x1")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m.set_alpha(0.30)
    assert any("alpha" in str(x.message).lower() for x in w)
    m2 = MCPower("y ~ x1")
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        m2.set_alpha(0.25)
    assert not w2


def test_set_seed_validation():  # APIC-29
    m = MCPower("y ~ x1")
    m.set_seed(None)
    m.set_seed(0)
    with pytest.raises(ValueError):
        m.set_seed(-1)
    with pytest.raises(TypeError):
        m.set_seed(1.5)


def test_set_effects_dict_and_string_equivalent():  # APIC-30
    a = MCPower("y ~ x1 + x2")
    a.set_effects("x1=0.5, x2=0.3")
    a._ensure_applied()
    b = MCPower("y ~ x1 + x2")
    b.set_effects({"x1": 0.5, "x2": 0.3})
    b._ensure_applied()
    assert a._effects == b._effects
    with pytest.raises(Exception):
        MCPower("y ~ x1").set_effects("")


def test_apply_collects_all_unknown_effect_errors():  # APIC-33
    m = MCPower("y ~ x1")
    m.set_effects("nope1=0.2, nope2=0.3")
    with pytest.raises(ValueError) as exc:
        m._ensure_applied()
    assert "nope1" in str(exc.value) and "nope2" in str(exc.value)


def test_string_correlation_unknown_var():  # APIC-34
    m = MCPower("y ~ x1")
    m.set_effects("x1=0.5")
    m.set_correlations("corr(x1,x2)=0.3")
    with pytest.raises(ValueError):
        m._ensure_applied()


def test_matrix_correlation_structural_guards():  # APIC-35/81/82
    def mk():
        m = MCPower("y ~ x1 + x2")
        m.set_effects("x1=0.5, x2=0.3")
        return m

    m = mk()
    m.set_correlations(np.eye(3))
    with pytest.raises(ValueError, match="2x2"):
        m._ensure_applied()
    m = mk()
    m.set_correlations(np.array([[1.0, 0.5], [0.2, 1.0]]))
    with pytest.raises(ValueError, match="symmetric"):
        m._ensure_applied()
    m = mk()
    m.set_correlations(np.array([[2.0, 0.3], [0.3, 1.0]]))
    with pytest.raises(ValueError, match="[Dd]iagonal"):
        m._ensure_applied()
    # the valid ndarray form still flows through
    m = mk()
    m.set_correlations(np.array([[1.0, 0.3], [0.3, 1.0]]))
    m._ensure_applied()
    assert m._corr_matrix is not None


def test_empty_scenarios_list_raises():  # APIC-43
    m = MCPower("y ~ x1")
    m.set_effects("x1=0.5").set_simulations(10)
    with pytest.raises(ValueError, match="scenarios"):
        m.find_power(50, scenarios=[], verbose=False)


def test_scenario_unknown_distribution_rejected():  # APIC-80
    m = MCPower("y ~ x1")
    m.set_effects("x1=0.5")
    with pytest.raises(ValueError, match="weird_dist"):
        m.set_scenario_configs({"realistic": {"new_distributions": ["weird_dist"]}})
    with pytest.raises(ValueError, match="cauchy"):
        m.set_scenario_configs({"realistic": {"residual_dists": ["cauchy"]}})


def test_removed_setters_raise_instructively():  # track-f / APIC
    m = MCPower("y ~ x1")
    with pytest.raises(AttributeError, match="mesh"):
        m.set_parallel(True)
    with pytest.raises(AttributeError, match="correction"):
        m.set_correction_method("bh")
    with pytest.raises(AttributeError, match="target_test"):
        m.set_tests("all")
