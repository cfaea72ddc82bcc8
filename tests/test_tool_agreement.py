"""Second independent agreement tier (VERDICT r4 #7): the engine's power
vs published analytic methods (Cohen nct/ncf, Demidenko logistic Wald,
Signorini Poisson Wald, GLS design-effect) implemented in
benchmarks/tool_agreement.py with scipy only — the in-image equivalent of
the reference's simr/Superpower/simglm tier
(/root/reference/benchmarks/power_agreement.py).
"""

import importlib.util
import json
import pathlib

import numpy as np
import pytest

_TA = pathlib.Path(__file__).parent.parent / "benchmarks" / "tool_agreement.py"
_spec = importlib.util.spec_from_file_location("tool_agreement", _TA)
ta = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ta)

ARTIFACT = pathlib.Path(__file__).parent.parent / "benchmarks" / "tool_agreement.json"


def test_engine_agrees_with_analytic_methods():
    """Every design-matched case sits within its method band + MC margin
    (fast replicate budget; the committed artifact pins the 20k run)."""
    n_sims = 4000
    eng = ta.engine_powers(n_sims)
    for name, _method, p_formula, band, _kw in ta.formula_cases():
        p_eng = eng[name]
        mc_se = np.sqrt(max(p_eng * (1 - p_eng), 1e-6) / n_sims)
        assert abs(p_eng - p_formula) <= band + 3 * mc_se, (
            name, p_eng, p_formula, band, mc_se,
        )


def test_committed_artifact_matches_formula_tier():
    """The committed JSON's formula column reproduces from the literature
    implementations (catches silent formula drift), and every committed
    case passed its gate when frozen."""
    art = json.loads(ARTIFACT.read_text())
    want = {name: p for name, _m, p, _b, _kw in ta.formula_cases()}
    assert {row["case"] for row in art["cases"]} == set(want)
    for row in art["cases"]:
        assert row["formula_power"] == pytest.approx(
            want[row["case"]], abs=1e-4
        )
        assert row["ok"] is True, row
