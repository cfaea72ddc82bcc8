"""Formula + assignment parser goldens, loaded VERBATIM from the
reference's cross-port fixture corpus (configs/formula-fixtures/, vendored
at tests/fixtures/formula-fixtures/) so parser drift is impossible — the
same JSON drives the reference's golden_test.rs."""

import json
from pathlib import Path

import pytest

from mcpower_tpu.specbuilder.assignments import (
    AssignmentError,
    parse_assignments,
    parse_var_type_value,
)
from mcpower_tpu.specbuilder.formula import FormulaError, parse_formula

FIXTURES = Path(__file__).parent / "fixtures" / "formula-fixtures"
_CASES = json.loads((FIXTURES / "cases.json").read_text())["cases"]
OK_CASES = [c for c in _CASES if "expected" in c]
ERR_CASES = [c for c in _CASES if "error" in c]
assert len(OK_CASES) + len(ERR_CASES) == len(_CASES) == 28


@pytest.mark.parametrize("case", OK_CASES, ids=lambda c: c["id"])
def test_formula_golden(case):
    p = parse_formula(case["formula"])
    e = case["expected"]
    assert p.dependent == e["dependent"]
    assert p.predictors == e["predictors"]
    assert p.terms == e["terms"]
    assert [r.to_dict() for r in p.random_effects] == e["random_effects"]


@pytest.mark.parametrize("case", ERR_CASES, ids=lambda c: c["id"])
def test_formula_errors(case):
    msg = case["error"].replace("(", "\\(").replace(")", "\\)")
    with pytest.raises(FormulaError, match=msg):
        parse_formula(case["formula"])


def _assignment_fixtures():
    out = []
    for f in sorted((FIXTURES / "assignments").glob("*.json")):
        out.append((f.stem, json.loads(f.read_text())))
    return out


@pytest.mark.parametrize("name,fx", _assignment_fixtures(), ids=lambda x: x if isinstance(x, str) else "")
def test_assignment_fixture_golden(name, fx):
    known = fx["known"]
    kind = fx["kind"]
    exp = fx["expected"]
    if "error" in exp:
        with pytest.raises(AssignmentError, match=exp["error"]):
            parse_assignments(fx["input"], kind, known["predictors"],
                              interaction_terms=known["interaction_terms"])
        return
    items, errors = parse_assignments(
        fx["input"], kind, known["predictors"],
        interaction_terms=known["interaction_terms"],
    )
    assert errors == exp["errors"]
    assert len(items) == len(exp["items"])
    for item, want in zip(items, exp["items"]):
        wkey = want["key"]
        if "name" in wkey:
            assert item.key == wkey["name"]
        else:  # correlation pair key
            assert item.key == ("pair", tuple(wkey["pair"]))
        wval = want["value"]
        if "variable_type" in wval:
            vt = dict(wval["variable_type"])
            assert item.value.pop("type") == vt.pop("type")
            for k, v in vt.items():
                assert item.value[k] == pytest.approx(v)
        elif "effect" in wval:
            assert item.value == pytest.approx(wval["effect"])
        elif "correlation" in wval:
            assert item.value == pytest.approx(wval["correlation"])


# --- assignment DSL goldens ---


def test_assignments_var_types():
    items, errors = parse_assignments(
        "x1=binary, x2=normal", "variable_type", ["x1", "x2"]
    )
    assert errors == []
    assert items[0].key == "x1"
    assert items[0].value == {"type": "binary", "proportion": 0.5}
    assert items[1].value == {"type": "normal"}


def test_assignments_correlation_pair_sorted():
    items, errors = parse_assignments("corr(x2,x1)=0.4", "correlation", ["x1", "x2"])
    assert errors == []
    assert items[0].key == ("pair", ("x1", "x2"))
    assert items[0].value == 0.4


def test_assignments_effects():
    items, errors = parse_assignments("x1=0.5, x2=-0.3", "effect", ["x1", "x2"])
    assert errors == []
    assert [(i.key, i.value) for i in items] == [("x1", 0.5), ("x2", -0.3)]


def test_assignments_unknown_name_collected():
    items, errors = parse_assignments("xnone=0.5, x1=0.3", "effect", ["x1"])
    assert len(errors) == 1 and errors[0].startswith(
        'unknown assignment name: "xnone"'
    )
    assert [(i.key, i.value) for i in items] == [("x1", 0.3)]


def test_assignments_malformed_raises():
    with pytest.raises(AssignmentError, match="malformed assignment input"):
        parse_assignments("nonsense", "effect", ["x1"])


def test_var_type_tuple_forms():
    assert parse_var_type_value("(binary,0.3)") == ("binary", {"proportion": 0.3})
    vt, params = parse_var_type_value("(factor,0.2,0.3,0.5)")
    assert vt == "factor" and params["n_levels"] == 3
    assert abs(sum(params["proportions"]) - 1.0) < 1e-12
    vt, params = parse_var_type_value("(factor,4)")
    assert params["n_levels"] == 4
    assert params["proportions"] == [0.25] * 4
    assert parse_var_type_value("factor")[1]["n_levels"] == 3
    with pytest.raises(AssignmentError, match="at least 2 levels"):
        parse_var_type_value("(factor,1)")
    with pytest.raises(AssignmentError, match="Proportion must be between"):
        parse_var_type_value("(binary,1.5)")
    with pytest.raises(AssignmentError, match="Unsupported type"):
        parse_var_type_value("gaussian")


def test_effect_interaction_keys():
    # effect names resolve strictly against the expanded effect list, so the
    # interaction's expanded name must be among the known predictors
    items, errors = parse_assignments(
        "a:b=0.2, a*b=0.3", "effect", ["a", "b", "a:b"],
        interaction_terms=[["a", "b"]],
    )
    assert errors == []
    assert [(i.key, i.value) for i in items] == [("a:b", 0.2), ("a:b", 0.3)]
    # a name absent from the expanded list is rejected even if it matches a
    # formula-level interaction term (factor-interaction base names)
    _, errs = parse_assignments(
        "a:b=0.2", "effect", ["a[2]:b[2]"], interaction_terms=[["a", "b"]]
    )
    assert errs == ['unknown assignment name: "a:b"']


_SUITE = json.loads((FIXTURES / "canonical-suite.json").read_text())
_SUITE_CASES = _SUITE["cases"]


def _canonical(p) -> dict:
    """Port-neutral canonical shape (reference tests/spec/test_canonical_suite.py)."""
    fixed = []
    for t in p.terms:
        if t["kind"] == "main":
            fixed.append(t["name"])
        else:
            fixed.append(":".join(t["vars"]))
    res = []
    for r in p.random_effects:
        if r.kind == "intercept":
            res.append(f"intercept|{r.group}")
        else:
            res.append(f"slope({','.join(r.vars)})|{r.group}")
    return {
        "outcome": p.dependent,
        "fixed_effects": fixed,
        "random_effects": res,
    }


@pytest.mark.parametrize(
    "case", _SUITE_CASES, ids=[c["id"] for c in _SUITE_CASES]
)
def test_canonical_suite(case):
    """The cross-port canonical formula suite, verbatim from the reference's
    configs/formula-fixtures/canonical-suite.json."""
    import re as _re

    if "error" in case:
        with pytest.raises(FormulaError, match=_re.escape(case["error"])):
            parse_formula(case["formula"])
    else:
        parsed = parse_formula(case["formula"])
        assert _canonical(parsed) == case["expected"]
