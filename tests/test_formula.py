"""Formula + assignment parser goldens.

The cross-port parser truth: the same cases as the reference's golden corpus
(configs/formula-fixtures/), re-expressed here as native pytest params, so
both frameworks accept identical formula strings with identical term order.
"""

import pytest

from mcpower_tpu.specbuilder.assignments import (
    AssignmentError,
    parse_assignments,
    parse_var_type_value,
)
from mcpower_tpu.specbuilder.formula import FormulaError, parse_formula

M = lambda n: {"kind": "main", "name": n}
I = lambda *v: {"kind": "interaction", "vars": list(v)}
RI = lambda g, parent=None: {"group": g, "kind": "intercept", "parent": parent}
RS = lambda g, *v: {"group": g, "kind": "slope", "vars": list(v)}

OK_CASES = [
    # (formula, dependent, predictors, terms, random_effects)
    ("y ~ x1 + x2", "y", ["x1", "x2"], [M("x1"), M("x2")], []),
    (
        "y ~ x1*x2*x3",
        "y",
        ["x1", "x2", "x3"],
        [
            M("x1"), M("x2"), M("x3"),
            I("x1", "x2"), I("x1", "x3"), I("x2", "x3"), I("x1", "x2", "x3"),
        ],
        [],
    ),
    ("y ~ x1 + x2 + x1:x2", "y", ["x1", "x2"], [M("x1"), M("x2"), I("x1", "x2")], []),
    ("y ~ x + (1|g)", "y", ["x"], [M("x")], [RI("g")]),
    ("y ~ x + (1+x|g)", "y", ["x"], [M("x")], [RS("g", "x")]),
    ("y ~ x + z + (1+x+z|g)", "y", ["x", "z"], [M("x"), M("z")], [RS("g", "x", "z")]),
    ("y ~ x + (1|A/B)", "y", ["x"], [M("x")], [RI("A"), RI("A:B", "A")]),
    ("x1 + x2", "explained_variable", ["x1", "x2"], [M("x1"), M("x2")], []),
    ("y = x1 + x2", "y", ["x1", "x2"], [M("x1"), M("x2")], []),
    ("y ~ (1|g)", "y", [], [], [RI("g")]),
    ("y ~ x1*x2", "y", ["x1", "x2"], [M("x1"), M("x2"), I("x1", "x2")], []),
    (
        "y ~ a*b + c:d",
        "y",
        ["a", "b", "c", "d"],
        [M("a"), M("b"), I("a", "b"), I("c", "d")],
        [],
    ),
    ("y ~ x1:x2:x3", "y", ["x1", "x2", "x3"], [I("x1", "x2", "x3")], []),
    ("y ~ x1 + x1 + x2", "y", ["x1", "x2"], [M("x1"), M("x2")], []),
    (
        "y ~ x1*x2 + z",
        "y",
        ["x1", "x2", "z"],
        [M("x1"), M("x2"), I("x1", "x2"), M("z")],
        [],
    ),
    ("y ~ x + (1|g) + (1|h)", "y", ["x"], [M("x")], [RI("g"), RI("h")]),
    (
        "y ~ x1*x2 + (1|g)",
        "y",
        ["x1", "x2"],
        [M("x1"), M("x2"), I("x1", "x2")],
        [RI("g")],
    ),
    (
        "y ~ x + z + (1|school/class)",
        "y",
        ["x", "z"],
        [M("x"), M("z")],
        [RI("school"), RI("school:class", "school")],
    ),
    (
        "y ~ x1 + x2 + x1:x2 + (1+x1|g)",
        "y",
        ["x1", "x2"],
        [M("x1"), M("x2"), I("x1", "x2")],
        [RS("g", "x1")],
    ),
    # pinned RE order: slopes before intercepts
    (
        "y ~ x + z + (1|g) + (1+x+z|h)",
        "y",
        ["x", "z"],
        [M("x"), M("z")],
        [RS("h", "x", "z"), RI("g")],
    ),
    ("y ~ x + (x|g)", "y", ["x"], [M("x")], [RS("g", "x")]),
]


@pytest.mark.parametrize("formula,dep,preds,terms,res", OK_CASES)
def test_formula_golden(formula, dep, preds, terms, res):
    p = parse_formula(formula)
    assert p.dependent == dep
    assert p.predictors == preds
    assert p.terms == terms
    assert [r.to_dict() for r in p.random_effects] == res


ERR_CASES = [
    ("y ~ 1x", "formula syntax error"),
    ("y ~ x + (1|g) + (1|g)", "duplicate grouping variable: g"),
    ("y ~ x + (1|g) + (1+x|g)", "duplicate grouping variable: g"),
    ("", "formula is empty"),
    ("y ~ x1 - x2", "term removal with '-'"),
    ("y ~ x + (0+x|g)", "intercept suppression"),
    ("y ~ x + (-1+x|g)", "intercept suppression"),
]


@pytest.mark.parametrize("formula,msg", ERR_CASES)
def test_formula_errors(formula, msg):
    with pytest.raises(FormulaError, match=msg.replace("(", "\\(").replace(")", "\\)")):
        parse_formula(formula)


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
    assert errors == ['unknown assignment name: "xnone"']
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
    items, errors = parse_assignments(
        "a:b=0.2, a*b=0.3", "effect", ["a", "b"], interaction_terms=[["a", "b"]]
    )
    assert errors == []
    assert [(i.key, i.value) for i in items] == [("a:b", 0.2), ("a:b", 0.3)]
