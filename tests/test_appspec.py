"""App-spec layer: tagged parsing, assembly, and the GUI driver boundary.

Mirrors the reference's engine-app-spec tests (app_spec_roundtrip.rs,
driver single-core twins): additive-evolution parsing (old payloads keep
deserializing), label->level translation, family lowering, and one real
run through run_find_power returning the host-neutral payload.
"""

import json

import pytest

from mcpower_tpu.appspec import (
    AppSpecError,
    parse_app_spec,
    run_find_power,
    run_find_sample_size,
)
from mcpower_tpu.appspec.assemble import assemble


def _linear_doc(**over):
    doc = {
        "family": "linear",
        "parsed_formula": {
            "outcome": "y",
            "predictors": ["x1", "x2"],
            "interaction_terms": [["x1", "x2"]],
        },
        "var_types": [
            {"kind": "numeric", "name": "x1"},
            {"kind": "binary", "name": "x2", "binary_proportion": 0.4},
        ],
        "effects": [
            {"name": "x1", "value": 0.3},
            {"name": "x2", "value": 0.25},
            {"name": "x1:x2", "value": 0.1},
        ],
        "correlations": None,
        "alpha": 0.05,
        "target_power": 0.8,
        "n_sims": 120,
        "seed": 7,
        "tests": {"kind": "all"},
        "correction": "none",
        "csv": None,
    }
    doc.update(over)
    return doc


def test_parse_minimal_linear_defaults():
    app = parse_app_spec(json.dumps(_linear_doc()))
    # serde-default equivalents: absent knobs take their documented values
    assert app.agq == 1
    assert app.wald_se == "rx"
    assert app.scenarios == ()
    assert app.report_overall is False
    assert app.link == "logit"
    a = assemble(app)
    assert a.model.equation == "y ~ x1 + x2 + x1:x2"
    assert a.target_test is None  # All -> overall expansion


def test_parse_ignores_unknown_fields():
    doc = _linear_doc()
    doc["some_future_knob"] = {"x": 1}  # additive evolution
    parse_app_spec(doc)


def test_parse_errors_carry_field_paths():
    doc = _linear_doc()
    del doc["alpha"]
    with pytest.raises(AppSpecError, match=r"\$\.alpha"):
        parse_app_spec(doc)
    doc = _linear_doc(correction="sidak")
    with pytest.raises(AppSpecError, match=r"\$\.correction"):
        parse_app_spec(doc)
    doc = _linear_doc(tests={"kind": "sometimes"})
    with pytest.raises(AppSpecError, match=r"\$\.tests\.kind"):
        parse_app_spec(doc)


def test_factor_labels_translate_and_reference_rotates():
    doc = _linear_doc(
        parsed_formula={
            "outcome": "y",
            "predictors": ["f"],
            "interaction_terms": [],
        },
        var_types=[
            {
                "kind": "factor",
                "name": "f",
                "factor_n_levels": 3,
                "factor_proportions": [0.2, 0.5, 0.3],
                "factor_reference": 1,  # "B" is the baseline
                "factor_labels": ["A", "B", "C"],
            }
        ],
        effects=[
            {"name": "f[A]", "value": 0.4},
            {"name": "f[C]", "value": 0.2},
        ],
        tests={"kind": "effects", "names": ["f[A]"]},
    )
    a = assemble(parse_app_spec(doc))
    m = a.model
    m._ensure_applied()
    # engine level 1 = reference (B); A, C keep declaration order as 2, 3
    assert m._effects == {"f[2]": 0.4, "f[3]": 0.2}
    assert a.target_test == "f[2]"
    # proportions rotated so the reference's share leads
    assert m._registry.factor_proportions("f") == [0.5, 0.2, 0.3]


def test_unknown_label_is_an_error():
    doc = _linear_doc(
        parsed_formula={"outcome": "y", "predictors": ["f"],
                        "interaction_terms": []},
        var_types=[{
            "kind": "factor", "name": "f", "factor_n_levels": 2,
            "factor_proportions": [0.5, 0.5], "factor_labels": ["A", "B"],
        }],
        effects=[{"name": "f[Z]", "value": 0.3}],
    )
    with pytest.raises(AppSpecError, match="unknown level label"):
        assemble(parse_app_spec(doc))


def test_mixed_assembles_lme_with_latent_icc():
    doc = {
        "family": "mixed",
        "parsed_formula": {"outcome": "y", "predictors": ["x1"],
                           "interaction_terms": []},
        "var_types": [{"kind": "numeric", "name": "x1"}],
        "effects": [{"name": "x1", "value": 0.3}],
        "correlations": None,
        "alpha": 0.05,
        "target_power": 0.8,
        "n_sims": 60,
        "seed": 3,
        "tests": {"kind": "effects", "names": ["x1"]},
        "correction": "none",
        "csv": None,
        "cluster_name": "site",
        "icc": 0.2,
        "cluster_dim": {"kind": "n_clusters", "value": 12},
    }
    a = assemble(parse_app_spec(doc))
    assert a.model.family == "lme"
    assert a.model.equation == "y ~ x1 + (1|site)"
    ps = a.model._project(["optimistic"], target_test=None, correction=None,
                          wald_se="rx", nagq=1)
    # gaussian latent scale: tau2 = icc/(1-icc)
    assert ps[0].contract.generation.cluster.tau_squared == pytest.approx(0.25)


def test_mixed_binary_outcome_uses_logit_latent_scale():
    import math

    doc = {
        "family": "mixed",
        "parsed_formula": {"outcome": "y", "predictors": ["x1"],
                           "interaction_terms": []},
        "var_types": [{"kind": "numeric", "name": "x1"}],
        "effects": [{"name": "x1", "value": 0.3}],
        "correlations": None,
        "alpha": 0.05,
        "target_power": 0.8,
        "n_sims": 60,
        "seed": 3,
        "tests": {"kind": "effects", "names": ["x1"]},
        "correction": "none",
        "csv": None,
        "cluster_name": "site",
        "icc": 0.2,
        "cluster_dim": {"kind": "n_clusters", "value": 12},
        "outcome": {"kind": "binary", "baseline_probability": 0.3},
    }
    a = assemble(parse_app_spec(doc))
    assert a.model.family == "logit"
    ps = a.model._project(["optimistic"], target_test=None, correction=None,
                          wald_se="rx", nagq=1)
    want = 0.2 / 0.8 * math.pi * math.pi / 3.0
    assert ps[0].contract.generation.cluster.tau_squared == pytest.approx(want)
    # log-odds intercept from the baseline probability (set at apply time)
    a.model._ensure_applied()
    assert a.model.intercept == pytest.approx(math.log(0.3 / 0.7))


def test_run_find_power_returns_host_payload():
    doc = _linear_doc(n_sims=200)
    out = run_find_power(doc, 120)
    assert set(out) >= {"result", "plots", "summary"}
    res = out["result"]
    assert "power" in json.dumps(res).lower() or res  # host-neutral tree
    assert isinstance(out["summary"], str) and out["summary"]
    assert any("$schema" in p for p in out["plots"].values())
    # JSON-serializable end to end (the Tauri/WASM boundary requirement)
    json.dumps(out["plots"])


def test_run_find_sample_size_grid():
    doc = _linear_doc(n_sims=150)
    out = run_find_sample_size(doc, from_size=80, to_size=200, by=40)
    assert "result" in out and "plots" in out
    json.dumps(out["plots"])
