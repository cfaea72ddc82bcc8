"""AppSpec wire types: tagged GUI state, parsed with additive evolution.

Mirrors the reference's ``crates/engine-app-spec/src/app_spec.rs`` shapes:
a ``family``-tagged union (linear | logit | mixed | poisson) whose fields
are the GUI's state — *names and labels everywhere* (the contract below is
label-free; this layer owns the name→index resolution, done in
``assemble.py``). Parsing rules follow the reference's serde attributes:

* unknown keys are ignored (forward compatibility),
* absent optional keys take the documented defaults (backward
  compatibility — a pre-AGQ payload still parses, with ``agq=1``),
* malformed values raise :class:`AppSpecError` with the field path.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple


class AppSpecError(ValueError):
    """A structurally invalid AppSpec document (field path + reason)."""

    def __init__(self, path: str, reason: str):
        self.path = path
        self.reason = reason
        super().__init__(f"{path}: {reason}")


# ---------------------------------------------------------------------------
# leaf shapes
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AppParsedFormula:
    """Decomposed formula: outcome, flat predictors, interaction groups."""

    outcome: str
    predictors: Tuple[str, ...]
    interaction_terms: Tuple[Tuple[str, ...], ...] = ()


@dataclass(frozen=True)
class AppVarType:
    """One predictor's declared kind.

    ``kind``: "numeric" | "binary" | "factor".  Numeric carries a synthetic
    distribution + pin flag; binary a proportion; factor levels/proportions
    plus a 0-based reference level index and optional display labels (the
    labels are load-bearing: effect names are derived from them and the
    assembler must translate label-form effect names to the engine's
    1-based ``f[level]`` form).
    """

    kind: str
    name: str
    distribution: str = "normal"
    pinned: bool = False
    binary_proportion: float = 0.5
    factor_n_levels: int = 0
    factor_proportions: Tuple[float, ...] = ()
    factor_reference: int = 0
    factor_labels: Tuple[str, ...] = ()
    sampled_proportions: Optional[bool] = None


@dataclass(frozen=True)
class AppEffect:
    name: str
    value: float


@dataclass(frozen=True)
class AppCorrelations:
    names: Tuple[str, ...]
    values: Tuple[Tuple[float, ...], ...]


@dataclass(frozen=True)
class AppTestSelection:
    """kind: "all" (omnibus + every effect) | "effects" | "contrasts"."""

    kind: str
    names: Tuple[str, ...] = ()


@dataclass(frozen=True)
class AppSlopeTerm:
    predictor_name: str
    slope_variance: float
    slope_intercept_corr: float


@dataclass(frozen=True)
class AppGrouping:
    """One extra grouping factor: crossed {n_clusters} or nested_within
    {n_per_parent}, with a direct tau_squared (no ICC conversion for
    secondaries — mirrors AppGroupingSpec)."""

    relation: str  # "crossed" | "nested_within"
    size: int  # n_clusters (crossed) or n_per_parent (nested)
    tau_squared: float
    cluster_name: Optional[str] = None
    slopes: Tuple[AppSlopeTerm, ...] = ()


@dataclass(frozen=True)
class AppClusterDim:
    kind: str  # "n_clusters" | "cluster_size"
    value: int


@dataclass(frozen=True)
class AppMixedOutcome:
    """kind: "gaussian" | "binary" | "poisson" (MixedOutcome tagged enum)."""

    kind: str = "gaussian"
    baseline_probability: Optional[float] = None
    link: str = "logit"
    baseline_rate: Optional[float] = None
    tau_squared: Optional[float] = None


@dataclass(frozen=True)
class AppOutcomeOptions:
    residual_distribution: Optional[str] = None
    heteroskedasticity_driver: Optional[str] = None


@dataclass(frozen=True)
class AppCsvData:
    """Uploaded data attached to a spec: mode + columns of raw values."""

    mode: str  # "partial" | "strict"
    columns: Dict[str, List[float]]


@dataclass(frozen=True)
class AppScenario:
    """One scenario fan-out entry: preset label + overrides."""

    label: str
    overrides: Dict[str, Any] = field(default_factory=dict)


# ---------------------------------------------------------------------------
# the tagged union
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AppSpec:
    """One GUI document. ``family`` selects the variant; family-specific
    fields are None when not applicable (the assembler validates)."""

    family: str  # "linear" | "logit" | "mixed" | "poisson"
    parsed_formula: AppParsedFormula
    var_types: Tuple[AppVarType, ...]
    effects: Tuple[AppEffect, ...]
    correlations: Optional[AppCorrelations]
    alpha: float
    target_power: float
    n_sims: int
    seed: int
    tests: AppTestSelection
    correction: str
    wald_se: str = "rx"
    agq: int = 1
    scenarios: Tuple[AppScenario, ...] = ()
    csv: Optional[AppCsvData] = None
    report_overall: bool = False
    # all-pairwise post-hoc contrasts for every factor (the reference app's
    # ANOVA/posthoc editor emits this; maps to the "all-posthoc" target
    # token — testsel.resolve_tests)
    posthoc: bool = False
    contrasts: Tuple[Tuple[str, str], ...] = ()
    test_formula: Optional[str] = None
    outcome_options: Optional[AppOutcomeOptions] = None
    # logit / poisson
    baseline_probability: Optional[float] = None
    link: str = "logit"
    baseline_rate: Optional[float] = None
    # mixed
    cluster_name: Optional[str] = None
    icc: Optional[float] = None
    cluster_dim: Optional[AppClusterDim] = None
    cluster_level_vars: Tuple[str, ...] = ()
    extra_groupings: Tuple[AppGrouping, ...] = ()
    slopes: Tuple[AppSlopeTerm, ...] = ()
    mixed_outcome: AppMixedOutcome = AppMixedOutcome()


_FAMILIES = ("linear", "logit", "mixed", "poisson")
_CORRECTIONS = ("none", "bonferroni", "holm", "benjamini_hochberg", "tukey_hsd")


def _req(d: Dict, key: str, path: str):
    if key not in d or d[key] is None:
        raise AppSpecError(f"{path}.{key}", "required field missing")
    return d[key]


def _num(v, path: str) -> float:
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise AppSpecError(path, f"expected a number, got {type(v).__name__}")
    return float(v)


def _integer(v, path: str) -> int:
    if isinstance(v, bool) or not isinstance(v, int):
        raise AppSpecError(path, f"expected an integer, got {type(v).__name__}")
    return v


def _string(v, path: str) -> str:
    if not isinstance(v, str):
        raise AppSpecError(path, f"expected a string, got {type(v).__name__}")
    return v


def _parse_formula(d: Any, path: str) -> AppParsedFormula:
    if not isinstance(d, dict):
        raise AppSpecError(path, "expected an object")
    preds = _req(d, "predictors", path)
    if not isinstance(preds, list):
        raise AppSpecError(f"{path}.predictors", "expected a list")
    inter = d.get("interaction_terms") or []
    return AppParsedFormula(
        outcome=_string(_req(d, "outcome", path), f"{path}.outcome"),
        predictors=tuple(_string(p, f"{path}.predictors[]") for p in preds),
        interaction_terms=tuple(
            tuple(_string(v, f"{path}.interaction_terms[][]") for v in group)
            for group in inter
        ),
    )


def _parse_var_type(d: Any, path: str) -> AppVarType:
    if not isinstance(d, dict):
        raise AppSpecError(path, "expected an object")
    kind = _string(_req(d, "kind", path), f"{path}.kind").lower()
    name = _string(_req(d, "name", path), f"{path}.name")
    if kind == "numeric":
        dist = _string(d.get("distribution", "normal"), f"{path}.distribution")
        return AppVarType(
            kind="numeric", name=name, distribution=dist,
            pinned=bool(d.get("pinned", False)),
        )
    if kind == "binary":
        return AppVarType(
            kind="binary", name=name,
            binary_proportion=_num(
                _req(d, "binary_proportion", path), f"{path}.binary_proportion"
            ),
        )
    if kind == "factor":
        k = _integer(_req(d, "factor_n_levels", path), f"{path}.factor_n_levels")
        props = _req(d, "factor_proportions", path)
        if not isinstance(props, list) or len(props) != k:
            raise AppSpecError(
                f"{path}.factor_proportions",
                f"expected a list of {k} proportions",
            )
        labels = tuple(
            _string(x, f"{path}.factor_labels[]")
            for x in d.get("factor_labels") or ()
        )
        if labels and len(labels) != k:
            raise AppSpecError(
                f"{path}.factor_labels", f"expected {k} labels, got {len(labels)}"
            )
        ref = _integer(d.get("factor_reference", 0), f"{path}.factor_reference")
        if not 0 <= ref < k:
            raise AppSpecError(
                f"{path}.factor_reference", f"must be in [0, {k})"
            )
        sampled = d.get("sampled_proportions")
        if sampled is not None and not isinstance(sampled, bool):
            raise AppSpecError(f"{path}.sampled_proportions", "expected a bool")
        return AppVarType(
            kind="factor", name=name, factor_n_levels=k,
            factor_proportions=tuple(_num(p, f"{path}.factor_proportions[]") for p in props),
            factor_reference=ref, factor_labels=labels,
            sampled_proportions=sampled,
        )
    raise AppSpecError(f"{path}.kind", f"unknown var type kind {kind!r}")


def _parse_slope(d: Any, path: str) -> AppSlopeTerm:
    if not isinstance(d, dict):
        raise AppSpecError(path, "expected an object")
    return AppSlopeTerm(
        predictor_name=_string(_req(d, "predictor_name", path), f"{path}.predictor_name"),
        slope_variance=_num(_req(d, "slope_variance", path), f"{path}.slope_variance"),
        slope_intercept_corr=_num(
            d.get("slope_intercept_corr", 0.0), f"{path}.slope_intercept_corr"
        ),
    )


def _parse_grouping(d: Any, path: str) -> AppGrouping:
    if not isinstance(d, dict):
        raise AppSpecError(path, "expected an object")
    rel = _req(d, "relation", path)
    if not isinstance(rel, dict) or "kind" not in rel:
        raise AppSpecError(f"{path}.relation", "expected {kind, ...}")
    kind = _string(rel["kind"], f"{path}.relation.kind").lower()
    if kind == "crossed":
        size = _integer(_req(rel, "n_clusters", f"{path}.relation"),
                        f"{path}.relation.n_clusters")
    elif kind == "nested_within":
        size = _integer(_req(rel, "n_per_parent", f"{path}.relation"),
                        f"{path}.relation.n_per_parent")
    else:
        raise AppSpecError(f"{path}.relation.kind", f"unknown relation {kind!r}")
    name = d.get("cluster_name")
    return AppGrouping(
        relation=kind, size=size,
        tau_squared=_num(_req(d, "tau_squared", path), f"{path}.tau_squared"),
        cluster_name=_string(name, f"{path}.cluster_name") if name is not None else None,
        slopes=tuple(
            _parse_slope(s, f"{path}.slopes[{i}]")
            for i, s in enumerate(d.get("slopes") or ())
        ),
    )


def _parse_mixed_outcome(d: Any, path: str) -> AppMixedOutcome:
    if d is None:
        return AppMixedOutcome()
    if not isinstance(d, dict):
        raise AppSpecError(path, "expected an object")
    kind = _string(d.get("kind", "gaussian"), f"{path}.kind").lower()
    if kind == "gaussian":
        return AppMixedOutcome()
    if kind == "binary":
        link = _string(d.get("link", "logit"), f"{path}.link").lower()
        if link not in ("logit", "probit"):
            raise AppSpecError(f"{path}.link", f"unknown link {link!r}")
        return AppMixedOutcome(
            kind="binary",
            baseline_probability=_num(
                _req(d, "baseline_probability", path),
                f"{path}.baseline_probability",
            ),
            link=link,
        )
    if kind == "poisson":
        return AppMixedOutcome(
            kind="poisson",
            baseline_rate=_num(_req(d, "baseline_rate", path), f"{path}.baseline_rate"),
            tau_squared=_num(_req(d, "tau_squared", path), f"{path}.tau_squared"),
        )
    raise AppSpecError(f"{path}.kind", f"unknown mixed outcome {kind!r}")


def _parse_scenarios(v: Any, path: str) -> Tuple[AppScenario, ...]:
    out: List[AppScenario] = []
    for i, s in enumerate(v or ()):
        p = f"{path}[{i}]"
        if isinstance(s, str):
            out.append(AppScenario(label=s))
        elif isinstance(s, dict):
            out.append(
                AppScenario(
                    label=_string(_req(s, "label", p), f"{p}.label"),
                    overrides={k: v2 for k, v2 in s.items() if k != "label"},
                )
            )
        else:
            raise AppSpecError(p, "expected a label string or {label, ...}")
    return tuple(out)


def parse_app_spec(doc: Any) -> AppSpec:
    """Parse an AppSpec from a JSON string or a decoded dict.

    Tag dispatch on ``family`` mirrors the reference's
    ``#[serde(tag = "family")]``; every ``#[serde(default)]`` there is a
    Python default here, so payloads written before a knob existed parse
    to the same behavior they had then.
    """
    if isinstance(doc, (str, bytes)):
        try:
            doc = json.loads(doc)
        except json.JSONDecodeError as e:
            raise AppSpecError("$", f"invalid JSON: {e}") from None
    if not isinstance(doc, dict):
        raise AppSpecError("$", "expected a JSON object")

    family = _string(_req(doc, "family", "$"), "$.family").lower()
    if family not in _FAMILIES:
        raise AppSpecError("$.family", f"must be one of {_FAMILIES}")

    correction = _string(doc.get("correction", "none"), "$.correction").lower()
    if correction not in _CORRECTIONS:
        raise AppSpecError("$.correction", f"must be one of {_CORRECTIONS}")

    tests_d = _req(doc, "tests", "$")
    if not isinstance(tests_d, dict) or "kind" not in tests_d:
        raise AppSpecError("$.tests", "expected {kind, ...}")
    tkind = _string(tests_d["kind"], "$.tests.kind").lower()
    if tkind not in ("all", "effects", "contrasts"):
        raise AppSpecError("$.tests.kind", f"unknown selection {tkind!r}")
    tests = AppTestSelection(
        kind=tkind,
        names=tuple(
            _string(n, "$.tests.names[]") for n in tests_d.get("names") or ()
        ),
    )

    corr_d = doc.get("correlations")
    correlations = None
    if corr_d is not None:
        names = _req(corr_d, "names", "$.correlations")
        values = _req(corr_d, "values", "$.correlations")
        if len(values) != len(names) or any(len(r) != len(names) for r in values):
            raise AppSpecError("$.correlations.values", "must be square over names")
        correlations = AppCorrelations(
            names=tuple(_string(n, "$.correlations.names[]") for n in names),
            values=tuple(
                tuple(_num(x, "$.correlations.values[][]") for x in row)
                for row in values
            ),
        )

    csv_d = doc.get("csv")
    csv = None
    if csv_d is not None:
        mode = _string(_req(csv_d, "mode", "$.csv"), "$.csv.mode").lower()
        if mode not in ("partial", "strict"):
            raise AppSpecError("$.csv.mode", f"unknown upload mode {mode!r}")
        cols = _req(csv_d, "columns", "$.csv")
        if not isinstance(cols, dict):
            raise AppSpecError("$.csv.columns", "expected {name: [values]}")
        csv = AppCsvData(mode=mode, columns={k: list(v) for k, v in cols.items()})

    out_opt_d = doc.get("outcome_options")
    outcome_options = None
    if out_opt_d is not None:
        outcome_options = AppOutcomeOptions(
            residual_distribution=out_opt_d.get("residual_distribution"),
            heteroskedasticity_driver=out_opt_d.get("heteroskedasticity_driver"),
        )

    wald_se = _string(doc.get("wald_se", "rx"), "$.wald_se").lower()
    if wald_se not in ("rx", "hessian"):
        raise AppSpecError("$.wald_se", "must be 'rx' or 'hessian'")

    common = dict(
        family=family,
        parsed_formula=_parse_formula(_req(doc, "parsed_formula", "$"), "$.parsed_formula"),
        var_types=tuple(
            _parse_var_type(v, f"$.var_types[{i}]")
            for i, v in enumerate(_req(doc, "var_types", "$"))
        ),
        effects=tuple(
            AppEffect(
                name=_string(_req(e, "name", f"$.effects[{i}]"), f"$.effects[{i}].name"),
                value=_num(_req(e, "value", f"$.effects[{i}]"), f"$.effects[{i}].value"),
            )
            for i, e in enumerate(_req(doc, "effects", "$"))
        ),
        correlations=correlations,
        alpha=_num(_req(doc, "alpha", "$"), "$.alpha"),
        target_power=_num(_req(doc, "target_power", "$"), "$.target_power"),
        n_sims=_integer(_req(doc, "n_sims", "$"), "$.n_sims"),
        seed=_integer(_req(doc, "seed", "$"), "$.seed"),
        tests=tests,
        correction=correction,
        wald_se=wald_se,
        agq=_integer(doc.get("agq", 1), "$.agq"),
        scenarios=_parse_scenarios(doc.get("scenarios"), "$.scenarios"),
        csv=csv,
        report_overall=bool(doc.get("report_overall", False)),
        posthoc=bool(doc.get("posthoc", False)),
        contrasts=tuple(
            (  # [pos, neg] pairs
                _string(c[0], f"$.contrasts[{i}][0]"),
                _string(c[1], f"$.contrasts[{i}][1]"),
            )
            for i, c in enumerate(doc.get("contrasts") or ())
        ),
        test_formula=doc.get("test_formula"),
        outcome_options=outcome_options,
    )

    if family == "linear":
        return AppSpec(**common)
    if family == "logit":
        link = _string(doc.get("link", "logit"), "$.link").lower()
        if link not in ("logit", "probit"):
            raise AppSpecError("$.link", f"unknown link {link!r}")
        return AppSpec(
            baseline_probability=_num(
                _req(doc, "baseline_probability", "$"), "$.baseline_probability"
            ),
            link=link,
            **common,
        )
    if family == "poisson":
        return AppSpec(
            baseline_rate=_num(_req(doc, "baseline_rate", "$"), "$.baseline_rate"),
            **common,
        )
    # mixed
    dim_d = _req(doc, "cluster_dim", "$")
    if not isinstance(dim_d, dict) or "kind" not in dim_d:
        raise AppSpecError("$.cluster_dim", "expected {kind, value}")
    dkind = _string(dim_d["kind"], "$.cluster_dim.kind").lower()
    if dkind not in ("n_clusters", "cluster_size"):
        raise AppSpecError("$.cluster_dim.kind", f"unknown kind {dkind!r}")
    cluster_dim = AppClusterDim(
        kind=dkind, value=_integer(_req(dim_d, "value", "$.cluster_dim"),
                                   "$.cluster_dim.value"),
    )
    mixed_outcome = _parse_mixed_outcome(doc.get("outcome"), "$.outcome")
    icc = doc.get("icc")
    return AppSpec(
        cluster_name=_string(_req(doc, "cluster_name", "$"), "$.cluster_name"),
        icc=_num(icc, "$.icc") if icc is not None else None,
        cluster_dim=cluster_dim,
        cluster_level_vars=tuple(
            _string(v, "$.cluster_level_vars[]")
            for v in doc.get("cluster_level_vars") or ()
        ),
        extra_groupings=tuple(
            _parse_grouping(g, f"$.extra_groupings[{i}]")
            for i, g in enumerate(doc.get("extra_groupings") or ())
        ),
        slopes=tuple(
            _parse_slope(s, f"$.slopes[{i}]")
            for i, s in enumerate(doc.get("slopes") or ())
        ),
        mixed_outcome=mixed_outcome,
        **common,
    )
