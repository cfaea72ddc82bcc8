"""Assemble: AppSpec GUI state -> a configured engine model.

The reference's ``crates/engine-app-spec/src/assemble.rs`` (2,338 LoC)
lowers the tagged AppSpec into the spec-builder's input type
(``BuilderLinearSpec``): it reconstructs the formula string from the
parsed-formula shape, renders variable-type declarations, translates
label-form effect names to the engine's level-index form, converts GUI
baselines/ICCs, and wires scenarios/upload/tests through.

Here the spec-builder input surface is the :class:`mcpower_tpu.MCPower`
configuration state (the same projection path every host shares —
``specbuilder/project.py``), so assembly produces a configured ``MCPower``
plus the run-time knobs (wald_se, agq, scenario labels) the driver passes
to the entry operations. All name/label resolution happens HERE: below
this layer everything is label-free.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from .types import AppSpec, AppSpecError, AppVarType


@dataclass
class Assembled:
    """A ready-to-run model + the per-run knobs the driver forwards."""

    model: "object"  # mcpower_tpu.model.MCPower
    scenario_labels: Optional[List[str]]  # None = baseline only
    wald_se: str
    agq: int
    target_test: Optional[str]
    correction: str
    test_formula: Optional[str]
    target_power: float
    n_sims: int
    seed: int


# ---------------------------------------------------------------------------
# label translation
# ---------------------------------------------------------------------------

def _label_maps(vt: AppVarType) -> Dict[str, int]:
    """Map each user label of a factor to its ENGINE level (1-based).

    The engine's column-order invariant puts the reference level first
    (level 1, dropped from dummy expansion); the AppSpec keeps levels in
    declaration order with ``factor_reference`` pointing at the baseline.
    Rotation rule: reference label -> level 1; the remaining labels keep
    their declaration order as levels 2..k.
    """
    k = vt.factor_n_levels
    labels = list(vt.factor_labels) or [str(i + 1) for i in range(k)]
    ref = vt.factor_reference
    order = [ref] + [i for i in range(k) if i != ref]
    return {labels[orig]: lvl + 1 for lvl, orig in enumerate(order)}


def _rotated_proportions(vt: AppVarType) -> List[float]:
    ref = vt.factor_reference
    props = list(vt.factor_proportions)
    return [props[ref]] + [p for i, p in enumerate(props) if i != ref]


class _NameTranslator:
    """Translates GUI effect names (``f[label]``, ``a:f[label]``) to the
    engine's 1-based level form (``f[2]``, ``a:f[2]``)."""

    def __init__(self, var_types: Tuple[AppVarType, ...]):
        self._factor_maps: Dict[str, Dict[str, int]] = {
            vt.name: _label_maps(vt)
            for vt in var_types
            if vt.kind == "factor"
        }

    def effect(self, name: str, path: str) -> str:
        parts = []
        for comp in name.split(":"):
            comp = comp.strip()
            if "[" in comp and comp.endswith("]"):
                fac, label = comp[:-1].split("[", 1)
                lv_map = self._factor_maps.get(fac)
                if lv_map is None:
                    raise AppSpecError(path, f"{fac!r} is not a factor")
                if label not in lv_map:
                    # legacy numeric form f[2] with default labels passes
                    # through _label_maps already; anything else is unknown
                    raise AppSpecError(
                        path, f"unknown level label {label!r} for {fac!r}"
                    )
                lvl = lv_map[label]
                parts.append(f"{fac}[{lvl}]")
            else:
                parts.append(comp)
        return ":".join(parts)


# ---------------------------------------------------------------------------
# formula reconstruction
# ---------------------------------------------------------------------------

def _build_formula(app: AppSpec) -> str:
    """Rebuild the R-style formula string from the decomposed shape.

    Mirrors assemble.rs ``project_to_builder_spec``'s formula synthesis:
    ``y ~ x1 + x2 + a:b`` plus, for mixed specs, the random-effect terms
    — ``(1|g)`` / ``(1+x|g)`` for the primary, ``(1|g2)`` for crossed
    extras and ``(1|g/child)`` for nested extras.
    """
    pf = app.parsed_formula
    rhs: List[str] = list(pf.predictors)
    rhs += [":".join(group) for group in pf.interaction_terms]
    if not rhs:
        rhs = ["1"]
    if app.family == "mixed":
        if not app.cluster_name:
            raise AppSpecError("$.cluster_name", "mixed spec needs a cluster")
        for idx, g in enumerate(app.extra_groupings):
            if g.cluster_name is None:
                raise AppSpecError(
                    f"$.extra_groupings[{idx}].cluster_name",
                    "extra groupings need a cluster_name to appear in the "
                    "reconstructed formula",
                )
        nested = [g for g in app.extra_groupings
                  if g.relation == "nested_within"]
        crossed = [g for g in app.extra_groupings if g.relation == "crossed"]
        if len(nested) > 1:
            raise AppSpecError(
                "$.extra_groupings",
                "at most one nested grouping under the primary is supported",
            )
        if nested and app.slopes:
            raise AppSpecError(
                "$.slopes",
                "primary random slopes cannot be combined with a nested "
                "extra grouping (the formula DSL has no (1+x|a) + (1|a/b))",
            )
        if nested:
            # (1|a/b) declares BOTH the primary and the nested child —
            # a standalone (1|a) term would be a duplicate-grouping error
            rhs.append(f"(1|{app.cluster_name}/{nested[0].cluster_name})")
        elif app.slopes:
            inner = "1+" + "+".join(s.predictor_name for s in app.slopes)
            rhs.append(f"({inner}|{app.cluster_name})")
        else:
            rhs.append(f"(1|{app.cluster_name})")
        for g in crossed:
            rhs.append(f"(1|{g.cluster_name})")
    return f"{pf.outcome} ~ {' + '.join(rhs)}"


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------

def _family_and_link(app: AppSpec) -> Tuple[str, Optional[float], Optional[float]]:
    """Resolve (MCPower family, baseline_probability, baseline_rate)."""
    if app.family == "linear":
        return "ols", None, None
    if app.family == "logit":
        fam = "probit" if app.link == "probit" else "logit"
        return fam, app.baseline_probability, None
    if app.family == "poisson":
        return "poisson", None, app.baseline_rate
    mo = app.mixed_outcome
    if mo.kind == "binary":
        fam = "probit" if mo.link == "probit" else "logit"
        return fam, mo.baseline_probability, None
    if mo.kind == "poisson":
        return "poisson", None, mo.baseline_rate
    return "lme", None, None


def _var_type_decl(vt: AppVarType) -> Optional[str]:
    """Render one set_variable_type fragment, or None for the default."""
    if vt.kind == "numeric":
        if vt.distribution == "normal" and not vt.pinned:
            return None
        return f"{vt.name}={vt.distribution}"
    if vt.kind == "binary":
        return f"{vt.name}=(binary,{vt.binary_proportion})"
    props = ",".join(str(p) for p in _rotated_proportions(vt))
    return f"{vt.name}=(factor,{props})"


def assemble(app: AppSpec) -> Assembled:
    """AppSpec -> configured MCPower + run knobs.

    Raises :class:`AppSpecError` for every GUI-state inconsistency a host
    could produce (unknown names, missing family fields, bad label refs) —
    the same class of checks assemble.rs performs before projection.
    """
    from ..model import MCPower

    tr = _NameTranslator(app.var_types)
    declared = {vt.name for vt in app.var_types}
    for p in app.parsed_formula.predictors:
        if p not in declared:
            raise AppSpecError("$.var_types", f"predictor {p!r} undeclared")

    family, baseline_p, baseline_rate = _family_and_link(app)
    model = MCPower(_build_formula(app), family=family)

    # simulation knobs
    model.set_alpha(app.alpha)
    model.set_simulations(app.n_sims)
    model.set_seed(app.seed)
    model.set_power(app.target_power * 100.0
                    if app.target_power <= 1.0 else app.target_power)

    # variable types
    decls = [d for d in (_var_type_decl(vt) for vt in app.var_types) if d]
    if decls:
        model.set_variable_type(", ".join(decls))

    # effects (label -> engine-level translation)
    if app.effects:
        model.set_effects(
            {
                tr.effect(e.name, f"$.effects[{i}].name"): e.value
                for i, e in enumerate(app.effects)
            }
        )

    # correlations: only non-zero off-diagonals become pairs (assemble.rs
    # emits CorrelationPairs the same way)
    if app.correlations is not None:
        corr = app.correlations
        pairs = {}
        for i in range(len(corr.names)):
            for j in range(i + 1, len(corr.names)):
                v = corr.values[i][j]
                if v != 0.0:
                    pairs[(corr.names[i], corr.names[j])] = v
        if pairs:
            model.set_correlations(pairs)

    # baselines
    if baseline_p is not None:
        model.set_baseline_probability(baseline_p)
    if baseline_rate is not None:
        model.set_baseline_rate(baseline_rate)

    # outcome options
    if app.outcome_options is not None:
        oo = app.outcome_options
        if oo.residual_distribution:
            model.set_residual_distribution(oo.residual_distribution)
        if oo.heteroskedasticity_driver:
            model.set_heteroskedasticity_driver(oo.heteroskedasticity_driver)

    # cluster configuration (mixed family)
    if app.family == "mixed":
        dim = app.cluster_dim
        n_clusters = dim.value if dim.kind == "n_clusters" else None
        cluster_size = dim.value if dim.kind == "cluster_size" else None
        kw: Dict = dict(
            n_clusters=n_clusters,
            cluster_size=cluster_size,
            cluster_level_vars=list(app.cluster_level_vars) or None,
        )
        mo = app.mixed_outcome
        if mo.kind == "poisson":
            # raw tau^2 (no latent ICC scale for log-link counts)
            kw["tau_squared"] = mo.tau_squared
        else:
            if app.icc is None:
                raise AppSpecError("$.icc", "mixed spec needs icc")
            kw["ICC"] = app.icc
        if app.slopes:
            # one shared variance/corr knob per set_cluster call; the GUI
            # sends per-slope values — forward the first and reject mixes
            # the flat API cannot represent
            variances = {s.slope_variance for s in app.slopes}
            corrs = {s.slope_intercept_corr for s in app.slopes}
            if len(variances) > 1 or len(corrs) > 1:
                raise AppSpecError(
                    "$.slopes",
                    "per-slope variances/correlations differ; the engine "
                    "API carries one shared value per grouping",
                )
            kw["random_slopes"] = [s.predictor_name for s in app.slopes]
            kw["slope_variance"] = app.slopes[0].slope_variance
            kw["slope_intercept_corr"] = app.slopes[0].slope_intercept_corr
        model.set_cluster(app.cluster_name, **kw)

        for idx, g in enumerate(app.extra_groupings):
            name = g.cluster_name  # presence validated in _build_formula
            gkw: Dict = dict(tau_squared=g.tau_squared)
            if g.relation == "nested_within":
                gkw["n_per_parent"] = g.size
                gname = f"{app.cluster_name}:{name}"
            else:
                gkw["n_clusters"] = g.size
                gname = name
            if g.slopes:
                gkw["random_slopes"] = [s.predictor_name for s in g.slopes]
                gkw["slope_variance"] = g.slopes[0].slope_variance
                gkw["slope_intercept_corr"] = g.slopes[0].slope_intercept_corr
            model.set_cluster(gname, **gkw)

    # scenarios: label list + per-label overrides
    scenario_labels: Optional[List[str]] = None
    if app.scenarios:
        overrides = {
            s.label: s.overrides for s in app.scenarios if s.overrides
        }
        if overrides:
            model.set_scenario_configs(overrides)
        scenario_labels = [s.label for s in app.scenarios]

    # uploaded data
    if app.csv is not None:
        model.upload_data(app.csv.columns, mode=app.csv.mode, verbose=False)

    # tests -> target_test DSL (All -> "overall" expansion = our "all"
    # keyword; assemble.rs:697 maps All to the expanding "overall" target)
    tokens: List[str] = []
    if app.tests.kind == "all":
        target_test: Optional[str] = None  # default: every effect + omnibus
    elif app.tests.kind == "effects":
        tokens = [
            tr.effect(n, f"$.tests.names[{i}]")
            for i, n in enumerate(app.tests.names)
        ]
        target_test = ", ".join(tokens)
    else:  # contrasts
        tokens = [
            tr.effect(n, f"$.tests.names[{i}]")
            for i, n in enumerate(app.tests.names)
        ]
        target_test = ", ".join(tokens)
    for i, (pos, neg) in enumerate(app.contrasts):
        tok = (
            f"{tr.effect(pos, f'$.contrasts[{i}][0]')} vs "
            f"{tr.effect(neg, f'$.contrasts[{i}][1]')}"
        )
        target_test = tok if target_test is None else f"{target_test}, {tok}"
    if app.report_overall and target_test is not None and app.tests.kind != "all":
        target_test = f"{target_test}, overall"
    if app.posthoc:
        # all-pairwise post-hoc per factor (testsel "all-posthoc"); with the
        # default "all" selection the explicit "all" keyword reproduces the
        # None-default expansion (every effect + omnibus when available)
        if not any(vt.kind == "factor" for vt in app.var_types):
            raise AppSpecError(
                "$.posthoc", "post-hoc contrasts need at least one factor"
            )
        target_test = (
            "all, all-posthoc"
            if target_test is None
            else f"{target_test}, all-posthoc"
        )

    tp = app.target_power if app.target_power > 1.0 else app.target_power * 100.0
    return Assembled(
        model=model,
        scenario_labels=scenario_labels,
        wald_se=app.wald_se,
        agq=app.agq,
        target_test=target_test,
        correction=app.correction,
        test_formula=app.test_formula,
        target_power=tp,
        n_sims=app.n_sims,
        seed=app.seed,
    )
