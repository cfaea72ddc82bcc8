"""Text reports: the .summary() / verbose output of a run.

Formats mirror the reference's report conventions (configs/config.json
report.* and ports/py/mcpower/output/report.py): per-test power with
Monte-Carlo Wilson CIs, corrected columns when a correction is active,
required-N tables from the crossing fit with outward-rounded CIs, threshold-
driven diagnostics (convergence, boundary/singular rates, factor exclusion).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from ..config import CONFIG

_FMT = CONFIG["report"]["format"]
_THR = CONFIG["report"]["thresholds"]


def _pct(x: float, dec: int = None) -> str:
    dec = _FMT["power_decimals_short"] if dec is None else dec
    return f"{100.0 * x:.{dec}f}%"


def _ci(pair) -> str:
    lo, hi = pair
    return f"[{100 * lo:.1f}, {100 * hi:.1f}]"


def _row(cols: List[str], widths: List[int]) -> str:
    return "  ".join(c.ljust(w) for c, w in zip(cols, widths))


def _scenarios_of(result: Dict) -> Dict[str, Dict]:
    if "scenarios" in result:
        return result["scenarios"]
    return {result.get("scenario", "optimistic"): result}


def _diagnostics(res: Dict) -> List[str]:
    lines = []
    conv = min(res.get("convergence_rate", [1.0]))
    if conv < _THR["convergence_min"]:
        lines.append(
            f"⚠ convergence rate {conv:.1%} below {_THR['convergence_min']:.0%}"
        )
    extras = res.get("estimator_extras", {})
    mle = extras.get("mle", {})
    if mle.get("boundary_hit_rate"):
        r = max(mle["boundary_hit_rate"])
        if r > _THR["lme_boundary_hit_max"]:
            lines.append(
                f"⚠ singular (boundary) fits in {r:.1%} of simulations — the "
                "random-effect variance is hard to identify at this design"
            )
    glm = extras.get("glm", {})
    if glm.get("singular_fit_rate"):
        r = max(glm["singular_fit_rate"])
        if r > 1 - _THR["convergence_min"]:
            lines.append(f"⚠ GLM non-convergence in {r:.1%} of simulations")
    for w in res.get("warnings", []):
        lines.append(f"⚠ {w}")
    return lines


def power_report(result: Dict, alpha: float = 0.05) -> str:
    """Single-N power report (optionally multi-scenario)."""
    out: List[str] = []
    out.append("MCPower · Power Analysis")
    scenarios = _scenarios_of(result)
    corrected = any(
        r.get("alpha_correction", "none") != "none" for r in scenarios.values()
    )
    for label, res in scenarios.items():
        g = 0
        n = res["sample_sizes"][g]
        out.append("")
        title = f"Per-test power at N = {n}  (n_sims = {res['n_sims']}, α = {alpha})"
        if len(scenarios) > 1:
            title += f"  — scenario: {label}"
        out.append(title)
        headers = ["Test", "Power", "CI 95%"]
        if corrected:
            headers += [f"Power ({res['alpha_correction']})", "CI 95%"]
        rows = []
        for i, t in enumerate(res["target_labels"]):
            row = [
                t,
                _pct(res["powers"]["uncorrected"][g][i]),
                _ci(res["powers"]["ci_uncorrected"][g][i]),
            ]
            if corrected:
                row += [
                    _pct(res["powers"]["corrected"][g][i]),
                    _ci(res["powers"]["ci_corrected"][g][i]),
                ]
            rows.append(row)
        if res.get("overall_significant_rate") is not None:
            label_ov = CONFIG["report"]["overall_label_by_estimator"].get(
                res.get("estimator", "ols"), "Overall"
            )
            row = [
                label_ov,
                _pct(res["overall_significant_rate"][g]),
                _ci(res["overall_significant_ci"][g]),
            ]
            if corrected:
                row += ["—", "—"]
            rows.append(row)
        widths = [max(len(h), *(len(r[i]) for r in rows)) for i, h in enumerate(headers)]
        out.append(_row(headers, widths))
        out.append(_row(["-" * w for w in widths], widths))
        for r in rows:
            out.append(_row(r, widths))
        if res.get("joint_uncorrected_rate") is not None and len(res["target_labels"]) > 1:
            out.append(
                f"Joint (all tests significant): "
                f"{_pct(res['joint_uncorrected_rate'][g])} uncorrected"
                + (
                    f", {_pct(res['joint_corrected_rate'][g])} corrected"
                    if corrected
                    else ""
                )
            )
        if res.get("posthoc"):
            out.append("")
            out.append("Post-hoc pairwise power (Tukey HSD):")
            for fname, pairs in res["posthoc"].items():
                for plabel, v in pairs.items():
                    out.append(
                        f"  {plabel}: {_pct(v['power'][g])} {_ci(v['ci'][g])}"
                    )
        out.extend(_diagnostics(res))
    out.append("")
    out.append(
        f"95% CIs are Monte-Carlo (Wilson), n_sims="
        f"{next(iter(scenarios.values()))['n_sims']}."
    )
    return "\n".join(out)


def sample_size_report(result: Dict, target_power: float = 80.0) -> str:
    """Required-N report from the crossing fits."""
    out: List[str] = []
    out.append("MCPower · Sample-Size Search")
    tp = target_power if target_power > 1 else target_power * 100
    scenarios = _scenarios_of(result)
    notes = set()
    for label, res in scenarios.items():
        out.append("")
        title = f"Required N for {tp:.0f}% power  (n_sims = {res['n_sims']})"
        if len(scenarios) > 1:
            title += f"  — scenario: {label}"
        out.append(title)
        headers = ["Test", "Required N", "CI 95%", "First grid N"]
        rows = []
        for t in res["target_labels"]:
            fit = res["fitted"][t]
            first = res["first_achieved"].get(t)
            if fit["kind"] == "fitted":
                ci_lo = f"{fit['ci_lo']:.0f}" if fit.get("ci_lo") else "<min"
                ci_hi = f"{fit['ci_hi']:.0f}" if fit.get("ci_hi") else ">max"
                rows.append(
                    [t, str(fit["n_achievable"]), f"[{ci_lo}, {ci_hi}]",
                     str(first) if first else "—"]
                )
            elif fit["kind"] == "at_or_below_min":
                rows.append([t, f"≤ {fit['n_min']}", "—", str(first)])
                notes.add(
                    "≤ = target reached at or below the search floor — rerun "
                    "with a lower `from` to localise."
                )
            elif fit["kind"] == "not_reached":
                appr = f"appr. {fit['n_approx']}" if fit.get("n_approx") else "> max"
                rows.append([t, appr, "—", "—"])
                notes.add(
                    "appr. = probit extrapolation beyond the search range — "
                    "rerun with a higher `to` to confirm."
                )
            else:  # non_monotone
                rows.append([t, "—", "—", str(first) if first else "—"])
                notes.add(
                    f"⚠ {t}: power not monotone in N (max drop "
                    f"{100 * fit['max_violation']:.1f}pp > MC noise); "
                    "model-based fit suppressed — grid value shown."
                )
        widths = [max(len(h), *(len(r[i]) for r in rows)) for i, h in enumerate(headers)]
        out.append(_row(headers, widths))
        out.append(_row(["-" * w for w in widths], widths))
        for r in rows:
            out.append(_row(r, widths))
        out.extend(_diagnostics(res))
    out.append("")
    out.append(
        "Required N from the model-based crossing fit (isotonic); CI by "
        "Wilson band inversion, rounded outward."
    )
    out.extend(sorted(notes))
    return "\n".join(out)
