"""Vega-Lite v5 plot emitters — theme-naked specs, one per result shape.

The port contract of the reference's plot layer
(crates/engine-orchestrator/src/plot.rs): every plot is a self-contained
Vega-Lite JSON spec with inline data and no theme (hosts graft their theme
on top). Emitters: per-test power bars, power-vs-N curves with Wilson CI
bands, joint-detection curves, exactly-k detection curves.

``to_html`` wraps any spec in a minimal vega-embed page for notebook-free
viewing.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

_SCHEMA = "https://vega.github.io/schema/vega-lite/v5.json"


def power_bars(result: Dict, *, corrected: bool = False, g: int = 0) -> Dict:
    """Per-test power bars with Wilson CI whiskers at one grid point."""
    which = "corrected" if corrected else "uncorrected"
    rows = []
    for i, t in enumerate(result["target_labels"]):
        lo, hi = result["powers"][f"ci_{which}"][g][i]
        rows.append(
            {
                "test": t,
                "power": 100.0 * result["powers"][which][g][i],
                "ci_lo": 100.0 * lo,
                "ci_hi": 100.0 * hi,
            }
        )
    return {
        "$schema": _SCHEMA,
        "description": f"Per-test power ({which})",
        "data": {"values": rows},
        "layer": [
            {
                "mark": "bar",
                "encoding": {
                    "x": {"field": "test", "type": "nominal", "sort": None},
                    "y": {
                        "field": "power",
                        "type": "quantitative",
                        "scale": {"domain": [0, 100]},
                        "title": "Power (%)",
                    },
                },
            },
            {
                "mark": {"type": "errorbar", "ticks": True},
                "encoding": {
                    "x": {"field": "test", "type": "nominal", "sort": None},
                    "y": {"field": "ci_lo", "type": "quantitative", "title": ""},
                    "y2": {"field": "ci_hi"},
                },
            },
        ],
    }


def power_curves(result: Dict, *, corrected: bool = True) -> Dict:
    """Power vs N curves with CI bands (sample-size search results)."""
    which = "corrected" if corrected else "uncorrected"
    rows = []
    for gi, n in enumerate(result["sample_sizes"]):
        for i, t in enumerate(result["target_labels"]):
            lo, hi = result["powers"][f"ci_{which}"][gi][i]
            rows.append(
                {
                    "N": n,
                    "test": t,
                    "power": 100.0 * result["powers"][which][gi][i],
                    "ci_lo": 100.0 * lo,
                    "ci_hi": 100.0 * hi,
                }
            )
    target = 100.0 * result.get("target_power", 0.8)
    return {
        "$schema": _SCHEMA,
        "description": f"Power vs sample size ({which})",
        "data": {"values": rows},
        "layer": [
            {
                "mark": {"type": "errorband", "opacity": 0.25},
                "encoding": {
                    "x": {"field": "N", "type": "quantitative"},
                    "y": {"field": "ci_lo", "type": "quantitative", "title": "Power (%)"},
                    "y2": {"field": "ci_hi"},
                    "color": {"field": "test", "type": "nominal"},
                },
            },
            {
                "mark": {"type": "line", "point": True},
                "encoding": {
                    "x": {"field": "N", "type": "quantitative", "title": "Sample size"},
                    "y": {
                        "field": "power",
                        "type": "quantitative",
                        "scale": {"domain": [0, 100]},
                    },
                    "color": {"field": "test", "type": "nominal"},
                },
            },
            {
                "mark": {"type": "rule", "strokeDash": [6, 4]},
                "data": {"values": [{"target": target}]},
                "encoding": {"y": {"field": "target", "type": "quantitative"}},
            },
        ],
    }


def joint_detection_curves(result: Dict, *, corrected: bool = True) -> Dict:
    """P(all tests significant) vs N."""
    key = "joint_corrected_rate" if corrected else "joint_uncorrected_rate"
    rows = [
        {"N": n, "joint": 100.0 * result[key][gi]}
        for gi, n in enumerate(result["sample_sizes"])
    ]
    return {
        "$schema": _SCHEMA,
        "description": "Joint detection (all tests significant) vs sample size",
        "data": {"values": rows},
        "mark": {"type": "line", "point": True},
        "encoding": {
            "x": {"field": "N", "type": "quantitative", "title": "Sample size"},
            "y": {
                "field": "joint",
                "type": "quantitative",
                "title": "P(all significant) (%)",
                "scale": {"domain": [0, 100]},
            },
        },
    }


def exactly_k_curves(result: Dict, *, corrected: bool = False) -> Dict:
    """P(exactly k of the targets significant) vs N, one line per k."""
    key = (
        "success_count_histogram_corrected"
        if corrected
        else "success_count_histogram_uncorrected"
    )
    hist = result[key]
    n_sims = result["n_sims"]
    rows = []
    for gi, n in enumerate(result["sample_sizes"]):
        for k, cnt in enumerate(hist[gi]):
            rows.append({"N": n, "k": str(k), "p": 100.0 * cnt / max(n_sims, 1)})
    return {
        "$schema": _SCHEMA,
        "description": "Exactly-k detection curves",
        "data": {"values": rows},
        "mark": {"type": "line", "point": True},
        "encoding": {
            "x": {"field": "N", "type": "quantitative", "title": "Sample size"},
            "y": {"field": "p", "type": "quantitative", "title": "P(exactly k) (%)"},
            "color": {"field": "k", "type": "nominal", "title": "k significant"},
        },
    }


def power_plot_set(result: Dict) -> Dict[str, Dict]:
    """The find_power plot bundle (the cross-port plot contract)."""
    out = {"power_bars": power_bars(result)}
    if result.get("alpha_correction", "none") != "none":
        out["power_bars_corrected"] = power_bars(result, corrected=True)
    return out


def sample_size_plot_set(result: Dict) -> Dict[str, Dict]:
    """The find_sample_size plot bundle."""
    out = {"power_curves": power_curves(result)}
    if "joint_corrected_rate" in result:
        out["joint_detection"] = joint_detection_curves(result)
        out["exactly_k"] = exactly_k_curves(result)
    return out


def to_html(spec: Dict, title: str = "MCPower plot") -> str:
    """Standalone vega-embed HTML page for one spec."""
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<script src="https://cdn.jsdelivr.net/npm/vega@5"></script>
<script src="https://cdn.jsdelivr.net/npm/vega-lite@5"></script>
<script src="https://cdn.jsdelivr.net/npm/vega-embed@6"></script>
</head><body><div id="vis"></div>
<script>vegaEmbed('#vis', {json.dumps(spec)});</script>
</body></html>"""
