"""Driver: the two entry operations over an AppSpec document.

The GUI-host call surface (reference ``crates/engine-app-spec/src/driver.rs``
``run_find_power`` / ``run_find_sample_size``): accept one AppSpec JSON,
assemble, run, and return a plain-JSON payload — the host-neutral result
tree plus the Vega-Lite plot set — that a Tauri/WASM-style shell can render
without knowing any engine types. ``progress`` is the host's
``(done, total) -> keep_going`` callable (ProgressEmitter equivalent);
returning False cancels between dispatch chunks.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Callable, Dict, Optional

from .assemble import assemble
from .types import parse_app_spec


def _result_payload(
    result: Any,
    plots: Dict[str, Dict],
    part_meta: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    out = {"result": dict(result), "plots": plots, "summary": result.summary()}
    if part_meta is not None:
        out["part_meta"] = part_meta
    return out


def _spec_fingerprint(doc: Any) -> str:
    """Canonical-JSON hash of the raw AppSpec document — the identity the
    merge verb uses to refuse pooling parts built from different specs."""
    if isinstance(doc, bytes):
        doc = doc.decode("utf-8")
    if isinstance(doc, str):
        doc = json.loads(doc)
    blob = json.dumps(doc, sort_keys=True, separators=(",", ":"), default=str)
    return hashlib.sha256(blob.encode("utf-8")).hexdigest()[:16]


def _part_meta(a, doc, n_sims, sim_id_offset) -> Dict[str, Any]:
    return {
        "spec": _spec_fingerprint(doc),
        "seed": a.seed,
        "sim_offset": int(sim_id_offset),
        "n_sims": int(n_sims) if n_sims is not None else int(a.n_sims),
    }


def run_find_power(
    doc: Any,
    sample_size: int,
    *,
    n_sims: Optional[int] = None,
    sim_id_offset: int = 0,
    progress: Optional[Callable[[int, int], bool]] = None,
) -> Dict[str, Any]:
    """Power at one N for an AppSpec JSON document (str or dict).

    ``n_sims``/``sim_id_offset`` override the document's replicate count and
    start the global sim-id range at an offset — the worker-pool knobs a
    pooled host (browser fan-out, multi-process) uses to run disjoint
    ranges of one seed and merge the parts exactly (reference browser pool:
    ports/wasm/src/index.ts:55-80 + seeds.ts)."""
    a = assemble(parse_app_spec(doc))
    result = a.model.find_power(
        sample_size,
        target_test=a.target_test,
        correction=a.correction,
        wald_se=a.wald_se,
        agq=a.agq,
        test_formula=a.test_formula,
        n_sims=n_sims,
        sim_id_offset=sim_id_offset,
        scenarios=a.scenario_labels or False,
        progress_callback=progress,
        verbose=False,
    )
    return _result_payload(
        result, result.plots(), _part_meta(a, doc, n_sims, sim_id_offset)
    )


def run_find_sample_size(
    doc: Any,
    *,
    from_size: Optional[int] = None,
    to_size: Optional[int] = None,
    by: Any = None,
    n_sims: Optional[int] = None,
    sim_id_offset: int = 0,
    progress: Optional[Callable[[int, int], bool]] = None,
) -> Dict[str, Any]:
    """Smallest N reaching the spec's target power (CRN grid search)."""
    a = assemble(parse_app_spec(doc))
    result = a.model.find_sample_size(
        n_sims=n_sims,
        sim_id_offset=sim_id_offset,
        target_power=a.target_power,
        target_test=a.target_test,
        correction=a.correction,
        wald_se=a.wald_se,
        agq=a.agq,
        test_formula=a.test_formula,
        from_size=from_size,
        to_size=to_size,
        by=by,
        scenarios=a.scenario_labels or False,
        progress_callback=progress,
        verbose=False,
    )
    return _result_payload(
        result, result.plots(), _part_meta(a, doc, n_sims, sim_id_offset)
    )


def _validate_part_meta(parts) -> None:
    """Refuse statistically wrong pools: parts from different specs/seeds,
    or with overlapping sim-id ranges (which double-count draws — see
    merge_power_results). Parts without ``part_meta`` (bare result trees,
    payloads written before the echo existed) skip the check — additive
    evolution, same stance as the contract layer."""
    from .types import AppSpecError

    metas = [
        p.get("part_meta")
        if isinstance(p, dict) and "result" in p
        else None
        for p in parts
    ]
    known = [(i, m) for i, m in enumerate(metas) if isinstance(m, dict)]
    if len(known) < 2:
        return
    i0, m0 = known[0]
    for i, m in known[1:]:
        for key in ("spec", "seed"):
            if m.get(key) != m0.get(key):
                raise AppSpecError(
                    f"$.parts[{i}].part_meta.{key}",
                    f"{m.get(key)!r} differs from parts[{i0}] "
                    f"({m0.get(key)!r}) — parts must come from the same "
                    "document and seed to pool exactly",
                )
    ranges = sorted(
        (int(m["sim_offset"]), int(m["sim_offset"]) + int(m["n_sims"]), i)
        for i, m in known
        if "sim_offset" in m and "n_sims" in m
    )
    for (lo1, hi1, i1), (lo2, hi2, i2) in zip(ranges, ranges[1:]):
        if lo2 < hi1:
            raise AppSpecError(
                f"$.parts[{i2}].part_meta",
                f"sim-id range [{lo2}, {hi2}) overlaps parts[{i1}]'s "
                f"[{lo1}, {hi1}) — overlapping ranges double-count draws",
            )


def merge_run_payloads(parts: Any) -> Dict[str, Any]:
    """Pool worker-pool part payloads into one driver payload.

    ``parts`` are the payloads prior ``run_find_power``/``run_find_sample_size``
    calls returned (or just their ``result`` trees) for DISJOINT
    ``sim_id_offset`` ranges of the same document and seed. Counters pool
    exactly and every rate/CI/crossing output is re-derived, then the plot
    set and summary are regenerated from the merged tree — the main-thread
    merge step of the reference's browser worker pool
    (ports/wasm/src/index.ts main-thread ``merge_power_results`` →
    engine-orchestrator/src/merge.rs:26), host-neutral here so any shell
    (browser page, R, multiprocessing) can pool over plain JSON.
    """
    from ..orchestrator.merge import merge_power_results
    from ..output.results import wrap_result
    from .types import AppSpecError

    if not isinstance(parts, list) or not parts:
        raise AppSpecError("$.parts", "expected a non-empty list of payloads")
    _validate_part_meta(parts)
    results = [
        p["result"] if isinstance(p, dict) and "result" in p else p
        for p in parts
    ]
    for i, r in enumerate(results):
        if not isinstance(r, dict) or "result_kind" not in r:
            raise AppSpecError(
                f"$.parts[{i}]", "not a run payload (missing result_kind)"
            )
    base = results[0]
    for i, r in enumerate(results[1:], 1):
        if r["result_kind"] != base["result_kind"]:
            raise AppSpecError(
                f"$.parts[{i}]",
                f"result_kind {r['result_kind']!r} differs from parts[0] "
                f"({base['result_kind']!r}) — run and search parts cannot pool",
            )
    if "scenarios" in base:
        labels = list(base["scenarios"].keys())
        for i, r in enumerate(results[1:], 1):
            if list(r.get("scenarios", {}).keys()) != labels:
                raise AppSpecError(
                    f"$.parts[{i}]",
                    f"scenario labels differ from parts[0] ({labels})",
                )
        merged_sc = {
            lab: merge_power_results([r["scenarios"][lab] for r in results])
            for lab in labels
        }
        merged = {
            k: v for k, v in base.items() if k not in ("scenarios", "comparison")
        }
        merged["scenarios"] = merged_sc
        merged["comparison"] = {
            "labels": labels,
            "power_corrected_by_scenario": {
                lab: merged_sc[lab]["powers"]["corrected"] for lab in labels
            },
        }
    else:
        merged = merge_power_results(results)
    wrapped = wrap_result(merged, base["result_kind"])
    return _result_payload(wrapped, wrapped.plots())
