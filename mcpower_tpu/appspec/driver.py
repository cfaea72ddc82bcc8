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

from typing import Any, Callable, Dict, Optional

from .assemble import assemble
from .types import parse_app_spec


def _result_payload(result: Any, plots: Dict[str, Dict]) -> Dict[str, Any]:
    return {"result": dict(result), "plots": plots, "summary": result.summary()}


def run_find_power(
    doc: Any,
    sample_size: int,
    *,
    progress: Optional[Callable[[int, int], bool]] = None,
) -> Dict[str, Any]:
    """Power at one N for an AppSpec JSON document (str or dict)."""
    a = assemble(parse_app_spec(doc))
    result = a.model.find_power(
        sample_size,
        target_test=a.target_test,
        correction=a.correction,
        wald_se=a.wald_se,
        agq=a.agq,
        test_formula=a.test_formula,
        scenarios=a.scenario_labels or False,
        progress_callback=progress,
        verbose=False,
    )
    return _result_payload(result, result.plots())


def run_find_sample_size(
    doc: Any,
    *,
    from_size: Optional[int] = None,
    to_size: Optional[int] = None,
    by: Any = None,
    progress: Optional[Callable[[int, int], bool]] = None,
) -> Dict[str, Any]:
    """Smallest N reaching the spec's target power (CRN grid search)."""
    a = assemble(parse_app_spec(doc))
    result = a.model.find_sample_size(
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
    return _result_payload(result, result.plots())
