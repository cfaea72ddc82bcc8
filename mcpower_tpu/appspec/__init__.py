"""App-spec layer: the JSON state model GUI hosts drive the engine with.

The reference dedicates a crate to this (``crates/engine-app-spec``): a
tagged ``AppSpec`` enum (Linear/Logit/Mixed/Poisson families,
``src/app_spec.rs:46-52``), an assembler that lowers GUI state to the
spec-builder's input (``src/assemble.rs``), and a driver exposing the two
entry operations plus plots/progress (``src/driver.rs``). Desktop (Tauri)
and browser (WASM) hosts speak ONLY this JSON shape — they never touch the
contract directly.

This package is the same boundary for the TPU rebuild: a GUI host posts one
JSON document and gets back the host-neutral result tree + Vega-Lite plot
set. Parsing is additive-evolution (unknown fields ignored, absent fields
default) exactly like the reference's serde defaults, so old payloads keep
deserializing.
"""

from .types import AppSpecError, parse_app_spec
from .driver import run_find_power, run_find_sample_size

__all__ = [
    "AppSpecError",
    "parse_app_spec",
    "run_find_power",
    "run_find_sample_size",
]
