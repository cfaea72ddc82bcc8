"""mcpower_tpu — TPU-native Monte Carlo statistical power analysis.

A ground-up JAX/XLA rebuild of the capabilities of MCPower
(github.com/pawlenartowicz/MCPower): simulation-based power for OLS, GLM
(logit/probit/Poisson), and mixed-effects designs; sample-size search over a
common-random-numbers grid; multiple-testing corrections; joint and post-hoc
power; robustness scenarios; pilot-data-driven generation.

Where the reference runs a Rust engine over CPU threads, this package compiles
the whole design -> data-generation -> solver -> power pipeline into jitted,
vmapped XLA programs: every simulation replicate is one lane of a batched
tensor program, sample-size grids ride prefix-nested sufficient statistics,
and multi-chip scaling is a `shard_map` over the sim axis with a single psum.
"""

import jax as _jax

# Fit-path parity with the reference's f64 solvers (OLS beta rel <= 1e-11,
# REML variance components rel <= 1e-3 — see BASELINE.md) requires float64.
# Data generation explicitly requests f32/uint32 everywhere, so enabling x64
# does not slow the hot generation path. TPUs execute f64 via emulation; the
# per-sim design matrices are small, so the fit cost stays negligible next to
# generation bandwidth.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
__all__ = ["MCPower", "mtcars", "__version__"]


def __getattr__(name):
    # Lazy import keeps `import mcpower_tpu.engine.rng` usable while the
    # user-facing model layer is under construction / to avoid pulling the
    # full stack for kernel-only users.
    if name == "MCPower":
        from .model import MCPower

        return MCPower
    if name == "mtcars":
        from .datasets import mtcars

        return mtcars
    raise AttributeError(name)
