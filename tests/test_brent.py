"""Safeguarded-parabolic (Brent) minimizer: convergence stress family.

The variance searches (`mixedfit.mixed_grid_stats`,
`glmmfit._intercept_glmm_grid_stats`) ride `_brent_minimize`; these tests
pin its convergence independently of any engine surface — analytic argmins
or a high-precision scipy bounded-Brent oracle, across curve shapes the
REML/Laplace deviances take (parabolic interior optima, skewed smooth
curves, boundary-monotone singular cases), vmapped so the branch-free
lane arithmetic is exercised exactly as the engine uses it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize_scalar

from mcpower_tpu.engine.mixedfit import (
    BRENT_ITERS,
    _brent_minimize,
    _golden_minimize,
)
from mcpower_tpu.engine.glmmfit import BRENT_ITERS_GLMM

LO, HI = -14.0, 7.0


def _run(f, cs, iters):
    def one(c):
        xb, _, _ = _brent_minimize(
            LO, HI, (), ((iters, lambda x, aux: (f(x, c), aux)),)
        )
        return xb

    return np.asarray(jax.vmap(one)(jnp.asarray(cs, jnp.float64)))


def _oracle(f, c):
    r = minimize_scalar(
        lambda x: float(f(jnp.float64(x), c)),
        bounds=(LO, HI),
        method="bounded",
        options={"xatol": 1e-12},
    )
    return r.x


CS = np.linspace(-13.5, 6.5, 41)


def test_quadratic_interior_optima_to_machine_precision():
    f = lambda x, c: (x - c) ** 2
    err = np.abs(_run(f, CS, BRENT_ITERS) - CS)
    assert err.max() < 1e-9


def test_smooth_skewed_curves_inside_parity_band():
    # exp-skewed and REML-shaped (logdet + df*log(rss)) smooth curves:
    # these are the surfaces the LMM/GLMM searches actually minimize.
    fams = [
        lambda x, c: jnp.exp(0.25 * x) + (x - c) ** 2,
        lambda x, c: 3.0 * jnp.log1p(jnp.exp(x) * 5.0)
        + 100.0 * jnp.log1p((x - c) ** 2 / 50.0),
    ]
    for f in fams:
        xs = np.array([_oracle(f, c) for c in CS])
        err = np.abs(_run(f, CS, BRENT_ITERS) - xs)
        assert err.max() < 1e-6, err.max()
        # The GLMM budget (fewer iterations, noisier objective there)
        # still positions smooth optima far inside the 1e-3 tau^2 band.
        err14 = np.abs(_run(f, CS, BRENT_ITERS_GLMM) - xs)
        assert err14.max() < 1e-6, err14.max()


def test_boundary_monotone_lanes_reach_the_wall_region():
    # Monotone deviances = singular fits; the engine re-decides these with
    # an explicit boundary probe, so the search only needs to land NEAR
    # the wall (golden-rate fallback), not position it precisely.
    up = _run(lambda x, c: x + 0.0 * c, CS[:3], BRENT_ITERS)
    dn = _run(lambda x, c: -x + 0.0 * c, CS[:3], BRENT_ITERS)
    assert np.all(up < LO + 0.01)
    assert np.all(dn > HI - 0.01)


def test_mixed_lane_batch_converges_per_lane():
    # One vmapped batch mixing interior and boundary lanes — the engine's
    # actual regime; each lane must take its own step sequence.
    cs = np.array([-10.0, -2.0, 0.5, 6.0])

    def f(x, c):
        return jnp.where(c > 5.0, -x, (x - c) ** 2)

    got = _run(f, cs, BRENT_ITERS)
    assert np.abs(got[:3] - cs[:3]).max() < 1e-8
    assert got[3] > HI - 0.01


def test_warm_carry_thread_passes_through():
    # The aux thread must carry state between evaluations in order
    # (the GLMM (beta, u) warm start rides it).
    def ev(x, count):
        return (x - 1.0) ** 2, count + 1

    xb, fb, count = _brent_minimize(LO, HI, 0, ((12, ev),))
    # init_eval defaults to the first phase's evaluator, so the cold
    # start also threads aux: 1 init + 12 loop evaluations.
    assert int(count) == 13
    assert abs(float(xb) - 1.0) < 1e-8


def test_phased_budgets_run_in_sequence():
    log = []

    def mk(tag):
        def ev(x, aux):
            log.append(tag)
            return (x - 1.0) ** 2, aux

        return ev

    # Python closures run at trace time; use concrete (non-jit) execution
    # via tiny iteration counts and disable_jit to observe ordering.
    with jax.disable_jit():
        _brent_minimize(LO, HI, (), ((3, mk("full")), (4, mk("warm"))))
    assert log == ["full"] * 4 + ["warm"] * 4  # init + 3 full, then 4 warm


def test_matches_golden_section_optimum_on_engine_shaped_curve():
    # Same surface, both searches: optima must agree inside the parity
    # band golden section was budgeted for.
    def f(x, c):
        return 3.0 * jnp.log1p(jnp.exp(x) * 5.0) + 80.0 * jnp.log1p(
            (x - c) ** 2 / 20.0
        )

    for c in (-6.0, -1.0, 2.5):
        xg = float(_golden_minimize(lambda x: f(x, c), LO, HI, 36))
        xb = float(
            _brent_minimize(
                LO, HI, (), ((BRENT_ITERS, lambda x, aux: (f(x, c), aux)),)
            )[0]
        )
        assert abs(xb - xg) < 1e-5
