"""Warm-carry Nelder-Mead (`optim.nelder_mead_carry`): optimizer-level pins.

The GLMM slope path's theta search rides this variant (engine/glmmfit.py
`_slope_glmm_grid_stats`); these tests pin its behavior independently of
any engine surface, on synthetic objectives whose evaluation is itself an
iterative solver — the regime the carry exists for: f(x, aux, budget)
runs `budget` inner steps from the carried aux and returns the objective
at the resulting state, exactly like a PIRLS chain under a theta
candidate (reference optimizer role: bobyqa crate via glmm `fit_on`,
/root/reference/crates/engine-core/src/batch.rs:1969).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mcpower_tpu.engine import optim


def test_plain_quadratic_matches_uncarried_nm():
    """With a budget-independent objective the carry variant must land
    where the plain batched NM lands (same candidate-selection logic)."""
    target = jnp.asarray([1.3, -0.7, 0.4], jnp.float64)

    def f_plain(x):
        return jnp.sum((x - target) ** 2)

    def f_carry(x, aux, budget):
        return jnp.sum((x - target) ** 2), aux

    x0 = jnp.zeros(3, jnp.float64)
    xa, fa = optim.nelder_mead(f_plain, x0, iters=120, init_step=0.5)
    xb, fb, _ = optim.nelder_mead_carry(
        f_carry, x0, jnp.float64(0.0), phases=((120, 1),), init_step=0.5
    )
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=1e-12)
    assert float(fa) == float(fb)


def test_inner_solver_objective_converges_with_phased_budgets():
    """Objective with a genuine inner solve: f(x) = min_z g(x, z) where the
    inner minimizer is reached by gradient steps on z from the carried
    state. The two-phase schedule (full budget while the simplex is wide,
    short re-convergence after) must still recover argmin_x of the
    *fully-solved* profile objective g(x, z*(x)) = (x-t)^2."""
    t = jnp.asarray([0.8, -1.1], jnp.float64)

    def g(x, z):
        # inner quadratic in z, coupled to x; z*(x) = 2x, profile = |x-t|^2
        return jnp.sum((x - t) ** 2) + jnp.sum((z - 2.0 * x) ** 2)

    def f(x, z, budget):
        def step(_, z):
            return z - 0.4 * 2.0 * (z - 2.0 * x)  # grad step, rate<1 stable

        z = jax.lax.fori_loop(0, budget, step, z)
        return g(x, z), z

    x0 = jnp.zeros(2, jnp.float64)
    z0 = jnp.zeros(2, jnp.float64)
    xb, fb, z_fin = optim.nelder_mead_carry(
        f, x0, z0, phases=((25, 12), (95, 3)), init_step=0.5
    )
    np.testing.assert_allclose(np.asarray(xb), np.asarray(t), atol=1e-5)
    # carried inner state tracked the accepted candidates' solves
    np.testing.assert_allclose(
        np.asarray(z_fin), 2.0 * np.asarray(t), atol=1e-3
    )


def test_lower_bound_clipping_pins_to_wall():
    """Boundary-monotone lanes (singular-fit analogue): with the optimum
    outside the box, the clipped search must sit on the lower wall for the
    bounded coordinates — the behavior the slope path's chol-diagonal >= 0
    bounds rely on for boundary pinning."""
    lower = jnp.asarray([0.0, -jnp.inf], jnp.float64)
    target = jnp.asarray([-2.0, 0.5], jnp.float64)  # coord 0 infeasible

    def f(x, aux, budget):
        return jnp.sum((x - target) ** 2), aux

    x0 = jnp.asarray([1.0, 0.0], jnp.float64)
    xb, _, _ = optim.nelder_mead_carry(
        f, x0, jnp.float64(0.0), phases=((150, 1),), init_step=0.3,
        lower=lower,
    )
    assert abs(float(xb[0]) - 0.0) < 1e-6, np.asarray(xb)
    assert abs(float(xb[1]) - 0.5) < 1e-6, np.asarray(xb)


def test_vmapped_over_lanes_like_the_engine():
    """The engine vmaps the whole search over (sim, grid) lanes; distinct
    lanes must converge to their own optima with no cross-lane coupling."""
    targets = jnp.asarray(
        np.linspace(-1.5, 1.5, 8)[:, None] * np.ones((8, 2)), jnp.float64
    )

    def solve(t):
        def f(x, aux, budget):
            return jnp.sum((x - t) ** 2), aux

        xb, _, _ = optim.nelder_mead_carry(
            f, jnp.zeros(2, jnp.float64), jnp.float64(0.0),
            phases=((120, 1),), init_step=0.5,
        )
        return xb

    got = np.asarray(jax.vmap(solve)(targets))
    np.testing.assert_allclose(got, np.asarray(targets), atol=1e-8)


def test_improving_reflection_never_discarded():
    """Selection invariant (shared by both NM variants via
    _select_candidate): whenever the reflection strictly improves on the
    worst vertex, the accepted replacement's f is <= fr — a free, already
    evaluated improvement is never traded for a possibly-worse inside
    contraction. Property-checked over randomized orderings, plus the
    exact regression case (fr between second and worst, fc_out > fr,
    fc_in > f_worst) where the superseded variant accepted a point worse
    than the whole simplex."""
    rng = np.random.default_rng(7)

    def accepted_f(f_best, second, f_worst, fr, fe, fc_out, fc_in):
        idx = int(
            optim._select_candidate(
                *(jnp.float64(v) for v in (f_best, second, f_worst, fr, fe, fc_out, fc_in))
            )
        )
        return (fr, fe, fc_out, fc_in)[idx]

    # the exact regression case
    got = accepted_f(0.0, 1.0, 10.0, 5.0, 99.0, 7.0, 20.0)
    assert got == 5.0  # keeps xr; the old variant returned fc_in = 20

    # property: fr < f_worst  =>  accepted f <= fr
    for _ in range(500):
        f_best, second, f_worst = np.sort(rng.normal(size=3))
        fr = rng.normal()
        fe, fc_out, fc_in = rng.normal(size=3)
        acc = accepted_f(f_best, second, f_worst, fr, fe, fc_out, fc_in)
        if fr < f_worst:
            assert acc <= fr, (f_best, second, f_worst, fr, fe, fc_out, fc_in)
        # and the incumbent best is never displaced by construction
        # (only the worst vertex is replaced) — nothing to check here
