"""Sparse-factor reduced refits + GLM separation fallback vs numpy oracles.

Reference semantics: a factor whose smallest realized cell count falls under
factor_min_level_count is dropped (with its interactions) and the model is
refit with reduced-df critical values (batch.rs:903-1013, 2418-2570); a GLM
fit that fails to converge (separation) is refit once without the sparsest
factor (batch.rs:1936-2020). Oracles below are written directly against the
statistical definitions (numpy lstsq / IRLS), independent of engine code.
"""

import numpy as np
from scipy import stats as sstats

import jax.numpy as jnp

from mcpower_tpu.engine import batch, datagen, lower


def _gen(spec, arrays, sim_id, seed=2137):
    X, y, ids = datagen.generate_batch(
        spec, arrays, jnp.uint32(seed), jnp.uint32(0),
        jnp.asarray([sim_id], dtype=jnp.uint32),
    )
    return np.asarray(X, np.float64)[0], np.asarray(y, np.float64)[0]


def test_ols_reduced_refit_matches_oracle():
    """Deterministic skewed factor at small N: engine t^2 equals a numpy
    reduced-refit oracle, tested at the reduced-df crit; dropped-factor
    targets never fire."""
    spec, arrays = lower.lower(
        grid=[40, 200],
        alpha=0.05,
        var_types=["normal"],
        factor_levels=[4],
        factor_props=[0.55, 0.25, 0.15, 0.05],
        effects=np.array([0.0, 0.5, 0.2, 0.1, 0.3]),
        target_cols=[1, 2],  # x1 and g[2]'s dummy
    )
    # rarest level at N=40: 2 rows (< 5) -> excluded at g=0 only
    assert "t2_unc_by_dropped" in arrays

    n_sims = 6
    cap = batch.run_batch_capture(spec, arrays, n_sims, 2137)
    assert bool(np.all(cap["factor_excluded"][:, 0, 0]))  # g=0: excluded
    assert not np.any(cap["factor_excluded"][:, 1, 0])  # g=1: kept

    for s in range(n_sims):
        X, y = _gen(spec, arrays, s)
        # g=0 oracle: reduced fit (drop the 3 dummy cols) on the first 40 rows
        Xr = X[:40][:, [0, 1]]
        yr = y[:40]
        beta, *_ = np.linalg.lstsq(Xr, yr, rcond=None)
        resid = yr - Xr @ beta
        df = 40 - 2
        sigma2 = resid @ resid / df
        covb = sigma2 * np.linalg.inv(Xr.T @ Xr)
        t2_x1 = beta[1] ** 2 / covb[1, 1]
        np.testing.assert_allclose(cap["t2"][s, 0, 0], t2_x1, rtol=1e-8)
        crit = sstats.t.ppf(1 - 0.025, df) ** 2
        assert bool(cap["sig_unc"][s, 0, 0]) == bool(t2_x1 > crit), s
        # the dropped factor's target can never fire at g=0
        assert cap["t2"][s, 0, 1] < 1e-12
        assert not cap["sig_unc"][s, 0, 1]

        # g=1 oracle: full fit on all 200 rows, full df
        Xf = X[:200]
        yf = y[:200]
        beta_f, *_ = np.linalg.lstsq(Xf, yf, rcond=None)
        resid_f = yf - Xf @ beta_f
        df_f = 200 - 5
        sigma2_f = resid_f @ resid_f / df_f
        covb_f = sigma2_f * np.linalg.inv(Xf.T @ Xf)
        t2_g2 = beta_f[2] ** 2 / covb_f[2, 2]
        np.testing.assert_allclose(cap["t2"][s, 1, 1], t2_g2, rtol=1e-8)


def _oracle_logit_irls(X, y, tol=1e-12, iters=200):
    beta = np.zeros(X.shape[1])
    for _ in range(iters):
        eta = X @ beta
        mu = np.clip(1 / (1 + np.exp(-eta)), 1e-10, 1 - 1e-10)
        w = mu * (1 - mu)
        z = eta + (y - mu) / w
        xtwx = X.T @ (w[:, None] * X)
        beta_new = np.linalg.solve(xtwx, X.T @ (w * z))
        if np.max(np.abs(beta_new - beta)) < tol:
            beta = beta_new
            break
        beta = beta_new
    cov = np.linalg.inv(xtwx)
    return beta, cov


def test_glm_separation_fallback_rescues_fit():
    """A factor cell that perfectly predicts y=1 separates the logit; the
    fallback refit (sparsest factor dropped) must rescue the sim and match a
    numpy oracle refit for the remaining target."""
    spec, arrays = lower.lower(
        grid=[100],
        var_types=["normal"],
        factor_levels=[4],
        factor_props=[0.55, 0.20, 0.15, 0.10],
        effects=np.array([-1.5, 0.5, 0.0, 0.0, 8.0]),
        target_cols=[1],
        outcome="binary",
        estimator="glm",
    )
    n_sims = 8
    cap = batch.run_batch_capture(spec, arrays, n_sims, 11)
    # cells are >= 10 rows: no sparse exclusion; separation does the damage
    assert not np.any(cap["factor_excluded"]), "exclusion must not mask this"
    n_fb = int(np.sum(cap["separation_fallback"][:, 0]))
    assert n_fb >= n_sims - 2, f"separation should hit most sims, got {n_fb}"
    assert np.all(cap["converged"][:, 0]), "fallback must rescue every sim"

    for s in range(n_sims):
        if not cap["separation_fallback"][s, 0]:
            continue
        X, y = _gen(spec, arrays, s, seed=11)  # same seed as the capture
        Xr = X[:100][:, [0, 1]]  # factor dropped by the fallback
        beta, cov = _oracle_logit_irls(Xr, y[:100])
        t2_x1 = beta[1] ** 2 / cov[1, 1]
        np.testing.assert_allclose(cap["t2"][s, 0, 0], t2_x1, rtol=1e-6)
        break
    else:
        raise AssertionError("no fallback sim found")


def test_separation_gate_bit_identical_to_fused():
    """The host-side separation gate (VERDICT r2 weak #3) must produce
    bit-identical counts to the always-fused two-pass program: cheap
    fallback-free pass + rescue dispatch for failed sims only."""
    spec, arrays = lower.lower(
        grid=[100],
        var_types=["normal"],
        factor_levels=[4],
        factor_props=[0.55, 0.20, 0.15, 0.10],
        effects=np.array([-1.5, 0.5, 0.0, 0.0, 8.0]),
        target_cols=[1],
        outcome="binary",
        estimator="glm",
    )
    assert batch._gate_applies(spec)
    gated = batch.run_batch(spec, arrays, 60, 11)
    assert gated["separation_fallback"][0] > 0  # rescue path exercised
    old = batch.SEPARATION_GATE
    batch.SEPARATION_GATE = False
    try:
        fused = batch.run_batch(spec, arrays, 60, 11)
    finally:
        batch.SEPARATION_GATE = old
    assert set(gated) == set(fused)
    for k in fused:
        np.testing.assert_array_equal(gated[k], fused[k], err_msg=k)


def test_glm_no_fallback_when_healthy():
    """A well-behaved factor logit never trips the fallback."""
    spec, arrays = lower.lower(
        grid=[300],
        var_types=["normal"],
        factor_levels=[3],
        factor_props=[1 / 3] * 3,
        effects=np.array([-0.5, 0.4, 0.3, 0.2]),
        target_cols=[1],
        outcome="binary",
        estimator="glm",
    )
    counts = batch.run_batch(spec, arrays, n_sims=200, base_seed=5)
    assert counts["separation_fallback"][0] == 0
    assert counts["converged"][0] == counts["n_done"]
