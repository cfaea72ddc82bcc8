"""Unit tests for the smallchol kernels.

The scalar unroll (`chol`/`cho_solve`) is pinned indirectly by every golden
engine test; these tests cover the vectorized-row twins the joint-Z
capacitance path uses (`chol_vec`/`cho_solve_vec`/`cho_solve_mat_vec`) —
added after the scalar unroll's O(p^3) program size at M ~ 30 OOM-killed
the TPU compile helper (round 3). Twins must agree with the scalar forms
to rounding and with an independent NumPy factorization.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mcpower_tpu.engine import smallchol


def _spd(rng, p, batch=()):
    A = rng.standard_normal(batch + (p, p))
    return A @ np.swapaxes(A, -1, -2) + p * np.eye(p)


@pytest.mark.parametrize("p", [2, 5, 12, 30])
def test_chol_vec_matches_numpy(p):
    rng = np.random.default_rng(7)
    A = _spd(rng, p)
    L = np.asarray(smallchol.chol_vec(jnp.asarray(A)))
    np.testing.assert_allclose(L, np.linalg.cholesky(A), rtol=1e-10, atol=1e-10)
    # strictly lower-triangular output (no stray upper entries)
    assert np.all(np.triu(L, 1) == 0.0)


def test_chol_vec_matches_scalar_unroll_batched():
    rng = np.random.default_rng(11)
    A = jnp.asarray(_spd(rng, 9, batch=(4, 3)))
    np.testing.assert_allclose(
        np.asarray(smallchol.chol_vec(A)),
        np.asarray(smallchol.chol(A)),
        rtol=1e-12,
        atol=1e-12,
    )


@pytest.mark.parametrize("p", [3, 30])
def test_cho_solve_vec_matches_numpy(p):
    rng = np.random.default_rng(3)
    A = _spd(rng, p)
    b = rng.standard_normal(p)
    L = smallchol.chol_vec(jnp.asarray(A))
    x = np.asarray(smallchol.cho_solve_vec(L, jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-9, atol=1e-10)


def test_cho_solve_mat_vec_matches_columnwise():
    rng = np.random.default_rng(5)
    A = _spd(rng, 25)
    B = rng.standard_normal((25, 4))
    L = smallchol.chol_vec(jnp.asarray(A))
    X = np.asarray(smallchol.cho_solve_mat_vec(L, jnp.asarray(B)))
    np.testing.assert_allclose(X, np.linalg.solve(A, B), rtol=1e-9, atol=1e-10)
    # column-at-a-time through the vector solve gives the same answer
    cols = np.stack(
        [
            np.asarray(smallchol.cho_solve_vec(L, jnp.asarray(B[:, j])))
            for j in range(4)
        ],
        axis=-1,
    )
    np.testing.assert_allclose(X, cols, rtol=1e-12, atol=1e-12)


def test_vec_twins_batched_leading_dims():
    rng = np.random.default_rng(13)
    A = _spd(rng, 14, batch=(6,))
    b = rng.standard_normal((6, 14))
    L = smallchol.chol_vec(jnp.asarray(A))
    x = np.asarray(smallchol.cho_solve_vec(L, jnp.asarray(b)))
    want = np.stack([np.linalg.solve(A[i], b[i]) for i in range(6)])
    np.testing.assert_allclose(x, want, rtol=1e-9, atol=1e-10)


def test_chol_vec_failure_is_detectable():
    """Non-PSD input produces NaNs the callers' finiteness checks catch."""
    A = jnp.asarray(-np.eye(10))
    L = smallchol.chol_vec(A)
    assert not bool(smallchol.chol_ok(L))


def test_wide_p_autoroutes_to_vec_and_stays_correct():
    """chol/cho_solve at p >= VEC_FROM_P route to the vectorized form (the
    scalar unroll's O(p^3) program size is the compile-size cliff a wide
    user design would otherwise hit) and still match NumPy."""
    rng = np.random.default_rng(17)
    p = smallchol.VEC_FROM_P + 3
    A = _spd(rng, p)
    b = rng.standard_normal(p)
    L = smallchol.chol(jnp.asarray(A))
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(A), rtol=1e-10, atol=1e-10
    )
    x = np.asarray(smallchol.cho_solve(L, jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-9, atol=1e-10)
