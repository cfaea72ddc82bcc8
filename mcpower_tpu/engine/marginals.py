"""Gaussian-copula marginal transforms, elementwise f32 (VPU path).

A correlated standard normal z is pushed through u = Phi(z) and then the
target marginal's quantile function, preserving the latent Gaussian
correlation structure (NORTA). Semantics and standardization constants follow
the reference's transform family (crates/engine-core/src/data_gen.rs:1106-1260):

* binary: 1 in the HIGH-z tail (u >= 1 - p) so every marginal is monotone
  increasing in the latent z; the column is 0/1, not centered.
* right/left skewed: tail-censored standardized Exp(1) — e = min(-ln Phi(-z),
  CAP), standardized by the censored moments so the variance is exactly 1
  (skew +/-1.90, support [-1, +6] SD).
* high kurtosis: standardized Student-t(3) quantile (variance 3 -> scale
  1/sqrt(3)), computed here by a seeded Newton inversion of the closed-form
  t3 CDF instead of the reference's 2048-knot lookup table — more accurate,
  and pure VPU arithmetic.
* uniform: unit-variance U(-sqrt(3), sqrt(3)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rng
from .spec import (
    DIST_BINARY,
    DIST_HIGH_KURTOSIS,
    DIST_LEFT_SKEWED,
    DIST_NORMAL,
    DIST_RIGHT_SKEWED,
    DIST_UNIFORM,
)

SQRT3 = 1.7320508075688772

# Censored-Exp(1) standardization constants. cap solves
# (cap - mean_c)/sd_c = 6 with mean_c = 1 - e^{-c},
# E[min(E,c)^2] = 2 - (2c+2)e^{-c}; mean/std derived from the cap so the
# censored marginal has exactly unit variance.
EXP_CAP = 6.95925599364711
EXP_CENSORED_MEAN = 0.9990501970288289
EXP_CENSORED_STD = 0.9933676327697134

_INV_SQRT3 = 1.0 / SQRT3
_PI = 3.141592653589793


def t3_cdf(t):
    """Student-t CDF with 3 df (closed form): x = t/sqrt(3),
    F = 1/2 + (x/(1+x^2) + atan(x)) / pi."""
    x = t * jnp.asarray(_INV_SQRT3, t.dtype)
    return 0.5 + (x / (1.0 + x * x) + jnp.arctan(x)) / jnp.asarray(_PI, t.dtype)


def t3_pdf(t):
    x2 = (t * t) / 3.0
    c = 2.0 / (_PI * SQRT3)
    d = 1.0 + x2
    return jnp.asarray(c, t.dtype) / (d * d)


def t3_ppf(u):
    """t(3) quantile by Newton on the closed-form CDF.

    Seed: central region uses the normal quantile inflated by the t
    correction; tails use the exact power-law tail inversion
    1 - F(t) ~ (2 sqrt(3)/pi) t^-3. Six Newton steps give ~f32-exact results
    over u in (1e-7, 1-1e-7).
    """
    u = jnp.asarray(u)
    dt = u.dtype
    z = rng.norm_ppf(u, dt)
    central = z * (1.0 + (z * z + 1.0) / 12.0)
    tail_mag = jnp.power(
        jnp.asarray(2.0 * SQRT3 / _PI, dt) / jnp.clip(jnp.minimum(u, 1.0 - u), 1e-30, 1.0),
        jnp.asarray(1.0 / 3.0, dt),
    )
    t = jnp.where(jnp.abs(z) > 2.2, jnp.sign(z) * tail_mag, central)
    for _ in range(6):
        err = t3_cdf(t) - u
        t = t - err / jnp.maximum(t3_pdf(t), jnp.asarray(1e-30, dt))
    return t


def apply_marginal(z, code, param):
    """Transform a latent-normal column by marginal ``code`` (traced int).

    ``z``: f32 array. ``code``: scalar int (may be traced under scenario
    distribution swaps). ``param``: scalar f32 (binary p). All candidate
    transforms are computed and selected — branch-free VPU work, the XLA-native
    replacement for the reference's per-column enum dispatch.
    """
    z = jnp.asarray(z, jnp.float32)
    u = rng.norm_cdf(z)
    cap = jnp.float32(EXP_CAP)
    m = jnp.float32(EXP_CENSORED_MEAN)
    s = jnp.float32(EXP_CENSORED_STD)

    binary = jnp.where(u >= 1.0 - param, jnp.float32(1.0), jnp.float32(0.0))
    # -ln(Phi(-z)) = -ln(1 - u); compute Phi(-z) directly for tail accuracy.
    e_right = jnp.minimum(-jnp.log(jnp.maximum(rng.norm_cdf(-z), jnp.float32(1e-30))), cap)
    right = (e_right - m) / s
    e_left = jnp.minimum(-jnp.log(jnp.maximum(u, jnp.float32(1e-30))), cap)
    left = (m - e_left) / s
    kurt = t3_ppf(jnp.clip(u, 1e-7, 1.0 - 1e-7)) * jnp.float32(_INV_SQRT3)
    unif = (2.0 * u - 1.0) * jnp.float32(SQRT3)

    return jnp.select(
        [
            code == DIST_NORMAL,
            code == DIST_BINARY,
            code == DIST_RIGHT_SKEWED,
            code == DIST_LEFT_SKEWED,
            code == DIST_HIGH_KURTOSIS,
            code == DIST_UNIFORM,
        ],
        [z, binary, right, left, kurt, unif],
        default=z,
    )


def apply_marginal_static(z, code: int, param):
    """Static-code fast path: only the selected transform is traced."""
    z = jnp.asarray(z, jnp.float32)
    if code == DIST_NORMAL:
        return z
    if code == DIST_BINARY:
        u = rng.norm_cdf(z)
        return jnp.where(u >= 1.0 - param, jnp.float32(1.0), jnp.float32(0.0))
    if code == DIST_RIGHT_SKEWED:
        e = jnp.minimum(
            -jnp.log(jnp.maximum(rng.norm_cdf(-z), jnp.float32(1e-30))),
            jnp.float32(EXP_CAP),
        )
        return (e - jnp.float32(EXP_CENSORED_MEAN)) / jnp.float32(EXP_CENSORED_STD)
    if code == DIST_LEFT_SKEWED:
        u = rng.norm_cdf(z)
        e = jnp.minimum(-jnp.log(jnp.maximum(u, jnp.float32(1e-30))), jnp.float32(EXP_CAP))
        return (jnp.float32(EXP_CENSORED_MEAN) - e) / jnp.float32(EXP_CENSORED_STD)
    if code == DIST_HIGH_KURTOSIS:
        u = rng.norm_cdf(z)
        return t3_ppf(jnp.clip(u, 1e-7, 1.0 - 1e-7)) * jnp.float32(_INV_SQRT3)
    if code == DIST_UNIFORM:
        u = rng.norm_cdf(z)
        return (2.0 * u - 1.0) * jnp.float32(SQRT3)
    raise ValueError(f"unknown static marginal code {code}")
