"""Batched, branch-free Nelder-Mead for small-dimension theta searches.

The reference drives its multi-parameter REML/Laplace objectives with BOBYQA
(serial, data-dependent iteration counts — crates.io bobyqa, used at
crates/engine-core/src/batch.rs). On TPU every lane must run in lockstep, so
this module provides the batched equivalent: a FIXED-iteration Nelder-Mead
whose reflect/expand/contract/shrink cases are all where-selects — identical
cost per lane per iteration, vmappable, differentiable-free.

Dimensions here are tiny (theta = vech chol of a q x q relative covariance,
q <= 4 => d <= 10), where Nelder-Mead is competitive with model-based
methods and needs no gradients of the log-det-heavy objective.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nelder_mead(f, x0, *, iters: int = 150, init_step=0.5, lower=None):
    """Minimize f: (d,) -> scalar from x0. Returns (x_best, f_best).

    ``lower``: optional (d,) elementwise lower bounds enforced by clipping
    every candidate (used for non-negative chol diagonals).
    """
    d = x0.shape[-1]
    dtype = x0.dtype

    def clip(x):
        return x if lower is None else jnp.maximum(x, lower)

    # initial simplex: x0 and x0 + step e_i
    verts = jnp.concatenate(
        [x0[None, :], x0[None, :] + init_step * jnp.eye(d, dtype=dtype)], axis=0
    )
    verts = clip(verts)
    fvals = jax.vmap(f)(verts)

    alpha, gamma, rho, sigma = 1.0, 2.0, 0.5, 0.5

    def body(_, carry):
        verts, fvals = carry
        order = jnp.argsort(fvals)
        verts = verts[order]
        fvals = fvals[order]
        best, worst, second = verts[0], verts[-1], fvals[-2]
        f_best, f_worst = fvals[0], fvals[-1]

        centroid = jnp.mean(verts[:-1], axis=0)
        xr = clip(centroid + alpha * (centroid - worst))
        fr = f(xr)

        xe = clip(centroid + gamma * (xr - centroid))
        fe = f(xe)
        # outside/inside contraction
        xc_out = clip(centroid + rho * (xr - centroid))
        fc_out = f(xc_out)
        xc_in = clip(centroid - rho * (centroid - worst))
        fc_in = f(xc_in)

        # case selection for the worst vertex's replacement
        use_expand = (fr < f_best) & (fe < fr)
        use_reflect = (fr < second) & ~use_expand | ((fr < f_best) & ~(fe < fr))
        use_cout = (~use_expand) & (~use_reflect) & (fr < f_worst) & (fc_out <= fr)
        use_cin = (~use_expand) & (~use_reflect) & ~(fr < f_worst) & (fc_in < f_worst)
        replaced = jnp.where(
            use_expand,
            xe,
            jnp.where(use_reflect, xr, jnp.where(use_cout, xc_out, xc_in)),
        )
        f_replaced = jnp.where(
            use_expand,
            fe,
            jnp.where(use_reflect, fr, jnp.where(use_cout, fc_out, fc_in)),
        )
        accept = use_expand | use_reflect | use_cout | use_cin

        # shrink all non-best vertices when nothing was accepted
        shrunk = clip(verts[0][None, :] + sigma * (verts - verts[0][None, :]))
        f_shrunk = jax.vmap(f)(shrunk)

        new_verts = jnp.where(
            accept,
            verts.at[-1].set(replaced),
            shrunk.at[0].set(verts[0]),
        )
        new_fvals = jnp.where(
            accept,
            fvals.at[-1].set(f_replaced),
            f_shrunk.at[0].set(fvals[0]),
        )
        return new_verts, new_fvals

    verts, fvals = jax.lax.fori_loop(0, iters, body, (verts, fvals))
    i_best = jnp.argmin(fvals)
    return verts[i_best], fvals[i_best]
