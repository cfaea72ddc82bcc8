"""Per-sim dataset synthesis — the generation half of the hot path.

One call builds the full design plane ``X (max_n, P) f32`` and outcome
``y (max_n,) f32`` for a single simulation; :mod:`mcpower_tpu.engine.batch`
vmaps it over the sim axis so the whole batch generates as one fused XLA
program (planar Philox fills -> Cholesky mix as a matmul -> elementwise
marginal sweeps -> outcome assembly; XLA fuses the elementwise stages into the
surrounding ops, the TPU-native analogue of the reference's hand-scheduled
SIMD column passes in crates/engine-core/src/data_gen.rs).

Row ``i`` of every column is a pure function of ``(seed, sim, class, column,
row)`` (see :mod:`.rng`), so ``X[:N]`` is a nested prefix across the sample
size grid — the common-random-numbers invariant the sample-size search rides.

Feature semantics mirror the reference generator (data_gen.rs):
scenario design draws (correlation noise + PSD repair, distribution/residual
swaps, ICC jitter) at data_gen.rs:990; per-study heterogeneity beta-jitter
with sign clipping at data_gen.rs:700-760; renormalized-multiplicative
heteroskedasticity Var(eps_i) = sigma^2 exp(gamma z_i)/exp(gamma^2/2),
gamma = ln(lambda)/4 at data_gen.rs:694-712; cluster REs (intercept + slopes
via chol(D)) at data_gen.rs:142-260; outcome assembly (logit sigmoid-uniform,
probit latent threshold, Poisson fixed-draw inverse CDF) at data_gen.rs:836-900.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import marginals, rng
from .spec import (
    DIST_CODES,
    RESID_HIGH_KURTOSIS,
    RESID_LEFT_SKEWED,
    RESID_NORMAL,
    RESID_RIGHT_SKEWED,
    RESID_UNIFORM,
    ScenarioStatic,
    SimSpec,
)

FLOAT_NEAR_ZERO = 1e-12

# Scenario-stream column ids (CLASS_SCENARIO).
_SC_CORR = 0
_SC_VARSWAP_U = 1
_SC_VARSWAP_PICK = 2
_SC_RESID_U = 3
_SC_RESID_PICK = 4
_SC_ICC = 5

# ---------------------------------------------------------------------------
# Host-side helpers (run once per lowering, not per sim)
# ---------------------------------------------------------------------------


def fixed_allocation_codes(probs, n: int) -> np.ndarray:
    """Deterministic largest-remainder factor assignment for rows 0..n-1.

    Row ``i`` gets the level with the largest running deficit
    ``p_g*(i+1) - counts_g``, ties to the lowest level index — consumes no
    RNG and is prefix-stable, so factor cells hit their exact Hamilton counts
    at every grid prefix (reference: data_gen.rs:943 ``fixed_level_next``).
    Runs on host because it depends only on (probs, row), never on the sim.
    """
    from .. import native

    fast = native.fixed_alloc(probs, n)
    if fast is not None:
        return fast
    p = np.asarray(probs, dtype=np.float64)
    total = p.sum()
    p = p / total if total > 0 else np.full_like(p, 1.0 / len(p))
    counts = np.zeros(len(p), dtype=np.int64)
    out = np.empty(n, dtype=np.int32)
    for i in range(n):
        deficit = p * (i + 1) - counts
        g = int(np.argmax(deficit))
        out[i] = g
        counts[g] += 1
    return out


def fixed_allocation_counts(probs, n: int) -> np.ndarray:
    """Level counts after n rows of the deterministic walk."""
    codes = fixed_allocation_codes(probs, n)
    return np.bincount(codes, minlength=len(np.asarray(probs))).astype(np.int64)


# ---------------------------------------------------------------------------
# Device-side building blocks
# ---------------------------------------------------------------------------


def _cluster_ids(spec: SimSpec) -> jnp.ndarray:
    """Primary-grouping cluster id per row (pure iota math, no RNG)."""
    rows = jnp.arange(spec.max_n, dtype=jnp.int32)
    c = spec.cluster
    if c is None:
        return jnp.zeros(spec.max_n, dtype=jnp.int32)
    if c.sizing_mode == "fixed_clusters":
        return rows % jnp.int32(max(c.sizing_value, 1))
    return rows // jnp.int32(max(c.sizing_value, 1))


def _rep_rows(spec: SimSpec) -> jnp.ndarray:
    """Representative (first-seen) row of each row's cluster, for
    cluster-level predictor broadcast."""
    rows = jnp.arange(spec.max_n, dtype=jnp.int32)
    c = spec.cluster
    if c.sizing_mode == "fixed_clusters":
        return rows % jnp.int32(max(c.sizing_value, 1))
    s = jnp.int32(max(c.sizing_value, 1))
    return rows - rows % s


def extra_grouping_ids(spec: SimSpec, g: int):
    """Level id per row for extra grouping ``g`` + its level count.

    Pure iota math shared by generation and the mixed-model fit (the two
    MUST agree or the fitted variance structure silently mismatches the
    DGP). Implements the reference's LEXICOGRAPHIC stride chain
    (generation.rs:402-427 ``extra_level_of_row``): each atom block
    enumerates every (primary, level_1, ..., level_G) combination exactly
    once, so factors are balanced at atom multiples, assignment rules never
    alias across groupings, and prefix-nesting holds.

    FixedClusters: stride_g = S * prod(block_levels of earlier groupings);
    within = (i / stride_g) % block_levels_g; crossed -> within, nested ->
    (i % S) * n_per_parent + within. FixedSize (nested only):
    (i / cs) * np + (i % cs) % np.
    """
    c = spec.cluster
    eg = c.extra_groupings[g]
    rows = jnp.arange(spec.max_n, dtype=jnp.int32)
    blk = max(eg.n_levels, 1)  # crossed: level count; nested: per-parent
    if c.sizing_mode == "fixed_size":
        if eg.relation == "crossed":
            raise ValueError(
                "crossed extra groupings require fixed_clusters sizing "
                "(reference validate: Crossed x FixedSize is rejected)"
            )
        cs = max(c.sizing_value, 1)
        n_lv = c.n_clusters_at(spec.max_n) * blk
        return (rows // cs) * blk + (rows % cs) % blk, n_lv
    s = max(c.sizing_value, 1)
    stride = s
    for h in c.extra_groupings[:g]:
        stride *= max(h.n_levels, 1)
    within = (rows // jnp.int32(stride)) % jnp.int32(blk)
    if eg.relation == "crossed":
        return within, blk
    return (rows % jnp.int32(s)) * jnp.int32(blk) + within, s * blk


def _psd_repair_chol(sigma):
    """Spectral-clip PSD repair (eigenvalue floor 1e-10) + Cholesky.

    Mirrors crates/engine-core/src/correlation.rs:82 ``psd_repair_and_factor``.
    Always runs the repair (branch-free); for an already-PSD matrix the clip
    is a no-op up to eigensolver roundoff.
    """
    w, v = jnp.linalg.eigh(sigma)
    w = jnp.maximum(w, 1e-10)
    repaired = (v * w[None, :]) @ v.T
    return jnp.linalg.cholesky(repaired)


def _unit_residual_draws(
    key, column_base: int, n: int, dist_code, df: float, row_offset: int = 0
):
    """Unit-variance residual-family draws, selectable at runtime.

    Draw budget is static: slot 0 = z/u, slots 1..df_int = chi-square
    accumulator normals (all addressed, so unused candidates cost only
    arithmetic, not stream divergence). ``dist_code`` may be traced (scenario
    residual swap). df semantics follow data_gen.rs:430-505: t(df) scaled by
    sqrt((df-2)/df), chi2(df) centered/scaled by 1/sqrt(2 df), LeftSkewed
    sign-flipped, uniform U(-sqrt3, sqrt3).
    """
    w0 = rng.fill_raw(key, rng.CLASS_RESID, column_base, row_offset, row_offset + n)
    u = rng.u32_to_open_uniform(w0)
    z = rng.norm_ppf_f32(u)

    df = max(float(df), 3.0)
    df_int = max(int(round(df)), 1)
    chi2 = jnp.zeros(n, dtype=jnp.float32)
    for s in range(df_int):
        g = rng.normal_fill(
            key, rng.CLASS_RESID, column_base + 1 + s, row_offset, row_offset + n
        )
        chi2 = chi2 + g * g

    t_scale = jnp.float32(1.0 / np.sqrt(df / (df - 2.0)))
    denom = jnp.sqrt(chi2 / jnp.float32(df))
    t_draw = jnp.where(denom > 0, z / denom, z) * t_scale
    chi_scale = jnp.float32(1.0 / np.sqrt(2.0 * df))
    chi_centered = (chi2 - jnp.float32(df)) * chi_scale
    unif = (2.0 * rng.u32_to_uniform(w0) - 1.0) * jnp.float32(marginals.SQRT3)

    return jnp.select(
        [
            dist_code == RESID_NORMAL,
            dist_code == RESID_RIGHT_SKEWED,
            dist_code == RESID_LEFT_SKEWED,
            dist_code == RESID_HIGH_KURTOSIS,
            dist_code == RESID_UNIFORM,
        ],
        [z, chi_centered, -chi_centered, t_draw, unif],
        default=z,
    )


def _poisson_quantile(u, z, lam):
    """Fixed-draw Poisson inverse CDF at uniform u (z = norm_ppf(u)).

    lambda <= 20: cumulative-PMF walk, early-exited once every lane's CDF
    has crossed its u (typical lambdas converge in ~10-30 terms; the walk
    is latency-bound sequential vector steps, so exiting early is a
    direct wall-clock cut — iterations past the crossing point never
    change y, so the result is identical to the full 200-step walk).
    Above: normal approximation floor(lambda + z sqrt(lambda) + 0.5).
    Mirrors crates/engine-core/src/rng.rs:399.
    """
    # f64 walk accumulators, as the reference's (rng.rs poisson_quantile
    # takes f64): an f32 CDF sum can plateau a few ULPs below 1.0 and
    # *under* a near-1 u, which would ride y to the step cap instead of
    # the quantile; the f64 sum always crosses any f32-representable
    # u < 1.
    u = jnp.asarray(u, jnp.float64)
    lam64 = jnp.asarray(lam, jnp.float64)
    lam = jnp.asarray(lam, jnp.float32)

    p0 = jnp.exp(-lam64)

    # lanes with lam > 20 take the normal branch below — their CDFs may
    # never cross u within the cap (exp(-lam) underflows past ~746), so
    # they must not keep the early-exit loop alive
    walk_lane = lam64 <= 20.0

    def cond(carry):
        k, p, cdf, y = carry
        return (k < 200) & jnp.any((cdf < u) & walk_lane)

    def body(carry):
        k, p, cdf, y = carry
        p = p * lam64 / (k + 1).astype(jnp.float64)
        cdf_new = cdf + p
        y = jnp.where(cdf < u, y + 1.0, y)
        return k + 1, p, cdf_new, y

    _, _, _, y_walk = jax.lax.while_loop(
        cond, body, (jnp.int32(0), p0, p0, jnp.zeros(u.shape, jnp.float32))
    )
    y_norm = jnp.maximum(jnp.floor(lam + z * jnp.sqrt(lam) + 0.5), 0.0)
    y = jnp.where(lam <= 20.0, y_walk, y_norm)
    return jnp.where(lam > 0.0, y, 0.0)


def factor_min_counts(spec: SimSpec, X) -> jnp.ndarray:
    """Smallest realized cell count per (grid point, factor) from the
    generated design plane, shape (G, n_factors) — drives sparse-level
    exclusion and the separation fallback's sparsest-factor pick."""
    rows = jnp.arange(spec.max_n)
    out = []
    for n in spec.grid:
        mask = rows < n
        per_factor = []
        for f, n_levels in enumerate(spec.factor_levels):
            start = spec.factor_col_start + sum(
                max(l - 1, 0) for l in spec.factor_levels[:f]
            )
            dummies = X[:, start : start + n_levels - 1]
            counts_lv = jnp.sum(dummies * mask[:, None].astype(X.dtype), axis=0)
            ref_count = jnp.asarray(n, X.dtype) - jnp.sum(counts_lv)
            per_factor.append(jnp.minimum(jnp.min(counts_lv), ref_count))
        out.append(jnp.stack(per_factor))
    return jnp.stack(out)  # (G, n_factors)


# ---------------------------------------------------------------------------
# Scenario design draw (per sim)
# ---------------------------------------------------------------------------


def _design_draw(spec: SimSpec, arr: Dict, key):
    """Per-sim scenario design: (L_chol f32, var_codes, resid_code, tau2_eff).

    The optimistic/baseline path is fully static (host L, static codes); any
    active perturbation draws from the CLASS_SCENARIO stream, domain-separated
    from X/residual draws so turning a knob off is draw-identical to the
    baseline (reference invariant, crates/engine-core/src/scenarios.rs).
    """
    sc = spec.scenario
    n_cont = spec.n_cont

    # Correlation.
    if sc.correlation_noise_sd > 0.0 and n_cont > 1:
        base = arr["corr"].astype(jnp.float64)
        n_off = n_cont * (n_cont - 1) // 2
        noise = (
            rng.normal_fill(key, rng.CLASS_SCENARIO, _SC_CORR, 0, n_off).astype(
                jnp.float64
            )
            * sc.correlation_noise_sd
        )
        iu = jnp.triu_indices(n_cont, k=1)
        sigma = base.at[iu].add(noise)
        sigma = sigma.at[(iu[1], iu[0])].add(noise)
        sigma = jnp.where(
            jnp.eye(n_cont, dtype=bool), 1.0, jnp.clip(sigma, -0.8, 0.8)
        )
        L = _psd_repair_chol(sigma).astype(jnp.float32)
    else:
        L = arr["corr_chol"].astype(jnp.float32)

    # Var-type swaps: unpinned Normal columns flip with prob to a pool pick.
    base_codes = jnp.asarray(spec.var_types, dtype=jnp.int32)
    if sc.distribution_change_prob > 0.0 and n_cont > 0 and sc.new_distributions:
        pool = jnp.asarray(
            [DIST_CODES[d] for d in sc.new_distributions], dtype=jnp.int32
        )
        u_swap = rng.uniform_fill(key, rng.CLASS_SCENARIO, _SC_VARSWAP_U, 0, n_cont)
        u_pick = rng.uniform_fill(key, rng.CLASS_SCENARIO, _SC_VARSWAP_PICK, 0, n_cont)
        pick = jnp.minimum(
            (u_pick * len(sc.new_distributions)).astype(jnp.int32),
            len(sc.new_distributions) - 1,
        )
        swappable = (base_codes == DIST_CODES["normal"]) & ~jnp.asarray(
            spec.var_pinned, dtype=bool
        )
        var_codes = jnp.where(
            swappable & (u_swap < sc.distribution_change_prob),
            pool[pick],
            base_codes,
        )
    else:
        var_codes = base_codes

    # Residual swap.
    resid_code = jnp.int32(spec.residual)
    if (
        sc.residual_change_prob > 0.0
        and not spec.residual_pinned
        and sc.residual_dists
    ):
        from .spec import RESID_CODES

        pool_r = jnp.asarray(
            [RESID_CODES[d] for d in sc.residual_dists], dtype=jnp.int32
        )
        u_r = rng.uniform_fill(key, rng.CLASS_SCENARIO, _SC_RESID_U, 0, 1)[0]
        u_rp = rng.uniform_fill(key, rng.CLASS_SCENARIO, _SC_RESID_PICK, 0, 1)[0]
        pick_r = jnp.minimum(
            (u_rp * len(sc.residual_dists)).astype(jnp.int32),
            len(sc.residual_dists) - 1,
        )
        resid_code = jnp.where(
            u_r < sc.residual_change_prob, pool_r[pick_r], resid_code
        )

    # Effective tau^2 per grouping (primary + extras): additive ICC jitter,
    # clamped >= 0 (data_gen.rs:1069-1090).
    n_groupings = (1 + len(spec.cluster.extra_groupings)) if spec.cluster else 0
    if spec.cluster is not None:
        base_tau = jnp.asarray(
            [spec.cluster.tau_squared]
            + [g.tau_squared for g in spec.cluster.extra_groupings],
            dtype=jnp.float32,
        )
        if sc.icc_noise_sd > 0.0:
            jit_draw = rng.normal_fill(
                key, rng.CLASS_SCENARIO, _SC_ICC, 0, n_groupings
            )
            tau2_eff = jnp.maximum(base_tau + jit_draw * sc.icc_noise_sd, 0.0)
        else:
            tau2_eff = base_tau
    else:
        tau2_eff = jnp.zeros(1, dtype=jnp.float32)

    return L, var_codes, resid_code, tau2_eff


# ---------------------------------------------------------------------------
# Cluster random effects
# ---------------------------------------------------------------------------


def _re_draw(spec: SimSpec, key, column_base: int, count: int, row_offset: int = 0):
    """Unit-variance RE component draws under the scenario's RE distribution."""
    sc = spec.scenario
    if sc.random_effect_dist == "normal":
        return rng.normal_fill(
            key, rng.CLASS_CLUSTER, column_base, row_offset, row_offset + count
        )
    # heavy_tailed: standardized t(re_df), same construction as residuals.
    df = max(float(sc.random_effect_df), 3.0)
    df_int = max(int(round(df)), 1)
    z = rng.normal_fill(
        key, rng.CLASS_CLUSTER, column_base, row_offset, row_offset + count
    )
    chi2 = jnp.zeros(count, dtype=jnp.float32)
    for s in range(df_int):
        g = rng.normal_fill(
            key, rng.CLASS_CLUSTER, column_base + 1 + s, row_offset, row_offset + count
        )
        chi2 = chi2 + g * g
    denom = jnp.sqrt(chi2 / jnp.float32(df))
    scale = jnp.float32(np.sqrt((df - 2.0) / df))
    return jnp.where(denom > 0, z / denom, z) * scale


def _re_chol(tau0_sq, slopes) -> jnp.ndarray:
    """chol(D) for D = diag(tau) R diag(tau): intercept + slopes, where R has
    ``intercept_corr`` between the intercept and each slope and
    ``corr_i * corr_j`` between slopes (the single-factor correlation model
    the reference's re_correlation_matrix builds)."""
    q = 1 + len(slopes)
    taus = jnp.concatenate(
        [
            jnp.sqrt(jnp.maximum(tau0_sq, 0.0))[None],
            jnp.asarray([np.sqrt(max(s.variance, 0.0)) for s in slopes], jnp.float32),
        ]
    )
    corr = np.eye(q)
    for i, s in enumerate(slopes):
        corr[0, 1 + i] = corr[1 + i, 0] = s.intercept_corr
    for i, si in enumerate(slopes):
        for j, sj in enumerate(slopes):
            if i != j:
                corr[1 + i, 1 + j] = si.intercept_corr * sj.intercept_corr
    D = taus[:, None] * jnp.asarray(corr, jnp.float32) * taus[None, :]
    # Guard the zero-variance case: chol of a PSD-with-zeros matrix.
    eps = 1e-12 * jnp.eye(q, dtype=jnp.float32)
    return jnp.linalg.cholesky(D + eps)


def _cluster_re_contribution(spec: SimSpec, arr: Dict, key, X, tau2_eff):
    """Latent-scale random-effect value per row: primary intercept + slopes
    + extra groupings. Returns (max_n,) f32."""
    c = spec.cluster
    ids = _cluster_ids(spec)
    max_clusters = c.n_clusters_at(spec.max_n)
    q = c.q

    # Primary grouping: z (max_clusters, q) -> u = z @ L^T.
    z_cols = []
    for comp in range(q):
        z_cols.append(_re_draw(spec, key, comp * 32, max_clusters, row_offset=0))
    z = jnp.stack(z_cols, axis=1)  # (clusters, q)
    L = _re_chol(tau2_eff[0], c.slopes)
    u = z @ L.T  # (clusters, q)

    u_re = u[ids, 0]
    for k, slope in enumerate(c.slopes):
        u_re = u_re + u[ids, 1 + k] * X[:, slope.design_col]

    # Extra groupings (crossed/nested).
    for g, eg in enumerate(c.extra_groupings):
        col_base = (g + 1) * 1024
        eg_ids, n_lv = extra_grouping_ids(spec, g)
        q_g = 1 + len(eg.slopes)
        zg_cols = [
            _re_draw(spec, key, col_base + comp * 32, n_lv) for comp in range(q_g)
        ]
        zg = jnp.stack(zg_cols, axis=1)
        Lg = _re_chol(tau2_eff[1 + g], eg.slopes)
        ug = zg @ Lg.T
        u_re = u_re + ug[eg_ids, 0]
        for k, slope in enumerate(eg.slopes):
            u_re = u_re + ug[eg_ids, 1 + k] * X[:, slope.design_col]

    return u_re, ids


# ---------------------------------------------------------------------------
# Main entry: one simulation's (X, y)
# ---------------------------------------------------------------------------


def generate(spec: SimSpec, arr: Dict, key) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build (X (max_n, P) f32, y (max_n,) f32, cluster_ids (max_n,) i32)."""
    max_n = spec.max_n
    rows = jnp.arange(max_n)
    sc = spec.scenario

    L, var_codes, resid_code, tau2_eff = _design_draw(spec, arr, key)

    # --- continuous block: planar normals -> Cholesky mix -> marginals ---
    from .spec import DIST_UPLOADED, DIST_UPLOADED_BINARY

    cols = []
    if spec.n_cont > 0:
        z = jnp.stack(
            [
                rng.normal_fill(key, rng.CLASS_XNORM, j, 0, max_n)
                for j in range(spec.n_cont)
            ],
            axis=1,
        )  # (max_n, n_cont)
        mixed = z @ L.T  # f32 matmul (MXU at batch scale)
        dynamic_types = sc.distribution_change_prob > 0.0
        for j in range(spec.n_cont):
            xj = mixed[:, j]
            pj = arr["var_params"][j]
            base = spec.var_types[j]
            if base == DIST_UPLOADED:
                # Gaussian-copula NORTA: z -> u -> inverse empirical CDF of
                # the uploaded column (data_gen.rs:1262 empirical_quantile).
                u = rng.norm_cdf(xj)
                n_up = max(spec.upload_rows, 1)
                idx = jnp.clip((u * n_up).astype(jnp.int32), 0, n_up - 1)
                cols.append(arr[f"upload_sorted_{j}"][idx])
            elif base == DIST_UPLOADED_BINARY:
                u = rng.norm_cdf(xj)
                cols.append(
                    jnp.where(u >= 1.0 - pj, jnp.float32(1.0), jnp.float32(0.0))
                )
            elif dynamic_types:
                cols.append(marginals.apply_marginal(xj, var_codes[j], pj))
            else:
                cols.append(marginals.apply_marginal_static(xj, base, pj))

    # --- strict-bootstrap row picks (one shared source row per design row
    # preserves the exact empirical joint — data_gen.rs bootstrap arm) ---
    if spec.bootstrap and spec.upload_rows > 0:
        u_boot = rng.uniform_fill(key, rng.CLASS_BOOT, 0, 0, max_n)
        boot_r = jnp.clip(
            (u_boot * spec.upload_rows).astype(jnp.int32), 0, spec.upload_rows - 1
        )
        frame = arr["boot_frame"]  # (n_rows, n_frame_cols) f32
        for j, fc in enumerate(spec.upload_cont_frame_cols):
            if fc >= 0:
                cols[j] = frame[boot_r, fc]
    else:
        boot_r = None

    # --- factor block: reference-coded dummies ---
    factor_level_codes = []
    for f, n_levels in enumerate(spec.factor_levels):
        sampled = spec.factor_sampled[f]
        if sampled is None:
            sampled = sc.sampled_factor_proportions
        off = sum(spec.factor_levels[:f])
        probs = arr["factor_props"][off : off + n_levels]
        fc = (
            spec.upload_factor_frame_cols[f]
            if f < len(spec.upload_factor_frame_cols)
            else -1
        )
        if boot_r is not None and fc >= 0:
            lvl = arr["boot_frame"][boot_r, fc].astype(jnp.int32)
        elif sampled:
            u = rng.uniform_fill(key, rng.CLASS_FACTOR, f, 0, max_n)
            cdf = jnp.cumsum(probs) / jnp.sum(probs)
            lvl = jnp.sum(u[:, None] >= cdf[None, :-1], axis=1).astype(jnp.int32)
        else:
            lvl = arr[f"fixed_codes_{f}"]
        factor_level_codes.append(lvl)
        for d in range(n_levels - 1):
            cols.append(jnp.where(lvl == d + 1, jnp.float32(1.0), jnp.float32(0.0)))

    X = jnp.concatenate(
        [jnp.ones((max_n, 1), jnp.float32)]
        + [c[:, None] for c in cols]
        + [jnp.zeros((max_n, len(spec.interactions)), jnp.float32)],
        axis=1,
    )

    # --- cluster-level broadcast (before interactions) ---
    if spec.cluster is not None and spec.cluster.between_cols:
        rep = _rep_rows(spec)
        for col in spec.cluster.between_cols:
            X = X.at[:, col].set(X[rep, col])

    # --- interaction block ---
    for j, comps in enumerate(spec.interactions):
        prod = X[:, comps[0]]
        for cidx in comps[1:]:
            prod = prod * X[:, cidx]
        X = X.at[:, spec.interaction_col_start + j].set(prod)

    # --- per-study heterogeneity beta-jitter (data_gen.rs:700-760) ---
    p = spec.n_predictors
    beta = arr["effects"].astype(jnp.float32)
    het = max(sc.heterogeneity, 0.0)
    if het > FLOAT_NEAR_ZERO:
        delta_z = rng.normal_fill(key, rng.CLASS_HET, 0, 0, p)
        # Intercept jitter SD: continuous 0 (effects-only); binary/count an
        # absolute latent-scale shift of sd = het (data_gen.rs:716-724).
        s0 = 0.0 if spec.outcome == "continuous" else het
        s = jnp.concatenate(
            [jnp.asarray([s0], jnp.float32), het * jnp.abs(beta[1:])]
        )
        raw = beta + delta_z * s
        # Clip effect columns toward zero, never across it; intercept unclipped.
        clipped = jnp.where(
            beta > 0, jnp.maximum(raw, 0.0), jnp.where(beta < 0, jnp.minimum(raw, 0.0), raw)
        )
        beta_eff = jnp.concatenate([raw[:1], clipped[1:]])
    else:
        beta_eff = beta

    lp_clean = X @ beta  # drives heteroskedasticity scaling
    lp = X @ beta_eff if het > FLOAT_NEAR_ZERO else lp_clean

    # --- cluster random effects ---
    if spec.cluster is not None:
        u_re, ids = _cluster_re_contribution(spec, arr, key, X, tau2_eff)
    else:
        u_re = jnp.zeros(max_n, jnp.float32)
        ids = jnp.zeros(max_n, jnp.int32)

    eta = lp + u_re

    # --- outcome assembly ---
    if spec.outcome == "continuous":
        eps = _unit_residual_draws(key, 0, max_n, resid_code, sc.residual_df)
        lam = max(sc.heteroskedasticity_ratio, 1.0)
        gamma = float(np.log(lam) / 4.0)
        if (
            gamma > FLOAT_NEAR_ZERO
        ):  # heteroskedasticity: continuous outcomes only
            if spec.het_driver is None:
                center, std = arr["het_lp_mean"], arr["het_lp_std"]
                driver = lp_clean
            else:
                center = arr["het_col_mean"][spec.het_driver]
                std = arr["het_col_std"][spec.het_driver]
                driver = X[:, spec.het_driver]
            zdrv = jnp.where(std > FLOAT_NEAR_ZERO, (driver - center) / std, 0.0)
            mult = jnp.exp(jnp.float32(gamma) * zdrv) * jnp.float32(
                np.exp(-gamma * gamma / 2.0)
            )
            active = std > FLOAT_NEAR_ZERO
            eps = jnp.where(active, eps * jnp.sqrt(mult), eps)
        y = eta + eps
    elif spec.outcome == "binary":
        if spec.link == "probit":
            zlat = rng.normal_fill(key, rng.CLASS_RESID, 0, 0, max_n)
            y = jnp.where(zlat < eta, jnp.float32(1.0), jnp.float32(0.0))
        else:
            u = rng.uniform_fill(key, rng.CLASS_RESID, 0, 0, max_n)
            y = jnp.where(u < jax.nn.sigmoid(eta), jnp.float32(1.0), jnp.float32(0.0))
    elif spec.outcome == "count":
        # One uniform serves both arms: the PMF walk consumes u directly
        # (no ppf -> cdf round trip), the high-lambda normal approximation
        # consumes z = ppf(u). The walk's u is clamped below 1.0 exactly
        # as the ppf clamps internally — the f32 open uniform rounds the
        # top few u32 values to 1.0, and an unclamped u == 1.0 lane would
        # ride the walk to its 200-count cap instead of its quantile.
        u_cnt = rng.u32_to_open_uniform(
            rng.fill_raw(key, rng.CLASS_RESID, 0, 0, max_n)
        )
        u_cnt = jnp.minimum(u_cnt, jnp.float32(1.0 - 6e-8))
        zlat = rng.norm_ppf_f32(u_cnt)
        lam_i = jnp.exp(eta)
        y = _poisson_quantile(u_cnt, zlat, lam_i)
    else:
        raise ValueError(f"unknown outcome {spec.outcome!r}")

    return X, y.astype(jnp.float32), ids


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(0,))
def generate_batch(spec: SimSpec, arr: Dict, seed_lo, seed_hi, sim_ids):
    """Jitted, vmapped generation: (n_sims, max_n, P) X, (n_sims, max_n) y.

    Used by tests, the debug/introspection capture path, and anywhere raw
    simulated datasets are needed outside the fused power pipeline.
    """

    def one(sid):
        k0, k1, _, _ = rng.philox4x32(
            jnp.asarray(sid, jnp.uint32),
            jnp.uint32(0),
            jnp.uint32(rng.CLASS_SIMKEY),
            jnp.uint32(0),
            jnp.asarray(seed_lo, jnp.uint32),
            jnp.asarray(seed_hi, jnp.uint32),
        )
        return generate(spec, arr, (k0, k1))

    return jax.vmap(one)(sim_ids)
