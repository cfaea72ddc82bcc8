"""Multiple-testing corrections in t^2 space, fully vectorized.

The crit table ships per-RANK t^2 thresholds (rank 0 = most significant);
the device side only sorts the k target statistics (k is small and static)
and applies step-down / step-up logic as cumulative boolean scans — no
p-values are ever computed on device (same t^2-space design as the
reference's corrections pass, crates/engine-core/src/correction.rs).

NaN statistics sink to non-significant: NaN comparisons are False and NaN
sorts to the last rank under descending sort.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_correction(t2, rank_crits, method: str):
    """Per-target significance after correction.

    t2:         (..., k) statistics.
    rank_crits: (..., k) per-rank thresholds (rank 0 = smallest alpha share);
                under 'tukey_hsd' the axis is per-TARGET in original order.
    method:     'none' | 'bonferroni' | 'holm' | 'benjamini_hochberg' |
                'tukey_hsd'.
    Returns boolean (..., k) in the ORIGINAL target order.
    """
    k = t2.shape[-1]
    if k == 0:
        return jnp.zeros(t2.shape, bool)
    if method in ("none", "bonferroni"):
        # Rank-independent thresholds: elementwise compare (rank 0 row).
        return t2 > rank_crits[..., :1]
    if method == "tukey_hsd":
        # Single-step per-target comparison, same shape as Bonferroni but the
        # threshold varies per TARGET (its factor's studentized-range crit) —
        # no sorting (reference correction.rs:41-52). NaN crits (non-factor
        # targets) compare False -> always fail.
        return t2 > rank_crits

    order = jnp.argsort(-t2, axis=-1)  # descending t^2 == ascending p
    t2_sorted = jnp.take_along_axis(t2, order, axis=-1)
    beats = t2_sorted > rank_crits

    if method == "holm":
        # Step-down: rank r significant iff every rank s <= r beats its crit.
        sig_sorted = jnp.cumprod(beats.astype(jnp.int32), axis=-1).astype(bool)
    elif method == "benjamini_hochberg":
        # Step-up: rank r significant iff any rank s >= r beats its crit.
        rev = jnp.flip(beats, axis=-1)
        any_from_r = jnp.flip(
            jnp.cumsum(rev.astype(jnp.int32), axis=-1) > 0, axis=-1
        )
        sig_sorted = any_from_r
    else:
        raise ValueError(f"unknown correction method {method!r}")

    # Unsort back to original target order.
    inv_order = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(sig_sorted, inv_order, axis=-1)
