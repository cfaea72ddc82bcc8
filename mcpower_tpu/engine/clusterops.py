"""Cluster segment-sums as reshaped reductions (the layout dividend).

The primary-grouping row layout is STATIC iota math (``datagen._cluster_ids``):

* ``fixed_clusters``: ``id(i) = i % m``   (round-robin over m clusters)
* ``fixed_size``:     ``id(i) = i // cs`` (contiguous blocks of cs rows)

and every grid point — including ``max_n`` — is snapped to the cluster
atom, so the row count is always an exact multiple of the period. That
makes per-cluster segment sums EXACT tensor reshapes:

* round-robin:  ``x.reshape(n//m, m).sum(-2)``
* blocked:      ``x.reshape(n//cs, cs).sum(-1)``

The one-hot-matmul formulation these replace is catastrophically padded
on the MXU: a (m=20, n=200) x (n, p<=5) contraction pads every dimension
to the 128-lane tile, inflating each segment sum to ~50-100x its model
FLOPs — and the mixed-model inner loops issue several of them per
iteration. The reshape form is a plain VPU reduction with zero padding
waste. (Reference analogue: the Rust engine's per-cluster accumulators
walk rows once per sim — ``crates/engine-core/src/batch.rs`` suff-stats
loops; the layout regularity is what its round-robin allocator
guarantees, generation.rs ``ClusterSizing``.)

The inverse map (per-cluster value -> per-row value) is likewise a
``tile`` / ``repeat`` instead of a gather.

All helpers take the row axis LAST; leading axes are batch.
"""

from __future__ import annotations

import jax.numpy as jnp

from .spec import SimSpec


def _layout(spec: SimSpec):
    c = spec.cluster
    assert c is not None
    period = max(int(c.sizing_value), 1)
    return c.sizing_mode == "fixed_clusters", period


def n_clusters(spec: SimSpec) -> int:
    c = spec.cluster
    return c.n_clusters_at(spec.max_n)


def seg_sum(spec: SimSpec, x: jnp.ndarray) -> jnp.ndarray:
    """Sum the trailing row axis (..., n_rows) into clusters (..., m).

    Rows past the active N must already be zeroed (masked) by the caller;
    inactive clusters then sum to exactly 0, matching the one-hot form.
    ``n_rows`` may be any snapped prefix (a grid segment), as long as the
    segment starts at a multiple of the layout period.
    """
    round_robin, period = _layout(spec)
    n_rows = x.shape[-1]
    lead = x.shape[:-1]
    if round_robin:
        # id = i % m: rows interleave over the m clusters
        return x.reshape(*lead, n_rows // period, period).sum(-2)
    # id = i // cs: contiguous blocks of cs rows per cluster
    return x.reshape(*lead, n_rows // period, period).sum(-1)


def seg_segment(
    spec: SimSpec, x: jnp.ndarray, start: int, m: int
) -> jnp.ndarray:
    """Segment-sum a GRID SLICE of rows (..., seg_len) into the full
    (..., m) cluster axis. ``start`` is the slice's first global row — a
    snapped grid point, so it is a multiple of the layout period.

    Round-robin layouts interleave all m clusters in every period, so the
    plain reshape covers the full cluster axis; blocked layouts cover
    clusters [start//cs, start//cs + seg_len//cs) and are zero-padded to m.
    """
    round_robin, period = _layout(spec)
    if round_robin:
        return seg_sum(spec, x)
    lead = x.shape[:-1]
    k = x.shape[-1] // period
    part = x.reshape(*lead, k, period).sum(-1)
    offset = start // period
    pad = [(0, 0)] * (part.ndim - 1) + [(offset, m - offset - k)]
    return jnp.pad(part, pad)


def per_row(spec: SimSpec, v: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """Broadcast per-cluster values (..., m) to per-row (..., n_rows) —
    the ``v[ids]`` gather, expressed as tile/repeat on the static layout."""
    round_robin, period = _layout(spec)
    lead = v.shape[:-1]
    if round_robin:
        m = v.shape[-1]
        reps = n_rows // m
        return jnp.broadcast_to(
            v[..., None, :], (*lead, reps, m)
        ).reshape(*lead, n_rows)
    return jnp.repeat(v, period, axis=-1, total_repeat_length=n_rows)
