"""Counter-addressed Philox4x32-10 RNG, vectorized in pure jnp (VPU-native).

This module is the reproducibility contract of the engine. Every random value
drawn anywhere in a simulation run is addressed by an explicit counter tuple

    (base_seed, sim_id, stream_class, column, row)

so that value (i, j) of simulation s is a pure function of those coordinates:
independent of batch size, device count, chunking, the maximum sample size of
the run, and of every other draw. This gives us, by construction:

* **prefix stability / common random numbers** — row ``i`` never depends on
  ``max_n``, so a sample-size grid evaluates every N on nested prefixes of one
  draw budget (the reference engine gets this from its Philox counter scheme,
  ``/root/reference/crates/engine-core/src/rng.rs:1-14``);
* **device-count independence** — sharding sims over a TPU mesh cannot move a
  single bit, strictly stronger than the reference's per-worker-seed merge
  guarantee (``ports/wasm/src/seeds.ts``);
* **sequential/parallel bit identity** — there is no sequential stream at all,
  every draw is individually addressed (the TPU-native improvement over the
  reference's per-sim sequential stream for scattered draws).

Why our own Philox instead of ``jax.random``: ``jax.random.normal(key, shape)``
assigns counters shape-dependently, so a draw of ``max_n`` rows is not a prefix
of a longer draw. We keep the *addressing scheme* of the reference (per-sim
keys, class/column/row counters — see SURVEY.md §2.8 item 1) while using our
own bitstream, implemented as ~40 uint32 multiply/xor ops per 4 output words —
pure VPU work that XLA fuses into the surrounding generation pass. Like the
reference's blocked planar fills (``fill_words``, rng.rs:154), all four cipher
output words are consumed: row ``i`` reads word ``i & 3`` of the cipher at
block counter ``i >> 2``, so a length-n fill costs n/4 cipher invocations.

The bitstream is golden-pinned by ``tests/test_rng.py`` (Random123 known-answer
vectors + a pinned stream fixture). Changing anything in this file is a
result-moving change for every golden test in the suite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Philox4x32 round constants (Salmon et al., SC'11 "Parallel random numbers:
# as easy as 1, 2, 3" — the Random123 reference constants).
_M0 = jnp.uint32(0xD2511F53)
_M1 = jnp.uint32(0xCD9E8D57)
_W0 = jnp.uint32(0x9E3779B9)  # golden ratio
_W1 = jnp.uint32(0xBB67AE85)  # sqrt(3) - 1

# Stream classes — the third counter word. Mirrors the reference's
# class-addressed planar streams (CLASS_XNORM / CLASS_RESID at
# crates/engine-core/src/rng.rs:141-147) and extends the scheme to every
# scattered draw the reference serves from its sequential per-sim stream.
CLASS_XNORM = 0  # latent normals for continuous predictor columns (column=j)
CLASS_RESID = 1  # residual draws (column=slot: 0=z/u, 1..=chi2 accumulators)
CLASS_FACTOR = 2  # categorical factor draws (column=factor index)
CLASS_CLUSTER = 3  # cluster random-effect draws (column=grouping index)
CLASS_HET = 4  # per-sim heterogeneity beta-jitter (column=predictor index)
CLASS_SCENARIO = 5  # per-sim scenario perturbation draws (column=knob)
CLASS_BOOT = 6  # strict-bootstrap source-row picks
CLASS_SIMKEY = 7  # key-derivation stream (see _sim_key)

_HI16 = jnp.uint32(0xFFFF)


def _mulhi32(a, b):
    """High 32 bits of the 32x32->64 product, in pure uint32 ops.

    TPUs have no 64-bit integer path without x64 mode (and x64 integer mul is
    slow there anyway); a 16-bit split costs 4 multiplies and stays entirely in
    native uint32 VPU lanes.
    """
    al = a & _HI16
    ah = a >> 16
    bl = b & _HI16
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = (ll >> 16) + (lh & _HI16) + (hl & _HI16)
    return hh + (lh >> 16) + (hl >> 16) + (mid >> 16)


from functools import partial


@partial(jax.jit, static_argnames=("rounds",))
def philox4x32(c0, c1, c2, c3, k0, k1, rounds: int = 10):
    """Philox4x32 block cipher: 4 counter words + 2 key words -> 4 random words.

    All arguments are uint32 arrays of a common broadcastable shape; returns a
    tuple of 4 uint32 arrays of that shape. ``rounds=10`` is the standard
    full-strength variant (Random123's philox4x32-10). Jitted so the ~300
    unrolled integer ops compile as one fused program even when called
    standalone; inside larger jitted programs the jit is inlined away.
    """
    c0 = jnp.asarray(c0, jnp.uint32)
    c1 = jnp.asarray(c1, jnp.uint32)
    c2 = jnp.asarray(c2, jnp.uint32)
    c3 = jnp.asarray(c3, jnp.uint32)
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    for r in range(rounds):
        if r > 0:
            k0 = k0 + _W0
            k1 = k1 + _W1
        hi0 = _mulhi32(_M0, c0)
        lo0 = _M0 * c0
        hi1 = _mulhi32(_M1, c2)
        lo1 = _M1 * c2
        c0, c1, c2, c3 = hi1 ^ c1 ^ k0, lo1, hi0 ^ c3 ^ k1, lo0
    return c0, c1, c2, c3


def sim_key(base_seed, sim_id):
    """Derive the per-sim 64-bit Philox key from (base_seed, sim_id).

    Both inputs may be traced device values (sim ids vary across a vmapped
    batch). Key derivation is itself one Philox call on the CLASS_SIMKEY
    stream, so the whole scheme is closed under one primitive:

        (k0, k1) = philox(counter=(sim_lo, sim_hi, CLASS_SIMKEY, 0),
                          key=(seed_lo, seed_hi))[:2]

    Returns a (k0, k1) uint32 pair.
    """
    base_seed = jnp.asarray(base_seed, jnp.uint32)
    seed_hi = jnp.asarray(
        jnp.right_shift(jnp.asarray(base_seed, jnp.int64), 32)
        if jax.config.jax_enable_x64
        else jnp.zeros_like(base_seed),
        jnp.uint32,
    )
    sim_lo = jnp.asarray(sim_id, jnp.uint32)
    sim_hi = jnp.asarray(
        jnp.right_shift(jnp.asarray(sim_id, jnp.int64), 32)
        if jax.config.jax_enable_x64
        else jnp.zeros_like(sim_lo),
        jnp.uint32,
    )
    k0, k1, _, _ = philox4x32(
        sim_lo, sim_hi, jnp.uint32(CLASS_SIMKEY), jnp.uint32(0), base_seed, seed_hi
    )
    return k0, k1


def _block_words(key, stream_class, column, blocks):
    """All 4 cipher words for the given block counters of a planar stream.

    Counter layout: (block, column, class, 0xA5A5A5A5 domain tag).
    """
    k0, k1 = key
    return philox4x32(
        jnp.asarray(blocks, jnp.uint32),
        jnp.uint32(column) if not hasattr(column, "dtype") else jnp.asarray(column, jnp.uint32),
        jnp.uint32(stream_class),
        jnp.uint32(0xA5A5A5A5),
        k0,
        k1,
    )


def raw_words(key, stream_class, column, rows):
    """One raw uint32 word per row for a (class, column) planar stream.

    **Packed addressing** (the reproducibility contract): the word at
    ``(class, column, row)`` is output word ``row & 3`` of the cipher at
    counter ``(row >> 2, column, class, 0xA5A5A5A5)`` — four consecutive
    rows share one Philox invocation, exactly the reference's blocked
    planar fills, which also consume all four output words per counter
    (crates/engine-core/src/rng.rs:154 ``fill_words``). Each value is
    still a pure function of (seed, sim, class, column, row): prefix
    stability, device-count independence, and draw independence are
    unchanged; the cipher cost per value drops 4x.

    ``key``: (k0, k1) pair from :func:`sim_key` (arrays broadcastable
    against ``rows``). ``rows``: int32/uint32 array of row indices (any
    shape). For contiguous row ranges prefer :func:`fill_raw`, which
    evaluates each block once instead of once per row.
    """
    rows = jnp.asarray(rows, jnp.uint32)
    w = _block_words(key, stream_class, column, rows >> 2)
    lane = rows & jnp.uint32(3)
    return jnp.where(
        lane == 0,
        w[0],
        jnp.where(lane == 1, w[1], jnp.where(lane == 2, w[2], w[3])),
    )


def fill_raw(key, stream_class, column, start: int, stop: int):
    """Words for the contiguous rows ``[start, stop)`` — the fast path.

    Identical values to ``raw_words(key, cls, col, arange(start, stop))``
    (same packed addressing), but each 4-row block runs the cipher once:
    ``(stop - start) / 4`` Philox invocations instead of one per row.
    ``start``/``stop`` must be static Python ints (they are shape-affecting).
    """
    b0 = start >> 2
    b1 = ((stop - 1) >> 2) + 1 if stop > start else b0
    w = _block_words(
        key, stream_class, column, jnp.arange(b0, b1, dtype=jnp.uint32)
    )
    words = jnp.stack(w, axis=-1).reshape(*w[0].shape[:-1], -1)
    off = start - 4 * b0
    return words[..., off : off + (stop - start)]


_INV_2POW24 = jnp.float32(1.0 / (1 << 24))
_INV_2POW32 = jnp.float32(1.0 / 4294967296.0)


def u32_to_uniform(w):
    """uint32 -> float32 uniform in [0, 1): top 24 bits scaled by 2^-24."""
    return (w >> 8).astype(jnp.float32) * _INV_2POW24


def u32_to_open_uniform(w):
    """uint32 -> float32 uniform in (0, 1): (w + 0.5) / 2^32.

    Never exactly 0 or 1 — safe as input to inverse-CDF transforms.
    """
    return (w.astype(jnp.float32) + jnp.float32(0.5)) * _INV_2POW32


def uniform(key, stream_class, column, rows):
    """float32 uniform [0,1) stream at (class, column, rows)."""
    return u32_to_uniform(raw_words(key, stream_class, column, rows))


def uniform_fill(key, stream_class, column, start: int, stop: int):
    """Contiguous-range twin of :func:`uniform` (same values, 4x cheaper)."""
    return u32_to_uniform(fill_raw(key, stream_class, column, start, stop))


def normal(key, stream_class, column, rows):
    """float32 standard normal via one-uniform inverse CDF (Acklam ppf).

    Mirrors the reference's one-uniform-per-normal budget
    (crates/engine-core/src/rng.rs:354 ``norm_inv_cdf_f32``) so every normal
    draw is individually addressable. Uses the open-interval uniform so the
    ppf never sees 0 or 1.
    """
    return norm_ppf_f32(
        u32_to_open_uniform(raw_words(key, stream_class, column, rows))
    )


def normal_fill(key, stream_class, column, start: int, stop: int):
    """Contiguous-range twin of :func:`normal` (same values, 4x cheaper)."""
    return norm_ppf_f32(
        u32_to_open_uniform(fill_raw(key, stream_class, column, start, stop))
    )


# ---------------------------------------------------------------------------
# Acklam's inverse normal CDF, single precision.
#
# Peter Acklam's minimax rational approximation (public algorithm, relative
# error < 1.15e-9 in double precision; in f32 the working precision dominates).
# Same algorithm family the reference uses for its f32 generation-path normals
# (crates/engine-core/src/rng.rs:354) and its f64 crit-value ppf
# (crates/engine-core/src/critvals.rs:33).
# ---------------------------------------------------------------------------

_ACKLAM_A = (
    -3.969683028665376e01,
    2.209460984245205e02,
    -2.759285104469687e02,
    1.383577518672690e02,
    -3.066479806614716e01,
    2.506628277459239e00,
)
_ACKLAM_B = (
    -5.447609879822406e01,
    1.615858368580409e02,
    -1.556989798598866e02,
    6.680131188771972e01,
    -1.328068155288572e01,
)
_ACKLAM_C = (
    -7.784894002430293e-03,
    -3.223964580411365e-01,
    -2.400758277161838e00,
    -2.549732539343734e00,
    4.374664141464968e00,
    2.938163982698783e00,
)
_ACKLAM_D = (
    7.784695709041462e-03,
    3.224671290700398e-01,
    2.445134137142996e00,
    3.754408661907416e00,
)

_P_LOW = 0.02425


def _acklam_central(q, dtype):
    # central region: |p - 0.5| <= 0.47575, q = p - 0.5, r = q*q
    a = [jnp.asarray(v, dtype) for v in _ACKLAM_A]
    b = [jnp.asarray(v, dtype) for v in _ACKLAM_B]
    r = q * q
    num = ((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]
    den = (((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]
    return q * num / (den * r + jnp.asarray(1.0, dtype))


def _acklam_tail(p, dtype):
    # lower tail: p < 0.02425, q = sqrt(-2 ln p)
    c = [jnp.asarray(v, dtype) for v in _ACKLAM_C]
    d = [jnp.asarray(v, dtype) for v in _ACKLAM_D]
    q = jnp.sqrt(-2.0 * jnp.log(p))
    num = ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]
    den = (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + jnp.asarray(1.0, dtype)
    return num / den


def norm_ppf(p, dtype=None):
    """Inverse standard normal CDF (Acklam), elementwise, f32 or f64.

    In float64 one Halley refinement step is applied, pushing the ~1.15e-9
    relative error of the raw rational approximation to full double precision
    (matches the reference's crit-value ppf tolerance, BASELINE.md: abs <=
    1e-9 vs R qnorm).
    """
    p = jnp.asarray(p)
    if dtype is None:
        dtype = p.dtype if p.dtype in (jnp.float32, jnp.float64) else jnp.float32
    p = p.astype(dtype)
    if dtype == jnp.float64:
        tiny, top = 5e-324, 1.0 - 1.1e-16
    else:
        tiny, top = 1e-38, 1.0 - 6e-8
    pc = jnp.clip(p, jnp.asarray(tiny, dtype), jnp.asarray(top, dtype))
    # One tail evaluation serves both tails: for p < 0.5 the lower-tail
    # rational is evaluated at p, for p > 0.5 at 1-p with the sign
    # flipped — identical values to evaluating each tail separately
    # (the rational is the same function of the same argument), at half
    # the log/sqrt transcendental budget per draw. The generation path
    # evaluates this for every normal, so the saving is hot.
    one = jnp.asarray(1.0, dtype)
    q = jnp.where(pc < 0.5, pc, one - pc)
    t = _acklam_tail(q, dtype)
    tail = jnp.where(pc < 0.5, t, -t)
    mid = _acklam_central(pc - jnp.asarray(0.5, dtype), dtype)
    # thresholds as python floats, exactly as the two-call form compared
    # them (1.0 - _P_LOW rounds differently than one - jnp(_P_LOW) by an
    # ULP in f32; keep the historical boundary bit-for-bit)
    in_tail = (pc < _P_LOW) | (pc > 1.0 - _P_LOW)
    x = jnp.where(in_tail, tail, mid)
    if dtype == jnp.float64:
        # Halley step: e = Phi(x) - p computed through erfc for tail accuracy.
        sqrt2pi = jnp.asarray(2.5066282746310002, dtype)
        e = 0.5 * jax.scipy.special.erfc(-x * jnp.asarray(_INV_SQRT2, dtype)) - pc
        u = e * sqrt2pi * jnp.exp(0.5 * x * x)
        x = x - u / (1.0 + 0.5 * x * u)
    return x


def norm_ppf_f32(p):
    return norm_ppf(p, jnp.float32)


# ---------------------------------------------------------------------------
# Standard normal CDF (Abramowitz & Stegun 7.1.26-style erfc composition) —
# the generation-path Phi used by the Gaussian-copula marginal transforms.
# jax.lax.erf is a native TPU transcendental; accuracy far exceeds the
# reference's A&S polynomial (crates/engine-core/src/distributions.rs:33).
# ---------------------------------------------------------------------------

_INV_SQRT2 = 0.7071067811865476


def norm_cdf(z):
    z = jnp.asarray(z)
    half = jnp.asarray(0.5, z.dtype)
    return half * (jnp.asarray(1.0, z.dtype) + jax.lax.erf(z * jnp.asarray(_INV_SQRT2, z.dtype)))
