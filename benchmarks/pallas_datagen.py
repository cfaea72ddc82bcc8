"""Measured experiment: Pallas (Mosaic) vs XLA for the Philox generation fill.

Data generation dominates the fast arms' wall-clock (65-80% of ols_base /
lmm_base, ARCHITECTURE.md round-2 profile), and inside generation the
Philox4x32-10 cipher dominates arithmetically (~230 uint32 ops per draw).
The cipher + Acklam ppf chain in ``engine/rng.py`` is pure elementwise
VPU work that XLA fuses into one loop; the open question this script
answers with a number is whether hand-scheduling the SAME computation as
a Pallas kernel (explicit VMEM tiling, no XLA fusion heuristics) buys
anything on real TPU hardware.

Both arms compute bit-identical values (asserted): the packed-addressed
standard-normal plane ``z[sim, col, row]`` = word ``row & 3`` of the
cipher at counter ``(row >> 2, col, CLASS_XNORM, 0xA5A5A5A5)`` under the
per-sim key, pushed through the one-tail Acklam inverse CDF — exactly the
engine's ``normal_fill`` contract at the throughput-grid shape.

Run:  python benchmarks/pallas_datagen.py [--sims 4096] [--rows 200] [--cols 5]
Result goes to ARCHITECTURE.md (adopt the kernel if it wins, record the
postmortem if it ties/loses — same protocol as the k-section experiment).
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from mcpower_tpu.engine import rng

CLASS_XNORM = rng.CLASS_XNORM
TAG = 0xA5A5A5A5


# ---------------------------------------------------------------------------
# Arm A — the engine's jnp path (XLA-fused), exactly as datagen uses it.
# ---------------------------------------------------------------------------


def make_jnp_fill(sims: int, rows: int, cols: int):
    @jax.jit
    def fill(base_seed):
        sim_ids = jnp.arange(sims, dtype=jnp.uint32)
        k0, k1 = jax.vmap(lambda s: rng.sim_key(base_seed, s))(sim_ids)

        def per_sim(key0, key1):
            return jnp.stack(
                [
                    rng.normal_fill((key0, key1), CLASS_XNORM, c, 0, rows)
                    for c in range(cols)
                ]
            )

        return jax.vmap(per_sim)(k0, k1)  # (sims, cols, rows) f32

    return fill


# ---------------------------------------------------------------------------
# Arm B — the same computation as a Pallas kernel.
#
# Grid over sim tiles; each program computes the full (cols × rows) plane for
# TILE sims: cipher counters laid out (TILE, cols*blocks) so every uint32 op
# is a full-width VPU op, then the 4 output words interleave into rows and
# the Acklam ppf maps uniforms to normals in-register before one store.
# ---------------------------------------------------------------------------


def make_pallas_fill(sims: int, rows: int, cols: int, tile: int = 256,
                     interpret: bool = False):
    from jax.experimental import pallas as pl

    blocks = (rows + 3) // 4  # packed: 4 rows per cipher invocation
    rows_pad = blocks * 4

    # All constants are numpy scalars: a Pallas kernel may not capture
    # device-array constants (ValueError "captures constants"), and numpy
    # scalars inline as jaxpr literals. Values are bit-identical to the
    # engine's jnp constants (same f32 rounding of the same doubles).
    #
    # The cipher runs in INT32 inside the kernel: Mosaic has no 64-bit
    # support and several u32 ops legalize through i64; on two's-complement
    # lanes add/mul/xor/and are bit-identical to u32, and the one place
    # semantics differ (right shift) uses shift_right_logical explicitly.
    M0 = np.int32(np.uint32(0xD2511F53).astype(np.int32))
    M1 = np.int32(np.uint32(0xCD9E8D57).astype(np.int32))
    W0 = np.int32(np.uint32(0x9E3779B9).astype(np.int32))
    W1 = np.int32(np.uint32(0xBB67AE85).astype(np.int32))
    HI16 = np.int32(0xFFFF)

    def shr(a, k):
        return jax.lax.shift_right_logical(a, np.int32(k))

    def mulhi32(a, b):
        al = a & HI16
        ah = shr(a, 16)
        bl = b & HI16
        bh = shr(b, 16)
        ll = al * bl
        lh = al * bh
        hl = ah * bl
        hh = ah * bh
        mid = shr(ll, 16) + (lh & HI16) + (hl & HI16)
        return hh + shr(lh, 16) + shr(hl, 16) + shr(mid, 16)

    def philox(c0, c1, c2, c3, k0, k1):
        for r in range(10):
            if r > 0:
                k0 = k0 + W0
                k1 = k1 + W1
            hi0 = mulhi32(M0, c0)
            lo0 = M0 * c0
            hi1 = mulhi32(M1, c2)
            lo1 = M1 * c2
            c0, c1, c2, c3 = hi1 ^ c1 ^ k0, lo1, hi0 ^ c3 ^ k1, lo0
        return c0, c1, c2, c3

    # In-kernel f32 Acklam ppf with literal coefficients — same doubles,
    # same f32 rounding, same op order as rng.norm_ppf(., float32), so the
    # outputs are bit-identical (asserted in main()).
    A = [np.float32(v) for v in rng._ACKLAM_A]
    B = [np.float32(v) for v in rng._ACKLAM_B]
    C = [np.float32(v) for v in rng._ACKLAM_C]
    D = [np.float32(v) for v in rng._ACKLAM_D]
    P_LOW = rng._P_LOW  # python float thresholds, as in norm_ppf

    def ppf_f32(p):
        pc = jnp.clip(p, np.float32(1e-38), np.float32(1.0 - 6e-8))
        one = np.float32(1.0)
        q = jnp.where(pc < 0.5, pc, one - pc)
        # tail arm
        s = jnp.sqrt(-2.0 * jnp.log(q))
        numt = ((((C[0] * s + C[1]) * s + C[2]) * s + C[3]) * s + C[4]) * s + C[5]
        dent = (((D[0] * s + D[1]) * s + D[2]) * s + D[3]) * s + np.float32(1.0)
        t = numt / dent
        tail = jnp.where(pc < 0.5, t, -t)
        # central arm
        qq = pc - np.float32(0.5)
        r = qq * qq
        numc = ((((A[0] * r + A[1]) * r + A[2]) * r + A[3]) * r + A[4]) * r + A[5]
        denc = (((B[0] * r + B[1]) * r + B[2]) * r + B[3]) * r + B[4]
        mid = qq * numc / (denc * r + np.float32(1.0))
        in_tail = (pc < P_LOW) | (pc > 1.0 - P_LOW)
        return jnp.where(in_tail, tail, mid)

    inv32 = np.float32(1.0 / 4294967296.0)

    def i32_to_f32_u(w):
        """i32 lane holding uint32 bits -> float32 of the UNSIGNED value,
        bit-identical to a direct u32->f32 convert: split into two halves
        that are each EXACT in f32 (hi < 2^24, lo < 2^8) so the one rounding
        in the sum reproduces round-to-nearest-even of the unsigned value.
        """
        hi = shr(w, 8).astype(jnp.float32)
        lo = (w & np.int32(0xFF)).astype(jnp.float32)
        return hi * np.float32(256.0) + lo

    def kernel(k0_ref, k1_ref, o0, o1, o2, o3):
        # Everything stays 2D (tile, blocks) — Mosaic supports neither
        # minor-dim reshapes nor rank changes in-kernel, and u32 div/mod
        # legalizes through i64 (also unsupported), so the column index
        # rides the GRID (one program per (sim-tile, col)) and the 4
        # cipher words leave as four separate planes for XLA to interleave
        # into row order outside (one fused relayout pass, counted in the
        # measured time). Keys arrive pre-shaped (tile, 1) and broadcast.
        shape = (tile, blocks)
        col = jnp.zeros(shape, jnp.int32) + pl.program_id(1)
        c0 = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        k0 = jnp.broadcast_to(k0_ref[:], shape)
        k1 = jnp.broadcast_to(k1_ref[:], shape)
        w0, w1, w2, w3 = philox(
            c0,
            col,
            jnp.full_like(c0, np.int32(CLASS_XNORM)),
            jnp.full_like(c0, np.int32(np.uint32(TAG).astype(np.int32))),
            k0,
            k1,
        )
        for ref, w in ((o0, w0), (o1, w1), (o2, w2), (o3, w3)):
            u = (i32_to_f32_u(w) + np.float32(0.5)) * inv32
            ref[0] = ppf_f32(u)

    # Output planes are (cols, sims, blocks) so the block's trailing dims
    # (tile, blocks) satisfy Mosaic's (8k, 128k-or-full) tiling rule:
    # tile % 8 == 0 and blocks == the full minor dimension.
    grid = (sims // tile, cols)
    plane = jax.ShapeDtypeStruct((cols, sims, blocks), jnp.float32)
    spec = pl.BlockSpec((1, tile, blocks), lambda i, c: (c, i, c * 0))
    fill_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i, c: (i, c * 0)),
            pl.BlockSpec((tile, 1), lambda i, c: (i, c * 0)),
        ],
        out_specs=[spec, spec, spec, spec],
        out_shape=[plane, plane, plane, plane],
        interpret=interpret,
    )

    @jax.jit
    def fill(base_seed):
        sim_ids = jnp.arange(sims, dtype=jnp.uint32)
        k0, k1 = jax.vmap(lambda s: rng.sim_key(base_seed, s))(sim_ids)
        # bitcast to i32 outside the kernel (XLA-side, free): the kernel
        # runs the cipher on i32 lanes
        k0 = jax.lax.bitcast_convert_type(k0, jnp.int32)
        k1 = jax.lax.bitcast_convert_type(k1, jnp.int32)
        planes = fill_p(k0[:, None], k1[:, None])
        z = jnp.stack(
            [w.transpose(1, 0, 2) for w in planes], axis=-1
        ).reshape(sims, cols, rows_pad)
        return z[:, :, :rows]

    return fill


def bench(fn, seed, repeats=5, amortize=1):
    """Median wall time of one fill. ``amortize`` > 1 loops the fill inside
    ONE jitted dispatch (summing a checksum so only a scalar leaves the
    device) — on the tunneled chip a single dispatch costs ~25-30 ms, which
    swamps the kernel itself unless amortized away."""
    out = fn(seed)
    jax.block_until_ready(out)  # compile + warm the single-shot program

    if amortize > 1:
        k = amortize

        @jax.jit
        def looped(s):
            def body(i, acc):
                z = fn(s + i.astype(jnp.uint32))
                return acc + jnp.sum(z)

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        jax.block_until_ready(looped(seed))  # compile + warm
        times = []
        for r in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(looped(seed + 1 + r))
            times.append(time.perf_counter() - t0)
        return statistics.median(times) / k, out

    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(seed + 1 + r))
        times.append(time.perf_counter() - t0)
    return statistics.median(times), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sims", type=int, default=4096)
    ap.add_argument("--rows", type=int, default=200)
    ap.add_argument("--cols", type=int, default=5)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--interpret", action="store_true",
                    help="run the Pallas arm in interpret mode (CPU "
                         "correctness check; timings meaningless)")
    ap.add_argument("--amortize", type=int, default=20,
                    help="fills per dispatch (tunnel dispatch ~25-30 ms "
                         "dominates a single fill; 1 = raw dispatch timing)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/mcpower_tpu_jax_cache")

    jnp_fill = make_jnp_fill(args.sims, args.rows, args.cols)
    pallas_fill = make_pallas_fill(args.sims, args.rows, args.cols, args.tile,
                                   interpret=args.interpret)

    k = 1 if args.interpret else args.amortize
    t_jnp, out_jnp = bench(jnp_fill, jnp.uint32(2137), amortize=k)
    t_pal, out_pal = bench(pallas_fill, jnp.uint32(2137), amortize=k)

    a = np.asarray(out_jnp[:, :, : args.rows])
    b = np.asarray(out_pal)
    bit_identical = np.array_equal(a, b)

    n_vals = args.sims * args.rows * args.cols
    print(f"shape: {args.sims} sims x {args.cols} cols x {args.rows} rows "
          f"({n_vals/1e6:.1f}M normals), {k} fills/dispatch")
    print(f"jnp/XLA   : {t_jnp*1e3:8.2f} ms  ({n_vals/t_jnp/1e9:.2f} Gnormals/s)")
    print(f"pallas    : {t_pal*1e3:8.2f} ms  ({n_vals/t_pal/1e9:.2f} Gnormals/s)")
    print(f"speedup   : {t_jnp/t_pal:.2f}x  bit_identical={bit_identical}")
    if not bit_identical:
        diff = np.abs(a - b)
        print(f"  max |diff| = {diff.max()}  (n mismatched = {(diff>0).sum()})")


if __name__ == "__main__":
    main()
