"""Hand-written-loop baseline tiers + power agreement vs the engine.

The reference substantiates its "100-1000x vs a DIY loop" headline with a
committed multi-tier harness (/root/reference/benchmarks/loops_py.py +
power_agreement.py: naive per-sim loops in NumPy/statsmodels vs the engine,
same designs, speedups and cross-tool power deltas recorded). This is the
TPU build's counterpart: for four BASELINE.json configs it runs

* the ENGINE (jitted batched run on whatever backend jax picked — the TPU
  chip under the driver, CPU elsewhere), and
* a NAIVE PER-SIM PYTHON LOOP (fresh NumPy generation + an off-the-shelf
  fit per replicate: lstsq for OLS, a hand IRLS for logit, a dense-V
  profiled REML with scipy Brent for the LMM — the loop a careful user
  would write without a simulation engine),

then records fits/sec for both, the speedup ratio, and the power estimates
with Wilson CIs. The two samplers share the DGP but not the bitstream, so
power agreement is STATISTICAL: |Δpower| must sit inside the combined MC
error (z ~ 3), which is also asserted — making this file the committed
power-agreement artifact, not just a timing table.

Usage:
    python benchmarks/loops_py.py              # run + print + compare
    python benchmarks/loops_py.py --save       # freeze benchmarks/loops_baseline.json
    python benchmarks/loops_py.py --loop-sims 500   # cheaper loop tier
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT_PATH = os.path.join(os.path.dirname(__file__), "loops_baseline.json")
ALPHA = 0.05
ENGINE_SIMS = {"ols": 10_000, "glm": 10_000, "mle": 4_000}


def _wilson(k: int, n: int):
    p = k / n
    z = 1.959963984540054
    den = 1.0 + z * z / n
    ctr = (p + z * z / (2 * n)) / den
    hw = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return p, (ctr - hw, ctr + hw)


# ---------------------------------------------------------------------------
# case definitions (BASELINE.json configs 1, 2, 3, 4)
# ---------------------------------------------------------------------------

def _cases():
    from mcpower_tpu.engine.spec import ClusterStatic

    cases = {}
    # 1. two-group t-test as OLS: n=100, d=0.5
    cases["ttest_ols"] = dict(
        kind="ols",
        engine=dict(
            grid=[100],
            var_types=["binary"],
            var_params=[0.5],
            effects=np.array([0.0, 0.5]),
            target_cols=[1],
        ),
        n=100,
        beta=np.array([0.0, 0.5]),
        binary=[True],
        corr=None,
    )
    # 2. multiple regression: 5 correlated predictors
    corr5 = np.full((5, 5), 0.3)
    np.fill_diagonal(corr5, 1.0)
    cases["multi5_ols"] = dict(
        kind="ols",
        engine=dict(
            grid=[200],
            var_types=["normal"] * 5,
            corr=corr5,
            effects=np.array([0.0, 0.25, 0.2, 0.15, 0.1, 0.0]),
            target_cols=[1, 2, 3, 4, 5],
        ),
        n=200,
        beta=np.array([0.0, 0.25, 0.2, 0.15, 0.1, 0.0]),
        binary=[False] * 5,
        corr=corr5,
    )
    # 3. logistic GLM via IRLS
    corr2 = np.array([[1.0, 0.3], [0.3, 1.0]])
    cases["logit_irls"] = dict(
        kind="glm",
        engine=dict(
            grid=[200],
            var_types=["normal", "normal"],
            corr=corr2,
            effects=np.array([-0.3, 0.4, 0.3]),
            target_cols=[1, 2],
            estimator="glm",
            outcome="binary",
        ),
        n=200,
        beta=np.array([-0.3, 0.4, 0.3]),
        binary=[False, False],
        corr=corr2,
    )
    # 4. random-intercept LMM (REML)
    cases["lmm_intercept"] = dict(
        kind="mle",
        engine=dict(
            grid=[200],
            var_types=["normal", "normal"],
            corr=corr2,
            effects=np.array([0.0, 0.3, 0.2]),
            target_cols=[1, 2],
            estimator="mle",
            cluster=ClusterStatic(
                sizing_mode="fixed_clusters", sizing_value=20,
                tau_squared=0.25,
            ),
        ),
        n=200,
        beta=np.array([0.0, 0.3, 0.2]),
        binary=[False, False],
        corr=corr2,
        m_clusters=20,
        tau2=0.25,
    )
    return cases


# ---------------------------------------------------------------------------
# the naive per-sim loop tier (pure NumPy/SciPy, fresh draws per sim)
# ---------------------------------------------------------------------------

def _gen_X(rng, n, case):
    k = len(case["binary"])
    if case["corr"] is not None:
        L = np.linalg.cholesky(case["corr"])
        X = rng.standard_normal((n, k)) @ L.T
    else:
        X = rng.standard_normal((n, k))
    for j, isb in enumerate(case["binary"]):
        if isb:
            X[:, j] = (rng.uniform(size=n) < 0.5).astype(float)
    return np.column_stack([np.ones(n), X])


def _loop_ols(rng, case):
    from scipy import stats as sps

    n, beta = case["n"], case["beta"]
    X = _gen_X(rng, n, case)
    y = X @ beta + rng.standard_normal(n)
    XtX = X.T @ X
    b = np.linalg.solve(XtX, X.T @ y)
    resid = y - X @ b
    df = n - X.shape[1]
    s2 = resid @ resid / df
    se = np.sqrt(np.diag(np.linalg.inv(XtX)) * s2)
    tcrit = sps.t.ppf(1 - ALPHA / 2, df)
    return np.abs(b[1:] / se[1:]) > tcrit


def _loop_logit(rng, case):
    from scipy import stats as sps

    n, beta = case["n"], case["beta"]
    X = _gen_X(rng, n, case)
    p = 1.0 / (1.0 + np.exp(-(X @ beta)))
    y = (rng.uniform(size=n) < p).astype(float)
    b = np.zeros(X.shape[1])
    for _ in range(25):
        eta = X @ b
        mu = np.clip(1.0 / (1.0 + np.exp(-eta)), 1e-9, 1 - 1e-9)
        w = mu * (1 - mu)
        z = eta + (y - mu) / w
        XtW = X.T * w
        b_new = np.linalg.solve(XtW @ X, XtW @ z)
        if not np.all(np.isfinite(b_new)):
            return np.zeros(len(beta) - 1, bool)
        if np.max(np.abs(b_new - b)) < 1e-8:
            b = b_new
            break
        b = b_new
    eta = X @ b
    mu = np.clip(1.0 / (1.0 + np.exp(-eta)), 1e-9, 1 - 1e-9)
    w = mu * (1 - mu)
    cov = np.linalg.inv((X.T * w) @ X)
    zcrit = sps.norm.ppf(1 - ALPHA / 2)
    return np.abs(b[1:] / np.sqrt(np.diag(cov)[1:])) > zcrit


def _loop_lmm(rng, case):
    """Naive dense-V profiled REML: Brent over log gamma (= tau2/sigma2),
    each evaluation a full n x n GLS solve — the straightforward loop a
    user writes from the REML formula."""
    from scipy import optimize, stats as sps

    n, beta, m = case["n"], case["beta"], case["m_clusters"]
    X = _gen_X(rng, n, case)
    ids = np.arange(n) % m  # round-robin fixed_clusters layout
    u = rng.standard_normal(m) * math.sqrt(case["tau2"])
    y = X @ beta + u[ids] + rng.standard_normal(n)
    Z = (ids[:, None] == np.arange(m)[None, :]).astype(float)
    ZZt = Z @ Z.T
    p = X.shape[1]
    eye = np.eye(n)

    def reml(log_g):
        V = eye + math.exp(log_g) * ZZt
        cv = np.linalg.cholesky(V)
        Xi = np.linalg.solve(cv, X)
        yi = np.linalg.solve(cv, y)
        XtVX = Xi.T @ Xi
        b = np.linalg.solve(XtVX, Xi.T @ yi)
        r = yi - Xi @ b
        rss = r @ r
        logdet_v = 2.0 * np.log(np.diag(cv)).sum()
        _, logdet_x = np.linalg.slogdet(XtVX)
        return logdet_v + logdet_x + (n - p) * math.log(rss)

    res = optimize.minimize_scalar(reml, bounds=(-12.0, 5.0), method="bounded")
    g = math.exp(res.x)
    V = eye + g * ZZt
    cv = np.linalg.cholesky(V)
    Xi = np.linalg.solve(cv, X)
    yi = np.linalg.solve(cv, y)
    XtVX = Xi.T @ Xi
    b = np.linalg.solve(XtVX, Xi.T @ yi)
    r = yi - Xi @ b
    s2 = (r @ r) / (n - p)
    cov = s2 * np.linalg.inv(XtVX)
    tcrit = sps.t.ppf(1 - ALPHA / 2, n - p)
    return np.abs(b[1:] / np.sqrt(np.diag(cov)[1:])) > tcrit


_LOOP = {"ols": _loop_ols, "glm": _loop_logit, "mle": _loop_lmm}


def run_loop_tier(name, case, n_sims, seed=2137):
    fn = _LOOP[case["kind"]]
    rng = np.random.default_rng(seed)
    hits = np.zeros(len(case["beta"]) - 1, dtype=np.int64)
    t0 = time.perf_counter()
    for _ in range(n_sims):
        hits += fn(rng, case)
    elapsed = time.perf_counter() - t0
    return hits, elapsed


def run_engine_tier(case, n_sims, seed=2137):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mcpower_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    from mcpower_tpu.engine import batch, lower

    spec, arrays = lower.lower(**case["engine"])
    arrays = jax.device_put(arrays)
    batch.run_batch(spec, arrays, n_sims, 1, chunk_size=n_sims)  # warmup
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        counts = batch.run_batch(
            spec, arrays, n_sims, seed + r, chunk_size=n_sims
        )
        times.append(time.perf_counter() - t0)
    return counts, statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--loop-sims", type=int, default=None)
    args = ap.parse_args()

    out = {"alpha": ALPHA, "cases": {}}
    worst_z = 0.0
    for name, case in _cases().items():
        e_sims = ENGINE_SIMS[case["kind"]]
        l_sims = args.loop_sims or (600 if case["kind"] == "mle" else 2000)

        counts, e_time = run_engine_tier(case, e_sims)
        sig = np.asarray(counts["sig_unc"])[0]  # grid point 0, per target
        e_pow, e_ci = _wilson(int(sig[0]), e_sims)

        hits, l_time = run_loop_tier(name, case, l_sims)
        l_pow, l_ci = _wilson(int(hits[0]), l_sims)

        e_fps = e_sims / e_time
        l_fps = l_sims / l_time
        # statistical agreement: |Δ| over combined binomial SE
        se = math.sqrt(
            e_pow * (1 - e_pow) / e_sims + l_pow * (1 - l_pow) / l_sims
        )
        z = abs(e_pow - l_pow) / max(se, 1e-12)
        worst_z = max(worst_z, z)
        rec = {
            "engine_fits_per_s": round(e_fps, 1),
            "engine_sims": e_sims,
            "loop_fits_per_s": round(l_fps, 1),
            "loop_sims": l_sims,
            "speedup": round(e_fps / l_fps, 1),
            "power_engine": round(e_pow, 4),
            "power_loop": round(l_pow, 4),
            "abs_dpower": round(abs(e_pow - l_pow), 4),
            "agreement_z": round(z, 2),
        }
        out["cases"][name] = rec
        print(
            f"{name:14s} engine {e_fps:>10,.0f} fits/s | loop "
            f"{l_fps:>8,.1f} fits/s | speedup {rec['speedup']:>7,.0f}x | "
            f"power {e_pow:.3f} vs {l_pow:.3f} (|Δ|={rec['abs_dpower']:.3f}, "
            f"z={z:.2f})"
        )
    out["max_agreement_z"] = round(worst_z, 2)
    ok = worst_z < 3.5
    print(f"power agreement: max z = {worst_z:.2f} ({'OK' if ok else 'FAIL'})")
    if args.save:
        import jax

        out["backend"] = jax.devices()[0].platform
        with open(OUT_PATH, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"saved to {OUT_PATH}")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
