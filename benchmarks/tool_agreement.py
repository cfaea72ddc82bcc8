"""Second independent power-agreement tier: published analytic methods.

The reference commits cross-tool agreement against simr/Superpower/simglm
(/root/reference/benchmarks/power_agreement.py, tools_r.R, harness.R). No R
runtime exists in this image, so the in-image equivalent (VERDICT r4 #7) is
the ANALYTIC tier those tools themselves implement: design-matched power
values computed from the published closed-form/large-sample methods —

* two-sample t            exact noncentral t        (Cohen 1988; pwr.t.test)
* multiple-regression F   Cohen f^2 noncentral F    (Cohen 1988; pwr.f2.test)
* logistic Wald           Demidenko (2007), information by quadrature
* Poisson Wald            Signorini (1991) form, information by quadrature
* cluster-randomized LMM  design-effect (Donner & Klar; Hsieh 2003)

implemented here from the literature with scipy only — no engine imports in
the formula section, so the two columns of the committed artifact
(benchmarks/tool_agreement.json) come from INDEPENDENT code paths.

Each case carries a band: exact-formula cases get MC-width bands; the
large-sample/approximate methods (logit, poisson, design-effect) get wider
documented bands because the method itself is approximate (the same gap
simr-vs-formula comparisons show).

Usage:
    python benchmarks/tool_agreement.py          # run engine + compare + gate
    python benchmarks/tool_agreement.py --save   # refresh the committed JSON
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from scipy import stats

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ARTIFACT = os.path.join(os.path.dirname(__file__), "tool_agreement.json")
N_SIMS = 20_000
ALPHA = 0.05


# ---------------------------------------------------------------------------
# Formula tier (scipy only — no engine code)
# ---------------------------------------------------------------------------

def _nct_two_sided(ncp, df, alpha=ALPHA):
    tcrit = stats.t.ppf(1 - alpha / 2, df)
    left = np.nan_to_num(stats.nct.cdf(-tcrit, df, ncp))
    return float(1 - stats.nct.cdf(tcrit, df, ncp) + left)


def power_t_test(d: float, n_total: int) -> float:
    """Two-sample t via OLS on a 0/1 dummy (Cohen 1988; pwr.t.test with
    n/2 per group): ncp = d sqrt(n/4), df = n - 2."""
    return _nct_two_sided(d * np.sqrt(n_total / 4.0), n_total - 2)


def power_f2_test(betas, n: int) -> float:
    """Cohen's f^2 noncentral-F omnibus power (pwr.f2.test): for
    independent unit-variance predictors and sigma = 1, f^2 = sum beta^2,
    lambda = f^2 (u + v + 1) = f^2 n."""
    u = len(betas)
    v = n - u - 1
    f2 = float(np.sum(np.square(betas)))
    lam = f2 * n
    fcrit = stats.f.ppf(1 - ALPHA, u, v)
    return float(stats.ncf.sf(fcrit, u, v, lam))


def _wald_power_from_info(b1: float, info: np.ndarray, n: int) -> float:
    """Two-sided Wald z power given the per-observation information."""
    se = float(np.sqrt(np.linalg.inv(info)[1, 1] / n))
    z = stats.norm.ppf(1 - ALPHA / 2)
    return float(
        stats.norm.cdf(-z + abs(b1) / se) + stats.norm.cdf(-z - abs(b1) / se)
    )


def _gauss_info(weight_fn, nodes: int = 201, span: float = 8.0) -> np.ndarray:
    """E_x~N(0,1) [ [1,x;x,x^2] w(x) ] by trapezoid quadrature."""
    x = np.linspace(-span, span, nodes)
    phi = stats.norm.pdf(x)
    w = weight_fn(x) * phi
    m0 = np.trapezoid(w, x)
    m1 = np.trapezoid(w * x, x)
    m2 = np.trapezoid(w * x * x, x)
    return np.array([[m0, m1], [m1, m2]])


def power_logit_demidenko(p0: float, b1: float, n: int) -> float:
    """Demidenko (2007): logistic Wald power, x ~ N(0,1), information
    I = E[xx' p(1-p)] evaluated at the alternative."""
    b0 = np.log(p0 / (1 - p0))

    def w(x):
        p = 1.0 / (1.0 + np.exp(-(b0 + b1 * x)))
        return p * (1 - p)

    return _wald_power_from_info(b1, _gauss_info(w), n)


def power_poisson_signorini(rate0: float, b1: float, n: int) -> float:
    """Signorini (1991) form: Poisson Wald power, x ~ N(0,1),
    I = E[xx' exp(b0 + b1 x)] at the alternative."""
    b0 = np.log(rate0)

    def w(x):
        return np.exp(b0 + b1 * x)

    return _wald_power_from_info(b1, _gauss_info(w), n)


def power_lmm_design_effect(beta: float, n_clusters: int, m: int,
                            tau2: float, sigma2: float = 1.0) -> float:
    """Exact GLS z power for a person-level iid N(0,1) covariate under a
    random-intercept model (the design-effect family of Donner & Klar /
    Hsieh 2003, specialized to a within-varying covariate): per cluster
    V = sigma^2 I + tau^2 J, V^{-1} = (1/sigma^2)(I - tau^2/(sigma^2 +
    m tau^2) J); with E[x_i x_j] = delta_ij the expected information per
    row is the V^{-1} diagonal, so

        se^2 = 1 / ( N (1/sigma^2)(1 - tau^2/(sigma^2 + m tau^2)) ).
    """
    n = n_clusters * m
    info_row = (1.0 / sigma2) * (1.0 - tau2 / (sigma2 + m * tau2))
    se = np.sqrt(1.0 / (n * info_row))
    z = stats.norm.ppf(1 - ALPHA / 2)
    return float(
        stats.norm.cdf(-z + abs(beta) / se)
        + stats.norm.cdf(-z - abs(beta) / se)
    )


def formula_cases():
    """[(name, method, formula_power, band, engine_kwargs)]"""
    return [
        (
            "t_test_d05_n100",
            "noncentral t (Cohen 1988 / pwr.t.test)",
            power_t_test(0.5, 100),
            0.015,
            dict(
                grid=[100], var_types=["binary"], var_params=[0.5],
                effects=np.array([0.0, 0.5]), target_cols=[1],
            ),
        ),
        (
            "f2_overall_n120",
            "Cohen f^2 noncentral F (pwr.f2.test)",
            power_f2_test([0.25, 0.15, 0.10], 120),
            0.03,  # fixed-design formula vs random-design MC (O(1/N) gap)
            dict(
                grid=[120], var_types=["normal"] * 3,
                effects=np.array([0.0, 0.25, 0.15, 0.10]),
                target_cols=[1], report_overall=True,
            ),
        ),
        (
            "logit_demidenko_n400",
            "Demidenko (2007) logistic Wald",
            power_logit_demidenko(0.3, 0.35, 400),
            0.03,  # large-sample method
            dict(
                grid=[400], var_types=["normal"],
                effects=np.array([np.log(0.3 / 0.7), 0.35]),
                target_cols=[1], estimator="glm", outcome="binary",
            ),
        ),
        (
            "poisson_signorini_n300",
            "Signorini (1991) Poisson Wald",
            power_poisson_signorini(1.5, 0.15, 300),
            0.03,  # large-sample method
            dict(
                grid=[300], var_types=["normal"],
                effects=np.array([np.log(1.5), 0.15]),
                target_cols=[1], estimator="glm", outcome="count",
            ),
        ),
        (
            "lmm_person_covariate_n200",
            "GLS design-effect z (Donner & Klar / Hsieh 2003 family)",
            power_lmm_design_effect(0.25, 20, 10, tau2=0.25),
            0.03,  # z approximation + REML small-sample gap
            None,  # engine kwargs built in engine_powers (cluster import)
        ),
    ]


# ---------------------------------------------------------------------------
# Engine tier
# ---------------------------------------------------------------------------

def engine_powers(n_sims: int = N_SIMS):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mcpower_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    from mcpower_tpu.engine import batch, lower
    from mcpower_tpu.engine.spec import ClusterStatic

    out = {}
    for name, _method, _p, _band, kw in formula_cases():
        if kw is None:  # LMM case
            kw = dict(
                grid=[200], var_types=["normal"],
                effects=np.array([0.0, 0.25]), target_cols=[1],
                estimator="mle",
                cluster=ClusterStatic(
                    sizing_mode="fixed_clusters", sizing_value=20,
                    tau_squared=0.25,  # icc 0.2 => tau2/(tau2+1) with sigma=1
                ),
            )
        spec, arrays = lower.lower(**kw)
        counts = batch.run_batch(
            spec, jax.device_put(arrays), n_sims, 2137, chunk_size=n_sims
        )
        if name.startswith("f2_"):
            p = float(counts["overall"][0] / counts["n_done"])
        else:
            p = float(counts["sig_unc"][0, 0] / counts["n_done"])
        out[name] = p
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--n-sims", type=int, default=N_SIMS)
    args = ap.parse_args()

    eng = engine_powers(args.n_sims)
    rows = []
    worst = 0.0
    failed = []
    for name, method, p_formula, band, _kw in formula_cases():
        p_eng = eng[name]
        mc_se = float(np.sqrt(p_eng * (1 - p_eng) / args.n_sims))
        diff = abs(p_eng - p_formula)
        tol = band + 3 * mc_se
        ok = diff <= tol
        if not ok:
            failed.append(name)
        worst = max(worst, diff)
        rows.append(
            {
                "case": name,
                "method": method,
                "formula_power": round(p_formula, 5),
                "engine_power": round(p_eng, 5),
                "abs_diff": round(diff, 5),
                "band": band,
                "mc_se": round(mc_se, 5),
                "ok": ok,
            }
        )
        print(
            f"{name:28s} formula={p_formula:.4f} engine={p_eng:.4f} "
            f"|diff|={diff:.4f} band={band}{'' if ok else '  <-- DISAGREES'}"
        )
    artifact = {"n_sims": args.n_sims, "alpha": ALPHA, "cases": rows}
    if args.save:
        with open(ARTIFACT, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"saved {ARTIFACT}")
    if failed:
        sys.exit(f"agreement failures: {failed}")


if __name__ == "__main__":
    main()
