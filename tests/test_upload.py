"""Pilot-data path: detection, NORTA marginals, strict bootstrap, recovery."""

import numpy as np
import pytest

import jax.numpy as jnp

from mcpower_tpu import MCPower
from mcpower_tpu.data.upload import (
    UploadError,
    detect_column_kind,
    prepare_upload,
    spearman_latent,
)
from mcpower_tpu.engine import datagen


def _pilot(n=400, seed=0):
    rs = np.random.RandomState(seed)
    x1 = rs.gamma(2.0, 2.0, size=n)  # right-skewed continuous
    x2 = 0.5 * (x1 - x1.mean()) / x1.std() + rs.normal(size=n)  # correlated
    b = (rs.uniform(size=n) < 0.35).astype(float)
    g = rs.choice([1, 2, 3], size=n, p=[0.5, 0.3, 0.2]).astype(float)
    y = 0.4 * (x1 - x1.mean()) / x1.std() + 0.3 * b + rs.normal(size=n)
    return {"x1": x1, "x2": x2, "b": b, "g": g, "y": y}


def test_type_detection():
    d = _pilot()
    assert detect_column_kind(np.asarray(d["x1"]))[0] == "continuous"
    assert detect_column_kind(np.asarray(d["b"]))[0] == "binary"
    assert detect_column_kind(np.asarray(d["g"]))[0] == "factor"
    with pytest.raises(UploadError, match="constant"):
        detect_column_kind(np.ones(50))


def test_prepare_standardizes_and_measures():
    up = prepare_upload(_pilot())
    assert abs(up.columns["x1"].values.mean()) < 1e-12
    assert abs(up.columns["x1"].values.std() - 1.0) < 1e-12
    assert up.columns["b"].kind == "binary"
    assert abs(up.columns["b"].param - 0.35) < 0.05
    assert up.columns["g"].n_levels == 3
    r = up.measured_correlations[("x1", "x2")]
    assert 0.25 < r < 0.55  # latent scale of the induced correlation


def test_spearman_latent_recovers_gaussian_r():
    rs = np.random.RandomState(3)
    z = rs.multivariate_normal([0, 0], [[1, 0.6], [0.6, 1]], size=5000)
    # monotone transforms leave the latent estimate unchanged
    x = np.exp(z[:, 0])
    y = z[:, 1] ** 3
    assert abs(spearman_latent(x, y) - 0.6) < 0.03


def test_norta_preserves_empirical_marginal():
    d = _pilot()
    m = MCPower("y ~ x1 + b")
    m.set_effects("x1=0.4, b=0.3").set_simulations(50)
    m.upload_data(d, mode="partial")
    ps = m._project(["optimistic"], target_test=None, correction=None,
                    wald_se="rx", nagq=1)[0]
    from mcpower_tpu.engine.adapter import contract_to_lowered

    spec, arrays = contract_to_lowered(ps.contract, [2000])
    X, y, _ = datagen.generate_batch(
        spec, arrays, jnp.uint32(7), jnp.uint32(0),
        jnp.arange(4, dtype=jnp.uint32),
    )
    x1_gen = np.asarray(X)[:, :, 1].reshape(-1)
    # the generated marginal is the standardized pilot marginal: same skew
    pilot_std = (d["x1"] - d["x1"].mean()) / d["x1"].std()
    from scipy import stats

    assert abs(x1_gen.mean()) < 0.05
    assert abs(stats.skew(x1_gen) - stats.skew(pilot_std)) < 0.25
    b_gen = np.asarray(X)[:, :, 2].reshape(-1)
    assert abs(b_gen.mean() - 0.35) < 0.03


def test_strict_bootstrap_rows_come_from_pilot():
    d = _pilot(n=100)
    m = MCPower("y ~ x1 + b")
    m.set_effects("x1=0.4, b=0.3")
    m.upload_data(d, mode="strict")
    ps = m._project(["optimistic"], target_test=None, correction=None,
                    wald_se="rx", nagq=1)[0]
    assert ps.contract.generation.frame.bootstrap
    from mcpower_tpu.engine.adapter import contract_to_lowered

    spec, arrays = contract_to_lowered(ps.contract, [300])
    X, y, _ = datagen.generate_batch(
        spec, arrays, jnp.uint32(7), jnp.uint32(0),
        jnp.asarray([0], dtype=jnp.uint32),
    )
    x1_gen = np.asarray(X)[0, :, 1]
    b_gen = np.asarray(X)[0, :, 2]
    pilot_std = np.sort(
        np.unique(((d["x1"] - d["x1"].mean()) / d["x1"].std()).astype(np.float32))
    )
    # every generated x1 value is an exact pilot value (f32 frame precision)
    assert np.all(np.isin(x1_gen, pilot_std))
    # joint preserved: x1/b pairs must co-occur as in the pilot
    pilot_x32 = ((d["x1"] - d["x1"].mean()) / d["x1"].std()).astype(np.float32)
    pairs_pilot = set(zip(pilot_x32.tolist(), d["b"].tolist()))
    pairs_gen = set(zip(x1_gen.tolist(), b_gen.astype(np.float64).tolist()))
    assert pairs_gen <= pairs_pilot


def test_upload_power_run_end_to_end():
    d = _pilot()
    m = MCPower("y ~ x1 + b")
    m.set_effects("x1=0.35, b=0.3").set_simulations(400)
    m.upload_data(d, mode="partial")
    res = m.find_power(sample_size=150, verbose=False)
    assert 0.5 < res["powers"]["uncorrected"][0][0] <= 1.0


def test_get_effects_from_data():
    d = _pilot(n=2000, seed=5)
    m = MCPower("y ~ x1 + b")
    m.upload_data(d, mode="partial")
    s = m.get_effects_from_data("y", verbose=False)
    eff = dict(kv.split("=") for kv in s.replace(" ", "").split(","))
    assert abs(float(eff["x1"]) - 0.4) < 0.08
    assert abs(float(eff["b"]) - 0.3) < 0.12


def test_recover_mirror_contract_ols():
    """Recovered effects must be EXACTLY the engine kernel's estimate on the
    same bytes (reference introspect.rs:174 fit_provided_data), and that
    estimate must agree with an independent lstsq to OLS parity tolerance."""
    from mcpower_tpu.data.recover import recover_effects
    from mcpower_tpu.data.upload import prepare_upload
    from mcpower_tpu.engine import providedfit
    from mcpower_tpu.specbuilder.variables import VariableRegistry

    d = _pilot(n=500, seed=7)
    up = prepare_upload(d)
    reg = VariableRegistry("y ~ x1 + b + g")
    reg.set_variable_type("g", {"type": "factor", "n_levels": 3})
    eff, diag, _b0 = recover_effects(reg, up, "y", "linear")
    assert "engine kernel" in diag

    # Rebuild the exact design the recover path fits and run the engine
    # kernel directly: values must match bit-for-bit (same code path).
    X = np.column_stack(
        [
            np.ones(up.n_rows),
            up.columns["x1"].values,
            up.columns["b"].values,
            (up.columns["g"].values == 1).astype(np.float64),
            (up.columns["g"].values == 2).astype(np.float64),
        ]
    )
    y = up.columns["y"].values
    beta, converged, _ = providedfit.fit_provided(X, y, "linear")
    assert converged
    got = [eff["x1"], eff["b"], eff["g[2]"], eff["g[3]"]]
    np.testing.assert_array_equal(got, beta[1:])

    # Independent oracle: numpy lstsq at OLS parity tolerance.
    ref = np.linalg.lstsq(X, y, rcond=None)[0]
    np.testing.assert_allclose(beta, ref, rtol=1e-10, atol=1e-12)


def test_recover_mirror_contract_logit():
    """The logit recover path runs the engine's IRLS; an independent scipy
    ML fit must agree to GLM parity tolerance (BASELINE.md rel <= 1e-4)."""
    from scipy import optimize

    from mcpower_tpu.engine import providedfit

    rs = np.random.RandomState(3)
    n = 800
    x = rs.normal(size=n)
    eta = -0.4 + 0.7 * x
    yb = (rs.uniform(size=n) < 1.0 / (1.0 + np.exp(-eta))).astype(float)
    X = np.column_stack([np.ones(n), x])

    beta, converged, diag = providedfit.fit_provided(X, yb, "logit")
    assert converged and "IRLS" in diag

    def nll(b):
        e = X @ b
        return (np.logaddexp(0, e) - yb * e).sum()

    ref = optimize.minimize(
        nll, np.zeros(2), method="BFGS", options={"gtol": 1e-10}
    ).x
    np.testing.assert_allclose(beta, ref, rtol=1e-4, atol=1e-6)


def test_get_effects_matches_engine_capture_end_to_end():
    """MCPower.get_effects_from_data output == the engine kernel's fit on the
    same standardized bytes, through the public API."""
    from mcpower_tpu.data.upload import prepare_upload
    from mcpower_tpu.engine import providedfit

    d = _pilot(n=600, seed=11)
    m = MCPower("y ~ x1 + b")
    m.upload_data(d, mode="partial")
    s = m.get_effects_from_data("y", verbose=False)
    eff = dict(kv.split("=") for kv in s.replace(" ", "").split(","))

    up = prepare_upload({k: d[k] for k in ("x1", "b", "y")})
    X = np.column_stack(
        [np.ones(up.n_rows), up.columns["x1"].values, up.columns["b"].values]
    )
    beta, _, _ = providedfit.fit_provided(X, up.columns["y"].values, "linear")
    # the API rounds for display; compare at its printed precision
    for name, b in zip(("x1", "b"), beta[1:]):
        assert abs(float(eff[name]) - b) < 5e-4


def test_type_lock_conflict():
    d = _pilot()
    m = MCPower("y ~ x1 + b")
    m.set_variable_type("x1=binary")  # conflicts with continuous data
    with pytest.raises(UploadError, match="declared binary"):
        m.upload_data(d)


def test_min_rows_guard():
    tiny = {k: v[:10] for k, v in _pilot().items()}
    m = MCPower("y ~ x1")
    with pytest.raises(UploadError, match="rows"):
        m.upload_data(tiny)


# ---------------------------------------------------------------------------
# Reference detection-rule parity (golden upload_type_detection cases) +
# string factors with data-value labels
# ---------------------------------------------------------------------------


def test_detection_golden_rules():
    """The reference's detection rule set (upload.py:150, pinned by its
    tests/golden/upload_type_detection.json): string columns are factors
    with sorted labels; 2-distinct numerics are binary; few-distinct
    numerics need the rows/distinct ratio; many-distinct integers stay
    continuous."""
    rs = np.random.RandomState(0)
    # 60 distinct continuous values
    kind, _ = detect_column_kind(rs.normal(size=60))
    assert kind == "continuous"
    # 0/1 -> binary
    kind, _ = detect_column_kind(np.asarray([0, 1] * 30, dtype=float))
    assert kind == "binary"
    # numeric levels with high reuse -> factor, int-rendered labels
    vals = np.asarray([4, 4, 6, 6, 8, 8] * 10, dtype=float)
    kind, info = detect_column_kind(vals)
    assert kind == "factor" and info["labels"] == ["4", "6", "8"]
    # string column -> factor, sorted labels
    s = np.asarray(["USA", "Japan", "Europe"] * 20, dtype=object)
    kind, info = detect_column_kind(s)
    assert kind == "factor" and info["labels"] == ["Europe", "Japan", "USA"]
    # 20 distinct over 60 rows: ratio 3 < 15 -> continuous even though ints
    many = np.asarray(list(range(20)) * 3, dtype=float)
    kind, _ = detect_column_kind(many)
    assert kind == "continuous"
    # NON-integral few-level codes are still factors (no integrality rule)
    half = np.asarray([1.5, 2.5, 3.5] * 20)
    kind, info = detect_column_kind(half)
    assert kind == "factor" and info["labels"] == ["1.5", "2.5", "3.5"]


def test_string_factor_upload_end_to_end():
    """String factor columns ride the whole pipeline: codes for the engine,
    data-value labels for effect names / posthoc ('with uploaded data the
    labels are the data values')."""
    rs = np.random.RandomState(5)
    n = 150
    region = np.asarray(["USA", "Japan", "Europe"], dtype=object)[
        rs.randint(0, 3, size=n)
    ]
    x = rs.normal(size=n)
    y = rs.normal(size=n)
    m = MCPower("y ~ region + x")
    m.set_simulations(200).set_seed(3)
    m.upload_data({"region": region, "x": x, "y": y})
    # labels become the addressable effect names (sorted: Europe=reference)
    assert m.effect_names[:2] == ["region[Japan]", "region[USA]"]
    m.set_effects("region[Japan]=0.4, region[USA]=0.2, x=0.3")
    res = m.find_power(
        sample_size=120, target_test="all, all-contrasts", verbose=False
    )
    assert res["target_labels"][:2] == ["region[Japan]", "region[USA]"]
    assert set(res["posthoc"]["region"]) == {
        "region[Europe] vs region[Japan]",
        "region[Europe] vs region[USA]",
        "region[Japan] vs region[USA]",
    }


def test_upload_type_lock_survives_later_setters():
    """_apply rebuilds the registry; uploaded detection must be re-locked
    (regression: a set_effects AFTER upload_data silently dropped the
    detected factor levels/labels)."""
    rs = np.random.RandomState(7)
    n = 120
    g = np.asarray(["lo", "mid", "hi"], dtype=object)[rs.randint(0, 3, n)]
    m = MCPower("y ~ g")
    m.set_simulations(150)
    m.upload_data({"g": g, "y": rs.normal(size=n)})
    m.set_effects("g[lo]=0.5, g[mid]=0.3")  # sorted labels: hi = reference
    m.set_seed(9)  # another setter round-trip
    res = m.find_power(sample_size=100, verbose=False)
    assert res["target_labels"] == ["g[lo]", "g[mid]"]


def test_csv_path_upload(tmp_path):
    rs = np.random.RandomState(11)
    n = 80
    path = tmp_path / "pilot.csv"
    with open(path, "w") as fh:
        fh.write("x,arm,y\n")
        for i in range(n):
            fh.write(
                f"{rs.normal():.6f},{'treat' if i % 2 else 'ctrl'},"
                f"{rs.normal():.6f}\n"
            )
    m = MCPower("y ~ x + arm")
    m.set_simulations(100)
    m.upload_data(str(path))
    up = m._uploaded
    assert up.columns["x"].kind == "continuous"
    # 2-level STRING column is a factor (string branch precedes binary)
    assert up.columns["arm"].kind == "factor"
    assert up.columns["arm"].labels == ["ctrl", "treat"]


def test_declared_numeric_on_string_column_raises():
    s = np.asarray(["a", "b", "c"] * 20, dtype=object)
    with pytest.raises(UploadError, match="non-numeric"):
        prepare_upload(
            {"g": s, "x": np.random.RandomState(0).normal(size=60)},
            declared_types={"g": "normal"},
        )


# ---------------------------------------------------------------------------
# Clustered recovery: random-intercept variance + ICC from pilot data
# ---------------------------------------------------------------------------


def test_clustered_linear_recovery_icc(capsys):
    """Linear mixed recovery on unbalanced clusters: beta near an
    independent GLS truth and ICC near the generating value (reference
    clustered get_effects_from_data: fixed effects + tau^2 -> ICC with a
    set_cluster snippet)."""
    rs = np.random.RandomState(11)
    m_cl, icc_true = 40, 0.25
    tau2 = icc_true / (1 - icc_true)  # sigma2 = 1
    sizes = rs.randint(8, 25, size=m_cl)
    cid = np.repeat(np.arange(m_cl), sizes)
    n = cid.size
    x = rs.normal(size=n)
    u = rs.normal(size=m_cl) * np.sqrt(tau2)
    y = 0.5 * x + u[cid] + rs.normal(size=n)

    m = MCPower("y ~ x + (1|site)", family="lme")
    m.set_simulations(50)
    m.upload_data({"x": x, "site": cid.astype(float), "y": y})
    out = m.get_effects_from_data("y")
    text = capsys.readouterr().out
    eff = dict(p.split("=") for p in out.split(", "))
    # y is z-scored on upload; the standardized slope shrinks by sd(y)
    sd_y = np.sqrt(0.25 + tau2 + 1.0)
    assert abs(float(eff["x"]) - 0.5 / sd_y) < 0.08
    assert "Estimated ICC" in text and "set_cluster" in text
    icc_line = [l for l in text.splitlines() if "Estimated ICC" in l][0]
    icc_hat = float(icc_line.split("ICC=")[1].split(",")[0])
    assert abs(icc_hat - icc_true) < 0.12


def test_clustered_logit_recovery_latent_icc(capsys):
    rs = np.random.RandomState(5)
    m_cl = 50
    tau2 = 1.0  # latent ICC = 1 / (1 + pi^2/3) ~ 0.233
    sizes = rs.randint(10, 30, size=m_cl)
    cid = np.repeat(np.arange(m_cl), sizes)
    n = cid.size
    x = rs.normal(size=n)
    u = rs.normal(size=m_cl) * np.sqrt(tau2)
    eta = 0.8 * x + u[cid]
    y = (rs.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(float)

    m = MCPower("y ~ x + (1|clinic)", family="logit")
    m.set_simulations(50)
    m.upload_data({"x": x, "clinic": cid.astype(float), "y": y})
    out = m.get_effects_from_data("y")
    text = capsys.readouterr().out
    eff = dict(p.split("=") for p in out.split(", "))
    assert abs(float(eff["x"]) - 0.8) < 0.15  # conditional log-odds scale
    assert "latent log-odds scale" in text
    icc_line = [l for l in text.splitlines() if "Estimated ICC" in l][0]
    icc_hat = float(icc_line.split("ICC=")[1].split(",")[0])
    icc_true = tau2 / (tau2 + np.pi ** 2 / 3)
    assert abs(icc_hat - icc_true) < 0.10


def test_clustered_recovery_requires_grouping_column():
    rs = np.random.RandomState(0)
    m = MCPower("y ~ x + (1|site)", family="lme")
    m.set_simulations(50)
    m.upload_data({"x": rs.normal(size=60), "y": rs.normal(size=60)})
    with pytest.raises(ValueError, match="grouping column"):
        m.get_effects_from_data("y")


# ---------------------------------------------------------------------------
# Review-pass regressions (round-3 adversarial review)
# ---------------------------------------------------------------------------


def test_numeric_levels_contrast_resolves_by_label():
    """Factor uploaded with data values 0/1/2: labels are '0','1','2', so
    'g[0]' is the baseline and 'g[1]' is a DUMMY — the old numeric-
    reference shortcut silently treated g[1] as the baseline (wrong
    contrast, no error)."""
    rs = np.random.RandomState(2)
    n = 150
    g = rs.randint(0, 3, size=n).astype(float)
    m = MCPower("y ~ g")
    m.set_simulations(200).set_seed(4)
    m.upload_data({"g": g, "y": rs.normal(size=n)})
    m.set_effects("g[1]=0.6, g[2]=0.6")
    res = m.find_power(
        sample_size=120, target_test="g[1] vs g[0], g[1] vs g[2]",
        verbose=False,
    )
    by = dict(zip(res["target_labels"], res["powers"]["uncorrected"][0]))
    # g[1] vs baseline carries the 0.6 effect; g[1] vs g[2] is a true null
    assert by["g[1] vs g[0]"] > 0.5
    assert by["g[1] vs g[2]"] < 0.2
    # and the string-label baseline form resolves instead of erroring
    rs2 = np.random.RandomState(3)
    region = np.asarray(["USA", "Japan", "Europe"], dtype=object)[
        rs2.randint(0, 3, n)
    ]
    m2 = MCPower("y ~ region")
    m2.set_simulations(100).set_seed(5)
    m2.upload_data({"region": region, "y": rs2.normal(size=n)})
    m2.set_effects("region[Japan]=0.5")
    r2 = m2.find_power(
        sample_size=100, target_test="region[Japan] vs region[Europe]",
        verbose=False,
    )
    assert r2["target_labels"] == ["region[Japan] vs region[Europe]"]


def test_numeric_column_with_na_markers_raises():
    rs = np.random.RandomState(0)
    vals = [1.2, 3.4, "NA", 5.6] * 20
    with pytest.raises(UploadError, match="missing values"):
        prepare_upload({"x": vals, "y": rs.normal(size=80)})
    # pure-string categories named 'none' stay a legitimate factor
    cats = ["none", "low", "high"] * 30
    up = prepare_upload({"g": np.asarray(cats, dtype=object),
                         "y": rs.normal(size=90)})
    assert up.columns["g"].labels == ["high", "low", "none"]


def test_post_upload_variable_type_overrides_detection():
    """An explicit set_variable_type AFTER upload_data must win over the
    detection lock (it was a silent no-op)."""
    rs = np.random.RandomState(9)
    n = 120
    g = rs.randint(1, 4, size=n).astype(float)  # detected factor
    m = MCPower("y ~ g")
    m.set_simulations(100)
    m.upload_data({"g": g, "y": rs.normal(size=n)})
    assert m._registry.var_info("g")["type"] == "factor"
    m.set_variable_type("g=normal")
    m.set_effects("g=0.3")
    m._ensure_applied()
    assert m._registry.var_info("g")["type"] == "normal"
    # a PRE-upload declaration also wins — via the declared-type lock
    # (prepare_upload coerces the uploaded column to the declared type)
    m2 = MCPower("y ~ g")
    m2.set_variable_type("g=normal")
    m2.set_simulations(100)
    m2.upload_data({"g": g, "y": rs.normal(size=n)})
    m2._ensure_applied()
    assert m2._registry.var_info("g")["type"] == "normal"
    assert m2._uploaded.columns["g"].kind == "continuous"


def test_metacharacter_labels_fall_back_to_integers():
    import warnings as _w

    rs = np.random.RandomState(1)
    n = 90
    g = np.asarray(["a=b", "c, d", "e"], dtype=object)[rs.randint(0, 3, n)]
    m = MCPower("y ~ g")
    m.set_simulations(100)
    with _w.catch_warnings(record=True) as w:
        _w.simplefilter("always")
        m.upload_data({"g": g, "y": rs.normal(size=n)})
    assert any("positional labels" in str(x.message) for x in w)
    assert m.effect_names == ["g[2]", "g[3]"]  # addressable again


def test_recovered_baseline_probability_note(capsys):
    rs = np.random.RandomState(8)
    n = 400
    x = rs.normal(size=n)
    eta = -0.85 + 0.5 * x  # baseline p = sigmoid(-0.85) ~ 0.30
    y = (rs.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(float)
    m = MCPower("y ~ x", family="logit")
    m.set_simulations(50)
    m.upload_data({"x": x, "y": y})
    m.get_effects_from_data("y")
    text = capsys.readouterr().out
    assert "set_baseline_probability(" in text
    p_line = [l for l in text.splitlines() if "baseline probability" in l][0]
    p_hat = float(p_line.split("set_baseline_probability(")[1].split(")")[0])
    assert abs(p_hat - 0.30) < 0.06


def test_reuse_fraction_formula_matches_monte_carlo():
    """reuse_fraction's closed form (reference model.py:85-97) equals the
    simulated expected share of pilot rows drawn more than once in one
    strict-bootstrap dataset."""
    from mcpower_tpu.data.upload import reuse_fraction

    rs = np.random.RandomState(11)
    U, N = 40, 120
    reps = 4000
    draws = rs.randint(0, U, size=(reps, N))
    multi = np.zeros(reps)
    for r in range(reps):
        counts = np.bincount(draws[r], minlength=U)
        multi[r] = np.mean(counts >= 2)
    mc = 100.0 * multi.mean()
    assert abs(reuse_fraction(U, N) - mc) < 1.0
    assert reuse_fraction(0, 10) == 0.0
    assert reuse_fraction(1, 10) == 100.0


def test_strict_reuse_note_printed_verbose(capsys):
    """Strict-bootstrap runs print the informational row-reuse note at
    verbose time (reference model.py:2035-2043)."""
    rs = np.random.RandomState(5)
    d = {"x1": rs.normal(size=80), "y": rs.normal(size=80)}
    m = MCPower("y ~ x1")
    m.set_effects("x1=0.4").set_simulations(50)
    m.upload_data(d, mode="strict")
    m.find_power(sample_size=100, verbose=True)
    out = capsys.readouterr().out
    assert "[strict bootstrap] N=100, uploaded rows U=80" in out
    assert "% of rows reused per simulated dataset" in out
    # non-strict modes stay silent
    m2 = MCPower("y ~ x1")
    m2.set_effects("x1=0.4").set_simulations(50)
    m2.upload_data(d, mode="partial")
    m2.find_power(sample_size=100, verbose=True)
    assert "[strict bootstrap]" not in capsys.readouterr().out


def test_matrix_upload_with_column_names(capsys):
    """upload_data accepts a bare 2-D matrix + column names and prints the
    detection summary at verbose time (reference model.py:841-847,908-912)."""
    rs = np.random.RandomState(0)
    arr = np.column_stack([rs.normal(size=60), rs.normal(size=60)])
    m = MCPower("y ~ x1")
    m.upload_data(arr, ["x1", "y"])
    out = capsys.readouterr().out
    assert "Uploaded 60 rows, 2 columns." in out
    assert "x1: continuous (matched)" in out
    assert m._uploaded.n_rows == 60
    # shape mismatch is a loud error
    from mcpower_tpu.data.upload import UploadError

    with pytest.raises(UploadError, match="shape"):
        MCPower("y ~ x1").upload_data(arr, ["x1", "y", "z"])
    # verbose=False stays silent
    m2 = MCPower("y ~ x1")
    m2.upload_data(arr, ["x1", "y"], verbose=False)
    assert capsys.readouterr().out == ""


def test_cluster_level_vars_guards():
    """cluster_level_vars rejects the grouping variable itself and
    uploaded-bound predictors (reference test_set_cluster.py:296-333)."""
    rs = np.random.RandomState(1)
    arr = np.column_stack([rs.normal(size=60), rs.normal(size=60)])

    m = MCPower("y ~ x1 + (1|school)", family="lme")
    m.set_effects("x1=0.3")
    with pytest.raises(ValueError, match="grouping variable"):
        m.set_cluster("school", ICC=0.2, n_clusters=20,
                      cluster_level_vars=["school"])

    m2 = MCPower("y ~ x1 + (1|school)", family="lme")
    m2.set_effects("x1=0.3")
    m2.upload_data(arr, ["x1", "y"], verbose=False)
    with pytest.raises(ValueError, match="uploaded"):
        m2.set_cluster("school", ICC=0.2, n_clusters=20,
                       cluster_level_vars=["x1"])
    with pytest.raises(TypeError):
        m2.set_cluster("school", ICC=0.2, n_clusters=20, between_vars=["x1"])


def test_cluster_level_vars_upload_order_independent():
    """The uploaded-column guard fires regardless of set_cluster/upload_data
    call order (review finding: the setter-side check alone was bypassed by
    set_cluster-then-upload)."""
    rs = np.random.RandomState(2)
    m = MCPower("y ~ x1 + (1|school)", family="lme")
    m.set_effects("x1=0.3").set_simulations(10)
    m.set_cluster("school", ICC=0.2, n_clusters=10, cluster_level_vars=["x1"])
    m.upload_data({"x1": rs.normal(size=60), "y": rs.normal(size=60)},
                  verbose=False)
    with pytest.raises(ValueError, match="uploaded"):
        m.find_power(100, verbose=False)


def test_uploaded_factors_not_flagged_confounded():
    """Identical-proportion factors bound to uploaded data generate from the
    pilot frame, not the shared Hamilton walk — the deterministic-confounding
    preflight must stay silent and the fit must converge."""
    import warnings as _w

    rs = np.random.RandomState(2)
    lv = np.array(["a", "b", "c"])
    m = MCPower("y ~ g1 + g2")
    with _w.catch_warnings(record=True) as w:
        _w.simplefilter("always")
        m.upload_data(
            {"g1": lv[rs.randint(0, 3, 90)], "g2": lv[rs.randint(0, 3, 90)],
             "y": rs.normal(size=90)},
            verbose=False,
        )
        m.set_effects("g1[b]=0.4").set_simulations(10)
        res = m.find_power(90, verbose=False)
    assert not any("confounded" in str(x.message) for x in w)
    assert res["convergence_rate"] == [1.0]
