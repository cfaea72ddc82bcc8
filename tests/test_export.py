"""Result export surface: to_dataframe / save_plot / plot / to_latex / to_pdf.

The reference port's result wrappers expose to_dataframe (long-format frame,
ports/py/mcpower/output/results.py:142-161 and 230-271), save_plot (suffix
dispatch, one file per block for raster formats, optional renderer) and
plot (stacked CDN-backed html). Its to_latex/to_pdf are roadmap stubs; here
to_latex is implemented (booktabs table over to_dataframe) and to_pdf
typesets it when a LaTeX engine exists.
"""

import shutil

import pytest

from mcpower_tpu import MCPower
from mcpower_tpu.output.results import PowerResult, SampleSizeResult


def _power_result():
    m = MCPower("y ~ x1 + x2")
    m.set_effects("x1=0.5, x2=0.3").set_simulations(200).set_seed(21)
    return m.find_power(sample_size=120, correction="holm", verbose=False)


def test_power_to_dataframe_reference_columns():
    res = _power_result()
    df = res.to_dataframe()
    # reference column contract: test/scenario/power/ci_lo/ci_hi;
    # correction active => the corrected arm is exported
    assert list(df.columns) == ["test", "scenario", "power", "ci_lo", "ci_hi"]
    assert sorted(df["test"]) == ["x1", "x2"]
    assert set(df["scenario"]) == {"optimistic"}
    for _, r in df.iterrows():
        assert 0.0 <= r["ci_lo"] <= r["power"] <= r["ci_hi"] <= 1.0
    g = res["target_labels"].index("x1")
    assert (
        df.set_index("test").loc["x1", "power"]
        == res["powers"]["corrected"][0][g]
    )


def test_power_to_dataframe_grid_adds_sample_size():
    tree = {
        "target_labels": ["a"],
        "sample_sizes": [50, 100],
        "alpha_correction": "none",
        "powers": {
            "uncorrected": [[0.3], [0.6]],
            "ci_uncorrected": [[[0.2, 0.4]], [[0.5, 0.7]]],
        },
    }
    df = PowerResult(tree).to_dataframe()
    assert list(df.columns) == [
        "test", "scenario", "sample_size", "power", "ci_lo", "ci_hi",
    ]
    assert df["sample_size"].tolist() == [50, 100]
    assert df["power"].tolist() == [0.3, 0.6]


def test_power_to_dataframe_scenarios_long_format():
    m = MCPower("y ~ x1")
    m.set_effects("x1=0.5").set_simulations(150).set_seed(4)
    res = m.find_power(sample_size=100, scenarios=True, verbose=False)
    df = res.to_dataframe()
    assert set(df["scenario"]) == {"optimistic", "realistic", "doomer"}
    assert len(df) == 3  # one target x three scenarios


def test_sample_size_to_dataframe_conventions():
    fitted = {
        "x_fit": {"kind": "fitted", "n_achievable": 130,
                  "ci_lo": 111.2, "ci_hi": 148.9},
        "x_nm": {"kind": "non_monotone", "max_violation": 0.1},
        "x_nr": {"kind": "not_reached", "n_approx": 900},
    }
    tree = {
        "target_labels": ["x_fit", "x_nm", "x_nr"],
        "fitted": fitted,
        "first_achieved": {"x_fit": 140, "x_nm": 180, "x_nr": None},
    }
    df = SampleSizeResult(tree).to_dataframe().set_index("test")
    # fitted: n_achievable + outward-rounded CI ints
    assert df.loc["x_fit", "required_n"] == 130
    assert df.loc["x_fit", "ci_lo"] == 111 and df.loc["x_fit", "ci_hi"] == 149
    # non_monotone: falls back to first_achieved, no CI
    assert df.loc["x_nm", "required_n"] == 180
    assert df.loc["x_nm"][["ci_lo", "ci_hi"]].isna().all()
    # not_reached: NA (sentinel rows have no single integer)
    assert df.loc["x_nr"][["required_n", "ci_lo", "ci_hi"]].isna().all()
    assert str(df["required_n"].dtype) == "Int64"


def test_save_plot_html_stacked_page(tmp_path):
    res = _power_result()
    out = tmp_path / "plots.html"
    res.save_plot(str(out))
    html = out.read_text()
    # stacked page embeds EVERY bundle block (uncorrected + corrected bars)
    assert html.count("vegaEmbed(") == len(res.plots()) >= 2
    assert "vega-lite" in html
    # light-print theme merged into each spec's config
    assert '"background": "#ffffff"' in html


def test_save_plot_theme_none_is_naked(tmp_path):
    res = _power_result()
    out = tmp_path / "naked.html"
    res.save_plot(str(out), theme=None)
    assert '"background": "#ffffff"' not in out.read_text()


def test_save_plot_raster_needs_renderer(tmp_path):
    try:
        import vl_convert  # noqa: F401
        has_vlc = True
    except ImportError:
        has_vlc = False
    res = _power_result()
    if has_vlc:
        res.save_plot(str(tmp_path / "p.svg"))
        assert any(p.suffix == ".svg" for p in tmp_path.iterdir())
    else:
        with pytest.raises(ImportError, match="vl-convert"):
            res.save_plot(str(tmp_path / "p.svg"))


def test_save_plot_unknown_suffix(tmp_path):
    with pytest.raises(ValueError, match="unsupported suffix"):
        _power_result().save_plot(str(tmp_path / "p.docx"))


def test_plot_default_writes_html(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _power_result().plot()
    assert (tmp_path / "find_power.html").exists()


def test_to_latex_booktabs():
    tex = _power_result().to_latex()
    assert tex.startswith("\\begin{tabular}")
    assert "\\toprule" in tex and "\\bottomrule" in tex
    assert "test & scenario & power & ci\\_lo & ci\\_hi" in tex
    assert "x1" in tex


def test_to_pdf_engine_or_clear_error(tmp_path):
    res = _power_result()
    out = tmp_path / "r.pdf"
    if shutil.which("pdflatex") or shutil.which("tectonic"):
        res.to_pdf(str(out))
        assert out.stat().st_size > 0
    else:
        with pytest.raises(RuntimeError, match="LaTeX engine"):
            res.to_pdf(str(out))


def test_four_cross_port_themes_match_reference_config():
    """The theme store is byte-derived from the single-source
    configs/plot-themes.json (config truth data, like the scenario
    presets): exactly the four names, dark-print carrying the documented
    palette."""
    from mcpower_tpu.output import plotting

    assert set(plotting.available_themes()) == {
        "light-print", "dark-print", "light-app", "dark-app"
    }
    dk = plotting._THEMES["dark-print"]
    assert dk["background"] == "#1e1e1e"
    assert dk["range"]["category"][0] == "#56B4E9"
    with pytest.raises(ValueError, match="unknown theme"):
        plotting.apply_theme({}, "sepia")


def test_embedded_json_escapes_script_close():
    """A label containing '</script>' must not terminate the inline script
    tag (page breakage / injection)."""
    from mcpower_tpu.output.plotting import page_html, to_html

    spec = {"data": {"values": [{"test": "</script><b>x</b>"}]}}
    for html in (to_html(spec), page_html({"p": spec})):
        assert "</script><b>" not in html
        assert "<\\/script>" in html


def test_power_bars_carry_target_rule():
    from mcpower_tpu.output.plotting import power_bars

    spec = power_bars(
        {
            "target_labels": ["x"],
            "powers": {
                "uncorrected": [[0.5]],
                "ci_uncorrected": [[[0.4, 0.6]]],
            },
            "target_power": 0.9,
        }
    )
    rule = spec["layer"][-1]
    assert rule["mark"]["type"] == "rule"
    assert rule["data"]["values"] == [{"target": 90.0}]


def test_multi_scenario_sample_size_overlay():
    m = MCPower("y ~ x1")
    m.set_effects("x1=0.5").set_simulations(200).set_seed(8)
    res = m.find_sample_size(
        from_size=40, to_size=200, scenarios=True, n_sims=200, verbose=False
    )
    plots = res.plots()
    assert "power_curves_overlay" in plots
    ov = plots["power_curves_overlay"]
    scens = {r["scenario"] for r in ov["data"]["values"]}
    assert scens == {"optimistic", "realistic", "doomer"}
    enc = ov["layer"][0]["encoding"]
    assert enc["strokeDash"]["field"] == "scenario"


def test_repr_mimebundle_vega_payload():
    """Jupyter mimebundle: the lead plot block, light-print themed, plus
    html and plain-text fallbacks (reference mimebundle contract:
    power -> power block; multi-scenario sample-size -> overlay)."""
    res = _power_result()
    mb = res._repr_mimebundle_()
    vl = mb["application/vnd.vegalite.v5+json"]
    assert vl["config"]["background"] == "#ffffff"  # light-print applied
    assert "power" in vl["description"].lower()
    assert mb["text/plain"].startswith("Power Analysis —")
    assert "<table" in mb["text/html"]

    m = MCPower("y ~ x1")
    m.set_effects("x1=0.5").set_simulations(150).set_seed(8)
    ss = m.find_sample_size(
        from_size=40, to_size=160, scenarios=True, n_sims=150, verbose=False
    )
    vl2 = ss._repr_mimebundle_()["application/vnd.vegalite.v5+json"]
    assert "scenario" in vl2["description"]  # the overlay leads
