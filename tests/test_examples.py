"""The examples/ directory stays runnable.

Every script must at least compile; two representative ones execute end to
end in-process (01: OLS + scenarios + dataframe export; 09: factor ANOVA +
posthoc Tukey — the two shapes that have caught real regressions). The
mixed-model examples are exercised by their own engine suites and are too
slow to re-run here.
"""

import io
import pathlib
import runpy
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).resolve().parent.parent / "examples").glob("*.py")
)


def test_sixteen_examples_present():
    assert len(EXAMPLES) == 16
    assert [p.name[:2] for p in EXAMPLES] == [f"{i:02d}" for i in range(1, 17)]


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_compiles(path):
    compile(path.read_text(), str(path), "exec")


@pytest.mark.parametrize("name", ["01_basic_power.py", "09_anova_posthoc.py"])
def test_example_runs(name, tmp_path, monkeypatch):
    path = next(p for p in EXAMPLES if p.name == name)
    monkeypatch.chdir(tmp_path)  # any files the example writes land in tmp
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        runpy.run_path(str(path), run_name="__main__")
    finally:
        sys.stdout = old
    out = buf.getvalue()
    assert "MCPower · Power Analysis" in out
