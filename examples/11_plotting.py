"""Plot output: the Vega-Lite plot bundle, stacked HTML pages, themes, and
per-block file sets for raster formats.

Parity: reference ports/py/examples/11_plotting.py.
"""

from mcpower_tpu import MCPower
from mcpower_tpu.output.plotting import available_themes

model = MCPower("recovery_days = therapy + age")
model.set_effects("therapy=-0.5, age=0.2")
model.set_variable_type("therapy=binary")
model.set_simulations(800).set_seed(19)

power = model.find_power(sample_size=150, correction="holm", verbose=False)
curve = model.find_sample_size(from_size=50, to_size=400, verbose=False)

# The bundle itself: plot-name -> Vega-Lite spec (the cross-host contract —
# the GUI host and the R shim read the same JSON).
print("plot blocks:", list(power.plots()), "+", list(curve.plots()))
print("themes:", available_themes(), "+ None for theme-naked specs")

# .html is dependency-free: ONE stacked self-contained page.
power.save_plot("find_power.html")
curve.save_plot("find_sample_size.html", theme="light-print")

# result.plot() is the one-liner: writes find_power.html / find_sample_size.html.
# Non-HTML suffixes (.svg/.png/.pdf) render per plot block with derived
# names (out.power_bars.svg, ...) and need the optional vl-convert renderer:
# power.save_plot("out.svg")  # ImportError with guidance if not installed
print("wrote find_power.html, find_sample_size.html")
