"""Power for a simple two-arm study; tours the find_power result object:
auto-printed report, .summary(), .to_dataframe(), and save_plot.

Parity: reference ports/py/examples/01_basic_power.py.
"""

from mcpower_tpu import MCPower

# A sleep-intervention trial: does a wind-down routine improve sleep quality,
# after adjusting for each participant's baseline score?
model = MCPower("sleep_quality = routine + baseline")

# Standardized effects: routine shifts the outcome by 0.5 SD (medium),
# baseline predicts it moderately.
model.set_effects("routine=0.5, baseline=0.3")

# routine is a 0/1 assignment, not a continuous score.
model.set_variable_type("routine=binary")
model.set_simulations(1000).set_seed(42)

# verbose=True (default) prints the full report; the return value is a
# dict-compatible result object.
print(">>> model.find_power(sample_size=120, target_test='routine')")
result = model.find_power(sample_size=120, target_test="routine")

# The long form again, on demand — target_test='all' adds the omnibus row
# and the joint-significance distribution.
print("\n>>> result = model.find_power(sample_size=120, verbose=False)")
result = model.find_power(sample_size=120, verbose=False)
print(result.summary())

# Robustness: rerun under optimistic / realistic / doomer assumption sets.
print("\n>>> model.find_power(sample_size=120, scenarios=True)")
model.find_power(sample_size=120, scenarios=True)

# Programmatic access: tidy frame (test x scenario), ready for pandas.
print("\n>>> result.to_dataframe()")
print(result.to_dataframe().to_string(index=False))

# result.save_plot("power.html") writes a self-contained chart page;
# .svg/.png/.pdf need the optional vl-convert renderer.
