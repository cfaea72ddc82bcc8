"""Required-N search: find_sample_size scans an N range, fits the power
curve, and reports the crossing with a Monte-Carlo CI.

Parity: reference ports/py/examples/02_sample_size.py.
"""

from mcpower_tpu import MCPower

# A tutoring-program evaluation: what N detects the program effect?
model = MCPower("math_score = program + prior_score")
model.set_effects("program=0.35, prior_score=0.4")
model.set_variable_type("program=binary")
model.set_simulations(1000).set_seed(7)

# Default target power is 80%; set_power changes the crossing threshold.
model.set_power(0.90)

# The search evaluates every grid N from ONE simulation budget (common
# random numbers), so the curve is smooth and the crossing fit is tight.
print(">>> model.find_sample_size(from_size=50, to_size=400)")
result = model.find_sample_size(from_size=50, to_size=400)

# Programmatic: required N per test as a nullable-Int64 frame.
print("\n>>> result.to_dataframe()")
print(result.to_dataframe().to_string(index=False))
