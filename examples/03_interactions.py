"""Interaction terms: the `*` factorial shorthand, explicit `:` terms, and
why interaction power lags main-effect power.

Parity: reference ports/py/examples/03_interactions.py.
"""

from mcpower_tpu import MCPower

# Does an ad campaign work differently for new vs returning customers?
# `a*b` expands to a + b + a:b — three terms, three effects.
model = MCPower("revenue = campaign * returning")
model.set_effects("campaign=0.4, returning=0.2, campaign:returning=0.3")
model.set_variable_type("campaign=binary, returning=binary")
model.set_simulations(1000).set_seed(11)

print(">>> model.find_power(sample_size=200)")
model.find_power(sample_size=200)

# The interaction needs a bigger N than a main effect of the same size:
# its regressor is a product of two binaries, so it has less variance.
print("\n>>> explicit ':' only — no factorial expansion")
m2 = MCPower("y = x1 + x2 + x1:x2")
m2.set_effects("x1=0.3, x2=0.3, x1:x2=0.3").set_simulations(1000).set_seed(11)
m2.find_power(sample_size=200, target_test="x1:x2")
