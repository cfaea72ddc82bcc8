"""Predictor correlations: pairwise strings, full matrices, and the power
cost of collinearity.

Parity: reference ports/py/examples/04_correlations.py.
"""

import numpy as np

from mcpower_tpu import MCPower

# What predicts job satisfaction? Pay, autonomy, and commute all correlate.
model = MCPower("satisfaction = pay + autonomy + commute")
model.set_effects("pay=0.3, autonomy=0.3, commute=-0.2")
model.set_simulations(1000).set_seed(5)

# Pairwise form: only the named pairs deviate from zero.
model.set_correlations("corr(pay, autonomy)=0.4, corr(pay, commute)=0.2")
print(">>> correlated predictors")
model.find_power(sample_size=200)

# Matrix form: one full symmetric PSD matrix (predictor order = formula order).
R = np.array(
    [
        [1.0, 0.4, 0.2],
        [0.4, 1.0, 0.1],
        [0.2, 0.1, 1.0],
    ]
)
model.set_correlations(R)
model.find_power(sample_size=200, verbose=False)

# Collinearity costs power: the same effects with independent predictors.
print("\n>>> same effects, independent predictors")
indep = MCPower("satisfaction = pay + autonomy + commute")
indep.set_effects("pay=0.3, autonomy=0.3, commute=-0.2")
indep.set_simulations(1000).set_seed(5)
indep.find_power(sample_size=200)
