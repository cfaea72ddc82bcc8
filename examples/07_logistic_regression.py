"""Logistic regression power: family='logit', baseline probability, and
reading effects as odds ratios.

Parity: reference ports/py/examples/07_logistic_regression.py.
"""

import numpy as np

from mcpower_tpu import MCPower

# Which factors predict whether a patient responds to treatment (yes/no)?
model = MCPower("responded = dose + age + prior_treatment", family="logit")

# Effects are log-odds-ratios. log(1.8) ≈ 0.59: dose multiplies the odds of
# response by 1.8 per SD. The report echoes each effect's OR.
model.set_effects(
    f"dose={np.log(1.8):.4f}, age={np.log(0.85):.4f}, "
    f"prior_treatment={np.log(1.4):.4f}"
)
model.set_variable_type("prior_treatment=binary")

# The baseline response probability anchors the intercept — power depends
# on it strongly (rare outcomes carry little information).
model.set_baseline_probability(0.3)
model.set_simulations(1000).set_seed(17)

print(">>> model.find_power(sample_size=400)")
model.find_power(sample_size=400)

# A rarer outcome, same ORs: power drops.
print("\n>>> baseline probability 0.08")
model.set_baseline_probability(0.08)
model.find_power(sample_size=400)

print("\n>>> required N at baseline 0.3")
model.set_baseline_probability(0.3)
model.find_sample_size(from_size=150, to_size=800, target_test="dose")
