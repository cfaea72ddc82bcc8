"""Clustered logistic (GLMM): binary outcome + random intercept — patients
nested in clinics, power for a treatment log-odds effect.

Parity: reference ports/py/examples/14_clustered_logistic.py.
"""

import numpy as np

from mcpower_tpu import MCPower

# Multi-clinic trial, binary recovery outcome. family='logit' + (1|clinic)
# makes this a GLMM (Laplace-approximate marginal likelihood).
model = MCPower("recovered = treatment + severity + (1|clinic)", family="logit")

# log(2.0): treatment doubles the odds of recovery.
model.set_effects(f"treatment={np.log(2.0):.4f}, severity={np.log(0.8):.4f}")
model.set_variable_type("treatment=binary")
model.set_baseline_probability(0.35)

# For logit GLMMs the ICC lives on the latent logistic scale
# (tau^2 / (tau^2 + pi^2/3)).
model.set_cluster("clinic", ICC=0.08, n_clusters=25)
model.set_simulations(300).set_seed(41)

print(">>> model.find_power(sample_size=750)")
model.find_power(sample_size=750)

print("\n>>> required N")
model.find_sample_size(from_size=300, to_size=1200, target_test="treatment")
