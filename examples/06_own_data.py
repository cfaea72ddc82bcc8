"""Driving power analysis from your own pilot data: upload_data keeps the
empirical marginals and correlations; get_effects_from_data recovers
standardized effects you can paste into set_effects.

Parity: reference ports/py/examples/06_own_data.py.
"""

import numpy as np

from mcpower_tpu import MCPower

# Fabricate a small "pilot study" (in practice: a dict of columns, a pandas
# DataFrame, or a CSV path).
rng = np.random.default_rng(0)
n = 120
stress = rng.normal(size=n)
support = 0.5 * stress + rng.normal(size=n) * np.sqrt(0.75)
exercise = (rng.uniform(size=n) < 0.4).astype(int)
wellbeing = -0.4 * stress + 0.3 * support + 0.25 * exercise + rng.normal(size=n)

pilot = {
    "stress": stress,
    "support": support,
    "exercise": exercise,
    "wellbeing": wellbeing,
}

model = MCPower("wellbeing = stress + support + exercise")
model.set_simulations(800).set_seed(3)

# mode='partial' (default): uploaded marginals ride the Gaussian copula;
# correlations are measured from the data. mode='strict' bootstraps whole
# rows instead, exactly preserving the empirical joint.
model.upload_data(pilot)

# Recover standardized effects by fitting the model to the pilot bytes with
# the SAME estimator kernels the simulation uses (the mirror contract).
effects = model.get_effects_from_data("wellbeing")
model.set_effects(effects)

print("\n>>> power at the pilot-estimated effects")
model.find_power(sample_size=200)

print("\n>>> required N for the planned confirmatory study")
model.find_sample_size(from_size=100, to_size=600)
