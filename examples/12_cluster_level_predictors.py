"""Cluster-level predictors: a fixed effect measured once per group gets a
1/sqrt(n_clusters) standard error, not 1/sqrt(N) — declare it with
cluster_level_vars or the design silently overstates power.

Parity: reference ports/py/examples/12_cluster_level_predictors.py.
"""

from mcpower_tpu import MCPower

# Multi-site trial where TRAINING is assigned per site (not per patient).
model = MCPower("outcome = training + severity + (1|site)", family="lme")
model.set_effects("training=0.4, severity=0.3")
model.set_variable_type("training=binary")

# cluster_level_vars pins training to the site level: constant within each
# site, varying only across the 24 sites.
model.set_cluster(
    "site", ICC=0.1, n_clusters=24, cluster_level_vars=["training"]
)
model.set_simulations(600).set_seed(29)

print(">>> site-level training, 24 sites")
model.find_power(sample_size=480)

# The WRONG model — training varying per patient — looks far better
# powered. The difference is the whole point of this example.
wrong = MCPower("outcome = training + severity + (1|site)", family="lme")
wrong.set_effects("training=0.4, severity=0.3")
wrong.set_variable_type("training=binary")
wrong.set_cluster("site", ICC=0.1, n_clusters=24)
wrong.set_simulations(600).set_seed(29)
print("\n>>> (misdeclared) patient-level training")
wrong.find_power(sample_size=480, target_test="training")

# Adding sites helps a cluster-level effect; adding patients barely does.
print("\n>>> required N with 48 sites")
model.set_cluster(
    "site", ICC=0.1, n_clusters=48, cluster_level_vars=["training"]
)
model.find_sample_size(from_size=240, to_size=960, target_test="training")
