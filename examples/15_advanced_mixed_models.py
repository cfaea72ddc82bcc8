"""Advanced mixed designs: random slopes, nested groupings, a cluster-level
GLMM treatment, and random-effect scenario stress-testing. Each section is
self-contained.

Parity: reference ports/py/examples/15_advanced_mixed_models.py.
"""

import numpy as np

from mcpower_tpu import MCPower

# -- 1. Random slopes: the treatment effect itself varies by school --------
m1 = MCPower("score = coaching + (1|school)", family="lme")
m1.set_effects("coaching=0.4")
m1.set_variable_type("coaching=binary")
# random_slopes lets each school carry its own coaching effect;
# slope_variance sizes that variation, slope_intercept_corr ties it to the
# school's baseline level.
m1.set_cluster(
    "school",
    ICC=0.12,
    n_clusters=30,
    random_slopes=["coaching"],
    slope_variance=0.05,
    slope_intercept_corr=0.3,
)
m1.set_simulations(300).set_seed(43)
print(">>> random slopes")
m1.find_power(sample_size=600)

# -- 2. Nested groupings: students in classrooms in schools ----------------
m2 = MCPower("score = method + (1|school/classroom)", family="lme")
m2.set_effects("method=0.35")
m2.set_variable_type("method=binary")
# the child grouping is addressed as "school:classroom"; n_per_parent
# nests it inside school rather than crossing the two
m2.set_cluster("school", ICC=0.08, n_clusters=12)
m2.set_cluster("school:classroom", ICC=0.1, n_clusters=48, n_per_parent=4)
m2.set_simulations(300).set_seed(47)
print("\n>>> nested school/classroom")
m2.find_power(sample_size=720)

# -- 3. Cluster-level GLMM treatment ---------------------------------------
m3 = MCPower("adopted = program + (1|village)", family="logit")
m3.set_effects(f"program={np.log(1.9):.4f}")
m3.set_variable_type("program=binary")
m3.set_baseline_probability(0.25)
m3.set_cluster(
    "village", ICC=0.1, n_clusters=30, cluster_level_vars=["program"]
)
m3.set_simulations(250).set_seed(53)
print("\n>>> village-level program, binary adoption")
m3.find_power(sample_size=900)

# -- 4. Random-effect robustness: what if the REs aren't Gaussian? ---------
m4 = MCPower("y = x + (1|site)", family="lme")
m4.set_effects("x=0.4")
m4.set_cluster("site", ICC=0.15, n_clusters=25)
m4.set_simulations(300).set_seed(59)
# doomer swaps the RE distribution heavy-tailed and jitters the ICC.
m4.set_scenario_configs(
    {"doomer": {"random_effect_df": 4, "icc_noise_sd": 0.3}}
)
print("\n>>> RE-distribution stress test")
m4.find_power(sample_size=500, scenarios=True)
