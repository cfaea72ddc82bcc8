"""Mixed models: random intercepts for clustered designs, ICC, and sizing
by clusters vs cluster size.

Parity: reference ports/py/examples/08_mixed_models.py.
"""

from mcpower_tpu import MCPower

# Students nested in classrooms: does a teaching method raise test scores,
# given that students who share a classroom are correlated?
# `(1|classroom)` declares the random intercept in the formula.
model = MCPower("score = method + ses + (1|classroom)", family="lme")
model.set_effects("method=0.4, ses=0.3")
model.set_variable_type("method=binary")

# ICC 0.15: 15% of residual variance lives between classrooms.
# n_clusters fixes the number of classrooms; total N is divided among them.
model.set_cluster("classroom", ICC=0.15, n_clusters=30)
model.set_simulations(600).set_seed(23)

print(">>> model.find_power(sample_size=600)  # 30 classrooms x 20 students")
model.find_power(sample_size=600)

# More, smaller clusters beat fewer, bigger ones at the same total N —
# between-cluster information is what the treatment effect rides on.
print("\n>>> same N in 10 classrooms of 60")
model.set_cluster("classroom", ICC=0.15, n_clusters=10)
model.find_power(sample_size=600)

print("\n>>> required N at 30 classrooms")
model.set_cluster("classroom", ICC=0.15, n_clusters=30)
model.find_sample_size(from_size=200, to_size=900, target_test="method")
