"""Crossed random effects: participants and stimuli as two independent
random sources — (1|subject) + (1|item) — sized with one set_cluster call
per grouping.

Parity: reference ports/py/examples/13_crossed_random_effects.py.
"""

from mcpower_tpu import MCPower

# Word-recognition experiment: every subject sees every item, so subject
# and item effects are CROSSED (not nested).
model = MCPower(
    "rt = frequency + length + (1|subject) + (1|item)", family="lme"
)
model.set_effects("frequency=-0.35, length=0.2")

# Size each grouping separately; its tau^2 is its share of variance.
model.set_cluster("subject", ICC=0.2, n_clusters=40)
model.set_cluster("item", ICC=0.1, n_clusters=25)
model.set_simulations(400).set_seed(37)

print(">>> crossed subjects x items")
model.find_power(sample_size=1000)

# Power for item-side generalization is usually the binding constraint:
# doubling subjects does little once item variance dominates.
print("\n>>> doubling items instead")
model.set_cluster("item", ICC=0.1, n_clusters=50)
model.find_power(sample_size=1000, target_test="frequency")
