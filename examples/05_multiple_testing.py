"""Multiple-testing corrections: Bonferroni / Holm / Benjamini-Hochberg,
their power cost, and corrected required-N.

Parity: reference ports/py/examples/05_multiple_testing.py.
"""

from mcpower_tpu import MCPower

# Screening five candidate biomarkers; two are true nulls (effect = 0).
model = MCPower("response = m1 + m2 + m3 + m4 + m5")
model.set_effects("m1=0.35, m2=0.3, m3=0.25, m4=0, m5=0")
model.set_simulations(1000).set_seed(13)

# Uncorrected: each test at alpha = 0.05 — the family-wise error across
# the two nulls is well above 5%.
print(">>> uncorrected")
model.find_power(sample_size=250)

# Holm (step-down) keeps family-wise error at 5% and dominates Bonferroni.
print("\n>>> correction='holm'")
model.find_power(sample_size=250, correction="holm")

# Benjamini-Hochberg controls the false-discovery rate instead — a weaker
# guarantee, so corrected power sits between uncorrected and Holm.
print("\n>>> correction='benjamini_hochberg'")
model.find_power(sample_size=250, correction="benjamini_hochberg")

# Corrections change required N too.
print("\n>>> corrected sample-size search")
model.find_sample_size(from_size=100, to_size=500, correction="holm")
