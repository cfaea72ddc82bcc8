"""One-way ANOVA with post-hoc pairwise contrasts and Tukey HSD.

The omnibus F answers "do the group means differ at all?"; the post-hoc
table answers "which pairs differ?". Running the pairwise family once
uncorrected and once under Tukey HSD shows the family-wise power cost.

Parity: reference ports/py/examples/09_anova_posthoc.py.
"""

from mcpower_tpu import MCPower

# Three-arm dose trial: placebo / low / high.
model = MCPower("pain_reduction = dose")

# Three roughly equal arms; level 1 (placebo) is the reference.
model.set_variable_type("dose=(factor,0.34,0.33,0.33)")

# Per-arm shifts vs placebo. The low-vs-high contrast is the 0.3 gap
# between these — visible only in the post-hoc table.
model.set_effects("dose[2]=0.5, dose[3]=0.8")
model.set_simulations(800).set_seed(9)

# 1. Omnibus F + every pairwise contrast, uncorrected.
print(">>> target_test='overall, all-contrasts'")
model.find_power(sample_size=130, target_test="overall, all-contrasts")

# 2. Tukey HSD across the pairwise family — compare the corrected column.
print("\n>>> correction='tukey'")
model.find_power(
    sample_size=130, target_test="overall, all-contrasts", correction="tukey"
)
