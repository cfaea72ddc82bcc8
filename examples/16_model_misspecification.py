"""Model misspecification: test_formula fits a DIFFERENT model than the one
generating the data — quantifying omitted-variable confounding and the
power cost of padding a model with correlated null covariates.

Parity: reference ports/py/examples/16_model_misspecification.py.
"""

from mcpower_tpu import MCPower

# Students who study more also drink more coffee (corr 0.6). Studying
# genuinely raises the exam score; caffeine does not (effect 0) — it only
# rides along. The generation formula carries both; the correct analysis
# model is score = study.
model = MCPower("score = study + caffeine")
model.set_effects("study=0.3, caffeine=0")
model.set_correlations("corr(study, caffeine)=0.6")
model.set_simulations(1000).set_seed(61)

# 1. Correct model.
print(">>> test_formula='score = study'")
model.find_power(
    sample_size=100, target_test="study", test_formula="score = study"
)

# 2. Omit the true cause, keep its proxy: the innocent caffeine coefficient
#    turns spuriously "significant" — that's confounding, measured.
print("\n>>> test_formula='score = caffeine'  (confounded)")
model.find_power(
    sample_size=100, target_test="caffeine", test_formula="score = caffeine"
)

# 3. Over-specified: the correlated null covariate steals unique variance
#    from study, so study's power drops below the correct-model level while
#    caffeine sits near alpha.
print("\n>>> test_formula='score = study + caffeine'  (over-specified)")
model.find_power(
    sample_size=100,
    target_test="study, caffeine",
    test_formula="score = study + caffeine",
)
