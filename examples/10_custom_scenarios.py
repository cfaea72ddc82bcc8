"""Custom robustness scenarios: tuning the realistic/doomer perturbation
knobs with set_scenario_configs.

Parity: reference ports/py/examples/10_custom_scenarios.py.
"""

from mcpower_tpu import MCPower

# A field experiment whose real-world data will be messier than the clean
# defaults: heavier outcome tails, noisier correlations, drifting ICCs.
model = MCPower("yield_kg = irrigation + soil_quality")
model.set_effects("irrigation=0.4, soil_quality=0.3")
model.set_variable_type("irrigation=binary")
model.set_simulations(800).set_seed(31)

# The built-in envelope: optimistic (assumptions hold) / realistic / doomer.
print(">>> default scenarios")
model.find_power(sample_size=200, scenarios=True)

# Sharpen the stress test: more predictor-distribution swaps and stronger
# heterogeneity in the doomer arm; the realistic arm gets mild
# heteroskedasticity. Unknown keys raise — the knob set is the contract.
model.set_scenario_configs(
    {
        "realistic": {"heteroskedasticity_ratio": 2.5},
        "doomer": {
            "heterogeneity": 0.5,
            "distribution_change_prob": 1.0,
            "correlation_noise_sd": 0.3,
        },
    }
)
print("\n>>> custom scenario knobs")
model.find_power(sample_size=200, scenarios=True)
