"""Contract wire format (msgpack) + the CLI host: proving the L1 boundary
from outside the Python API (reference engine-architecture.md:5-13)."""

import json
import os

import numpy as np
import pytest

from mcpower_tpu import MCPower
from mcpower_tpu.contract import wire
from mcpower_tpu.contract.types import SimulationContract


def _contracts():
    m = MCPower("y ~ x1 + x2")
    m.set_effects("x1=0.35, x2=0.2")
    m.set_correlations("corr(x1,x2)=0.3")
    m._ensure_applied()  # deferred setters resolve before projection
    return [
        ps.contract
        for ps in m._project(
            ["optimistic"], target_test=None, correction=None,
            wald_se="rx", nagq=1,
        )
    ]


def test_msgpack_roundtrip_identity():
    contracts = _contracts()
    data = wire.pack_many(contracts)
    assert isinstance(data, bytes) and len(data) > 50
    back = wire.unpack_many(data)
    assert len(back) == len(contracts)
    for a, b in zip(contracts, back):
        assert a.to_dict() == b.to_dict()


def test_wire_additive_evolution():
    """Unknown keys are ignored; missing keys default (serde-default parity,
    contract.rs:13-15)."""
    import msgpack

    c = _contracts()[0]
    d = c.to_dict()
    d["future_field"] = {"x": 1}
    d["estimator"]["future_knob"] = 7
    del d["max_failed_fraction"]
    back = SimulationContract.from_dict(
        msgpack.unpackb(msgpack.packb(d, use_bin_type=True), raw=False)
    )
    assert back.max_failed_fraction == 0.1
    assert back.estimator.kind == c.estimator.kind


def test_cli_validate_and_run_roundtrip(tmp_path):
    """File -> validate -> run -> JSON result tree, all through __main__."""
    from mcpower_tpu.__main__ import main

    contracts = _contracts()
    path = str(tmp_path / "contracts.msgpack")
    wire.dump(contracts, path)

    assert main(["validate", path]) == 0

    out_path = str(tmp_path / "result.json")
    rc = main([
        "run", path, "--n", "150", "--n-sims", "300",
        "--seed", "7", "--out", out_path,
    ])
    assert rc == 0
    with open(out_path) as f:
        tree = json.load(f)
    res = tree["optimistic"]
    assert res["n_sims"] == 300
    assert res["sample_sizes"] == [150]
    assert len(res["powers"]["uncorrected"][0]) == 2
    assert 0.0 <= res["powers"]["uncorrected"][0][0] <= 1.0

    # CLI result equals the library API result for the same seed/spec
    m = MCPower("y ~ x1 + x2")
    m.set_effects("x1=0.35, x2=0.2").set_correlations("corr(x1,x2)=0.3")
    m.set_simulations(300)
    lib = m.find_power(sample_size=150, seed=7, verbose=False)
    assert lib["powers"]["uncorrected"] == res["powers"]["uncorrected"]


def test_cli_invalid_contract_fails(tmp_path):
    from mcpower_tpu.__main__ import main

    c = _contracts()[0]
    c.test.alpha = 2.0  # invariant 15
    path = str(tmp_path / "bad.msgpack")
    wire.dump(c, path)
    assert main(["validate", path]) == 1


def test_cli_worker_pool_merge_exact(tmp_path):
    """Two CLI workers on disjoint --sim-offset ranges + the merge verb
    reproduce a one-shot run's counters EXACTLY (global sim-id addressing;
    reference merge boundary merge.rs:26 reachable from its wasm host)."""
    from mcpower_tpu.__main__ import main

    contracts = _contracts()
    path = str(tmp_path / "contracts.msgpack")
    wire.dump(contracts, path)

    # One-shot ground truth: 100 sims.
    one = str(tmp_path / "one.json")
    assert main(["run", path, "--n", "120", "--n-sims", "100",
                 "--seed", "11", "--out", one]) == 0

    # Worker parts: [0, 60) and [60, 100) of the SAME seed.
    p0 = str(tmp_path / "p0.json")
    p1 = str(tmp_path / "p1.json")
    assert main(["run", path, "--n", "120", "--n-sims", "60",
                 "--seed", "11", "--out", p0]) == 0
    assert main(["run", path, "--n", "120", "--n-sims", "40",
                 "--seed", "11", "--sim-offset", "60", "--out", p1]) == 0

    merged_path = str(tmp_path / "merged.json")
    assert main(["merge", p0, p1, "--out", merged_path]) == 0

    with open(one) as f:
        ref = json.load(f)["optimistic"]
    with open(merged_path) as f:
        merged = json.load(f)["optimistic"]
    assert merged["n_sims"] == 100
    for key in ("success_counts_uncorrected", "success_counts_corrected",
                "converged_counts"):
        assert merged[key] == ref[key], key
    assert merged["powers"]["uncorrected"] == ref["powers"]["uncorrected"]
    assert merged["ci_corrected"] == ref["ci_corrected"]


def test_cli_merge_rejects_mismatched_labels(tmp_path):
    from mcpower_tpu.__main__ import main

    a = str(tmp_path / "a.json")
    b = str(tmp_path / "b.json")
    with open(a, "w") as f:
        json.dump({"optimistic": {}}, f)
    with open(b, "w") as f:
        json.dump({"doomer": {}}, f)
    with pytest.raises(SystemExit):
        main(["merge", a, b, "--out", str(tmp_path / "m.json")])
