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
