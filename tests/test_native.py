"""Native host kernels: C++/ctypes fast paths equal the Python references."""

import numpy as np
import pytest

from mcpower_tpu import native


def _py_fixed_alloc(probs, n):
    p = np.asarray(probs, dtype=np.float64)
    p = p / p.sum()
    counts = np.zeros(len(p), dtype=np.int64)
    out = np.empty(n, dtype=np.int32)
    for i in range(n):
        g = int(np.argmax(p * (i + 1) - counts))
        out[i] = g
        counts[g] += 1
    return out


def _py_pava(y):
    means, lens = [], []
    for v in y:
        means.append(float(v))
        lens.append(1)
        while len(means) >= 2 and means[-2] > means[-1]:
            m, l = means.pop(), lens.pop()
            means[-1] = (means[-1] * lens[-1] + m * l) / (lens[-1] + l)
            lens[-1] += l
    return np.repeat(means, lens)


def test_native_builds_and_matches_python():
    out = native.fixed_alloc([0.7, 0.3], 500)
    if out is None:
        pytest.skip("native toolchain unavailable; python fallback in use")
    np.testing.assert_array_equal(out, _py_fixed_alloc([0.7, 0.3], 500))
    rs = np.random.RandomState(1)
    for _ in range(5):
        k = rs.randint(2, 7)
        probs = rs.dirichlet(np.ones(k))
        n = int(rs.randint(10, 400))
        np.testing.assert_array_equal(
            native.fixed_alloc(probs, n), _py_fixed_alloc(probs, n)
        )


def test_native_pava_matches_python():
    if native.pava([1.0]) is None:
        pytest.skip("native toolchain unavailable")
    rs = np.random.RandomState(2)
    for _ in range(10):
        y = rs.normal(size=rs.randint(2, 60)).cumsum() + rs.normal(
            scale=0.5, size=1
        )
        np.testing.assert_allclose(native.pava(y), _py_pava(y), atol=1e-12)


def test_engine_paths_use_identical_results():
    from mcpower_tpu.engine.datagen import fixed_allocation_codes
    from mcpower_tpu.orchestrator.crossing import pava as pava_entry

    np.testing.assert_array_equal(
        fixed_allocation_codes([0.5, 0.3, 0.2], 100),
        _py_fixed_alloc([0.5, 0.3, 0.2], 100),
    )
    y = [0.1, 0.3, 0.25, 0.5, 0.45, 0.9]
    np.testing.assert_allclose(pava_entry(y), _py_pava(y), atol=1e-12)
