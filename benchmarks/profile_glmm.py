"""One-shot profiling evidence for the mixed-model arms (VERDICT weak #1).

Captures, for the GLMM and LMM batch programs on the attached device:

* XLA ``cost_analysis`` — model FLOPs and bytes accessed per dispatch,
* measured wall-clock at the throughput-grid shape,
* derived achieved FLOP/s + bandwidth and an MFU estimate against the
  chip's nominal peak (TPU v5e: ~197 TFLOP/s bf16 / ~394 GFLOP/s-class
  for emulated f64 chains — the fit path is f64 by design, so the honest
  metric is achieved bytes/s vs ~819 GB/s HBM and the serialization
  profile, not bf16 MFU),
* a JAX profiler trace under ``/tmp/mcpower_tpu_trace`` for inspection.

Findings are summarised in ARCHITECTURE.md ("Performance notes").

Usage: python benchmarks/profile_glmm.py [--trace]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_SIMS = 4000


def _case(estimator, outcome=None):
    from mcpower_tpu.engine import lower
    from mcpower_tpu.engine.spec import ClusterStatic

    kw = dict(
        grid=[200],
        var_types=["normal", "normal"],
        corr=np.array([[1.0, 0.3], [0.3, 1.0]]),
        effects=np.array(
            [-0.3, 0.3, 0.2] if outcome == "binary" else [0.0, 0.3, 0.2]
        ),
        target_cols=[1, 2],
        estimator=estimator,
        cluster=ClusterStatic(
            sizing_mode="fixed_clusters", sizing_value=20, tau_squared=0.25
        ),
    )
    if outcome:
        kw["outcome"] = outcome
    return lower.lower(**kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true",
                    help="also write a profiler trace to /tmp/mcpower_tpu_trace")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mcpower_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

    from mcpower_tpu.engine import batch

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    for name, (spec, arrays) in [
        ("lmm", _case("mle")),
        ("glmm", _case("glm", "binary")),
    ]:
        arrays = jax.device_put(arrays)
        fn = batch._batch_fn(spec, False)
        seed_lo, seed_hi = batch._split_seed(2137)
        sim_ids = np.arange(N_SIMS, dtype=np.uint32)
        import jax.numpy as jnp

        argv = (arrays, jnp.uint32(seed_lo), jnp.uint32(seed_hi),
                jnp.asarray(sim_ids))
        lowered = fn.lower(*argv)  # _batch_fn returns the jitted program
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        flops = ca.get("flops", float("nan"))
        bytes_acc = ca.get("bytes accessed", float("nan"))

        jax.block_until_ready(compiled(*argv))  # warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(compiled(*argv))
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        print(
            f"{name}: {med*1e3:8.1f} ms | model {flops/1e9:8.2f} GFLOP "
            f"({flops/med/1e12:6.3f} TFLOP/s achieved) | "
            f"{bytes_acc/1e9:7.2f} GB touched ({bytes_acc/med/1e9:7.1f} GB/s)"
        )

        if args.trace and name == "glmm":
            with jax.profiler.trace("/tmp/mcpower_tpu_trace"):
                jax.block_until_ready(compiled(*argv))
            print("trace written to /tmp/mcpower_tpu_trace")


if __name__ == "__main__":
    main()
