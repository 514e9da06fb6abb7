"""Calibrate the per-FUSION fixed cost inside one jitted TPU program.

Motivation: the flagship step's depth-0 remainder shows ~100+ fusions at
~0.1-0.2 ms each whose theoretical HBM traffic is ~30 us — and a skeleton
lane (benchmarks/mfu_remainder_ablate.sh rskel) spends 3.7 ms on <0.5 ms of
traffic. Round 1 claimed ~0.1-0.2 ms/op, which was retracted as per-CALL
RTT (CLAUDE.md); this bench measures the per-fusion cost PROPERLY: one
call, K dependent elementwise stages over a fixed-size tensor, stages
separated by jax.lax.optimization_barrier so XLA cannot collapse them into
one loop fusion. Slope of time vs K = per-stage cost; compare against the
tensor's pure traffic time to get the fixed overhead.

Protocol per CLAUDE.md benchmark-validity rules: distinct fresh inputs per
timed call, per-call sync via a scalar checksum fetch, differencing across
K removes the tunnel RTT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# ~13 MB bf16 tensor: the size class of the remainder's (B*T, E) passes
ROWS, COLS = 25600, 256
KS = (8, 32, 128)
REPS = 6


def make_fn(k):
    @jax.jit
    def fn(x, a, b):
        y = x
        for _ in range(k):
            y = y * a + b
            # forbid XLA from collapsing the chain into one loop fusion
            y = jax.lax.optimization_barrier(y)
        return jnp.sum(y.astype(jnp.float32))

    return fn


def main():
    dev = jax.devices()[0]
    print(json.dumps({"bench": "fusion_gap", "device": str(dev),
                      "rows": ROWS, "cols": COLS}))
    rng = np.random.default_rng(0)
    results = {}
    for k in KS:
        fn = make_fn(k)
        # fresh distinct operands per rep, pre-materialized on device
        xs = [jax.device_put(jnp.asarray(
            rng.standard_normal((ROWS, COLS)).astype(np.float32) * 1e-3,
            jnp.bfloat16)) for _ in range(REPS + 1)]
        a = jax.device_put(jnp.asarray(1.0002, jnp.bfloat16))
        b = jax.device_put(jnp.asarray(1e-6, jnp.bfloat16))
        jax.block_until_ready(xs)
        float(fn(xs[-1], a, b))  # compile
        t0 = time.perf_counter()
        for i in range(REPS):
            float(fn(xs[i], a, b))  # scalar fetch = per-call sync
        dt = (time.perf_counter() - t0) / REPS
        results[k] = dt
        print(json.dumps({"k": k, "ms_per_call": round(dt * 1e3, 3)}))
    # slope between the largest two K values (RTT and fixed call cost cancel)
    k1, k2 = KS[-2], KS[-1]
    per_stage_us = (results[k2] - results[k1]) / (k2 - k1) * 1e6
    bytes_per_stage = ROWS * COLS * 2 * 2  # read + write bf16
    traffic_us = bytes_per_stage / 819e9 * 1e6  # v5e ~819 GB/s HBM
    print(json.dumps({
        "per_stage_us": round(per_stage_us, 1),
        "pure_traffic_us": round(traffic_us, 1),
        "fixed_overhead_us": round(per_stage_us - traffic_us, 1),
    }))


if __name__ == "__main__":
    main()
