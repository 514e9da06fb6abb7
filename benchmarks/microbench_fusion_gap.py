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

MEASURED RESULT (2026-08-18, v5e through the tunnel): per-stage marginal
cost is ~6-13 us even at 52 MB x 512 barrier-separated stages (k=512 adds
only ~3 ms over k=8, vs ~64 ms of pure HBM traffic) — the compiled HLO
retains all 512 fusions, so XLA's memory-space assignment must be keeping
the chain VMEM-resident across fusion boundaries (effective ~17 TB/s =
VPU/VMEM-class, not HBM-class). CONCLUSION: the depth-0 remainder is NOT
fusion-count-bound; its ~0.1-0.2 ms/op profile comes from real HBM operand
reads (params/optimizer states each touched once) and lane/sublane padding
waste on small proprio shapes. The lever is operand locality + shape
hygiene (e.g. the fused encoder-stack kernel), not fewer fusions.

Size sweep (same day, k<=128 over 0.4-52 MB tensors): every per-stage
slope is inside the +/-26 us call-to-call RTT jitter — even 128 stages
of 52 MB (~16 ms of nominal HBM traffic) do not register in wall time.
The sweep therefore cannot resolve a size dependence below the jitter
floor; the k=512 probe above is the authoritative number.
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

# Size sweep: from the remainder's small proprio tensors up to the ~13 MB
# size class of the (B*T, E) image passes. Fixed per-fusion cost shows up
# as per_stage_us flattening below the traffic line at small sizes.
SIZES = ((1600, 128), (6400, 128), (25600, 256), (51200, 512))
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
    print(json.dumps({"bench": "fusion_gap", "device": str(dev)}))
    rng = np.random.default_rng(0)
    for rows, cols in SIZES:
        results = {}
        for k in KS:
            fn = make_fn(k)
            # fresh distinct operands per rep, pre-materialized on device
            xs = [jax.device_put(jnp.asarray(
                rng.standard_normal((rows, cols)).astype(np.float32) * 1e-3,
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
        # slope between the largest two K values (RTT and fixed cost cancel)
        k1, k2 = KS[-2], KS[-1]
        per_stage_us = (results[k2] - results[k1]) / (k2 - k1) * 1e6
        bytes_per_stage = rows * cols * 2 * 2  # read + write bf16
        traffic_us = bytes_per_stage / 819e9 * 1e6  # v5e ~819 GB/s HBM
        print(json.dumps({
            "rows": rows, "cols": cols,
            "ms_per_call": {k: round(v * 1e3, 3) for k, v in results.items()},
            "per_stage_us": round(per_stage_us, 1),
            "pure_traffic_us": round(traffic_us, 1),
            "fixed_overhead_us": round(per_stage_us - traffic_us, 1),
        }))


if __name__ == "__main__":
    main()
