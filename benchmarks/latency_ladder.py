"""Deployment-batch latency ladder: p50 per 30-step DDIM chunk vs batch.

Every recorded ddim30 number so far is at B=1024 robots — the THROUGHPUT
saturation point (BENCH_r03 headline). But the north star also states a
LATENCY contract: "<10 ms p50 per 30-step DDIM action chunk"
(BASELINE.md), and the reference's deployment runs ONE robot per GPU with
a 200 ms replan budget (reference ml/inference/ros.py:156-159). The chunk
kernel's measured floor is per-robot MXU issue-rate-bound
(docs/perf_notes.md "Whole-chunk fused sampler"), so its time should be
~proportional to the batch: small deployment batches should come in far
under the 59 ms B=1024 period. This ladder records that curve.

Measurement validity (CLAUDE.md): the tunnel adds a ~15-35 ms round trip
to EVERY call, which at B=64 would dwarf the quantity being measured.
Protocol: for each batch size run TWO chained-scan variants (K_hi and
K_lo replan periods inside one jitted call), each timed over `iters`
calls with freshly materialized distinct carries and a did-it-run
checksum; the RTT-free per-period time is
(median_hi - median_lo) / (K_hi - K_lo). The raw K_hi per-period number
(RTT-inclusive, i.e. conservative) is recorded alongside.

Run (real TPU, one client at a time):
    python benchmarks/latency_ladder.py --batches 16,64,256 --out /tmp/lat.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_batch(args, batch: int, steps: int, distilled: bool) -> dict:
    import jax
    import jax.numpy as jnp

    from soccerdiffusion_tpu.config import ModelConfig
    from soccerdiffusion_tpu.data import Normalizer
    from soccerdiffusion_tpu.diffusion import make_schedule
    from soccerdiffusion_tpu.inference import RolloutEngine
    from soccerdiffusion_tpu.inference.controller import make_controller_batch

    from soccerdiffusion_tpu.models import DiffusionPolicy

    cfg = ModelConfig(
        num_joints=20,
        hidden_dim=128,
        trajectory_prediction_length=10,
        action_context_length=100,
        joint_state_context_length=100,
        imu_context_length=100,
        use_images=False,
        use_gamestate=True,
        num_action_history_encoder_layers=2,
        num_imu_encoder_layers=2,
        joint_state_encoder_layers=2,
        num_decoder_layers=4,
        encoder_patch_size=1,
        compute_dtype="bfloat16",
    )
    model = DiffusionPolicy(cfg)
    engine = RolloutEngine(
        model, make_schedule(1000), Normalizer.identity(cfg.num_joints),
        num_inference_steps=steps, distilled=distilled,
        fused=False if args.cpu_smoke else "chunk",
        fused_block_robots=args.block,
        fused_encoder=not args.cpu_smoke,
        fused_encoder_block_robots=args.encoder_block,
        replan_every=args.replan_every,
        solver=args.solver,
    )
    carry0 = engine.init(batch, jax.random.key(0))
    init_batch = make_controller_batch(cfg, carry0.controller)
    variables = model.init(
        jax.random.key(1), init_batch,
        jnp.zeros((batch, 10, 20)), jnp.zeros((batch,), jnp.int32),
    )

    # Chain length scaled so the K_hi call carries >=~250 ms of device work
    # (tunnel RTT <15% raw, and eliminated entirely by the difference).
    # The distilled student is ~5x faster per period than ddim30, so its
    # estimate scales by steps to keep the work-per-call target.
    est_period_ms = max(0.05, args.est_b1024_ms * batch / 1024.0
                        * (steps if distilled else 30) / 30.0)
    k_hi = max(8, min(args.max_chain, int(round(250.0 / est_period_ms))))
    k_lo = max(2, k_hi // 4)

    results = {}
    for name, k in (("hi", k_hi), ("lo", k_lo)):
        rollout = engine.make_rollout_fn(num_chunks=k, jit=True)
        t0 = time.perf_counter()
        # per-K rng keys: the tunnel result-caches identical input
        # buffers, so no timed or warmup call may share buffers with
        # another (CLAUDE.md; same scheme as bench.py)
        _, chunks = rollout(variables, engine.init(batch, jax.random.key(7 + k)))
        jax.block_until_ready(chunks)
        log(f"B={batch} K={k}: compile+first {time.perf_counter() - t0:.1f}s")
        carries = [engine.init(batch, jax.random.key(100 + 17 * k + i))
                   for i in range(args.iters)]
        jax.block_until_ready(carries)
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            _, chunks = rollout(variables, carries[i])
            jax.block_until_ready(chunks)
            times.append(time.perf_counter() - t0)
            log(f"  B={batch} K={k} iter {i}: {times[-1] * 1e3:.1f} ms "
                f"(checksum {float(jnp.sum(chunks)):.6e})")
        if min(times) * 1e3 < max(0.05, 0.002 * batch) * k:
            log(f"SUSPECT TIMINGS at B={batch} K={k}: sub-floor, invalid")
            raise SystemExit(3)
        results[name] = (k, statistics.median(times))

    (k_hi, t_hi), (k_lo, t_lo) = results["hi"], results["lo"]
    raw_ms = t_hi / k_hi * 1e3
    diff_ms = (t_hi - t_lo) / (k_hi - k_lo) * 1e3
    period_ms, protocol = diff_ms, f"chain-differenced(K={k_hi},{k_lo})"
    if diff_ms <= 0 or diff_ms > raw_ms * 1.05:
        log(f"differencing unstable at B={batch} (diff {diff_ms:.3f} vs raw "
            f"{raw_ms:.3f}); falling back to the raw number")
        period_ms, protocol = raw_ms, f"raw(K={k_hi})"
    from soccerdiffusion_tpu.diffusion import solver_label

    label = "distilled1" if distilled else solver_label(args.solver, steps)
    row = {
        "sampler": label, "batch_robots": batch,
        "replan_every_ticks": engine.replan_every,
        "p50_replan_period_ms": round(period_ms, 3),
        "p50_raw_rtt_inclusive_ms": round(raw_ms, 3),
        "timing_protocol": protocol,
        "k_hi": k_hi, "k_lo": k_lo,
        "chunks_per_sec_per_chip": round(batch / (period_ms / 1e3), 1),
    }
    log(f"RESULT {json.dumps(row)}")
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="16,64,256")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--solver", type=str, default="ddim",
                   help="reverse-process solver for the non-distilled rows "
                        "(ddim | dpmpp; diffusion/dpm_solver.py)")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--block", type=int, default=16)
    p.add_argument("--encoder-block", type=int, default=32)
    p.add_argument("--max-chain", type=int, default=256)
    p.add_argument("--replan-every", type=int, default=None,
                   help="receding-horizon: replan after this many of the 10 "
                        "predicted ticks (default: all 10, reference 5 Hz "
                        "behavior; 1 = the full 50 Hz control rate)")
    p.add_argument("--est-b1024-ms", type=float, default=59.0,
                   help="measured B=1024 period used to pick chain lengths")
    p.add_argument("--distilled", action="store_true",
                   help="also record the 1-step student at each batch")
    p.add_argument("--out", type=str, default="/tmp/latency_ladder.json")
    p.add_argument("--cpu-smoke", action="store_true",
                   help="logic check on CPU: XLA sampler/encoder paths")
    args = p.parse_args()

    import jax
    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    rows = []
    for b in [int(x) for x in args.batches.split(",") if x]:
        rows.append(measure_batch(args, b, args.steps, False))
        if args.distilled:
            rows.append(measure_batch(args, b, 1, True))
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
