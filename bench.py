"""Benchmark: batched closed-loop rollout throughput on one TPU chip.

Workload (BASELINE.json headline metric "action chunks/sec/chip (batched
rollout); p50 30-step DDIM sampling latency"): N simulated robots per chip
run the full perception->plan->act loop — controller buffers, context
encoding, 30-step DDIM action-chunk sampling, chunk feedback, 10 plant
ticks — with the default.yaml proprioceptive+gamestate architecture (h128,
100-step contexts, 10-step chunks).

The default sampler path is the whole-chunk fused Pallas program
(ops/fused_chunk.py, one op per 30-step chunk). Because a cold Mosaic
compile through the tunneled backend can take ~10 min, the default run
tries the fused path in a subprocess with a timeout and falls back to the
plain XLA path if it cannot finish; with a warm persistent cache
(.jax_cache/, populated by earlier runs) it completes in ~2 min.

vs_baseline is measured against the north-star target derived from
BASELINE.json (>=4096 rollouts on a v5e-8 at <10 ms per 30-step chunk
=> 4096/8 robots * 100 chunks/s = 51200 chunks/s/chip). The reference
itself publishes no numbers (BASELINE.md).

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = os.path.join(REPO, ".jax_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(args) -> dict:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE_DIR)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from soccerdiffusion_tpu.config import ModelConfig
    from soccerdiffusion_tpu.data import Normalizer
    from soccerdiffusion_tpu.diffusion import make_schedule
    from soccerdiffusion_tpu.inference import RolloutEngine
    from soccerdiffusion_tpu.inference.controller import make_controller_batch
    from soccerdiffusion_tpu.models import DiffusionPolicy

    log(f"devices: {jax.devices()}")

    cfg = ModelConfig(
        num_joints=20,
        hidden_dim=args.hidden,
        trajectory_prediction_length=10,
        action_context_length=100,
        joint_state_context_length=100,
        imu_context_length=100,
        use_images=False,  # proprioceptive serving loop (images arrive at 10 Hz off the hot path)
        use_gamestate=True,
        num_action_history_encoder_layers=2,
        num_imu_encoder_layers=2,
        joint_state_encoder_layers=2,
        num_decoder_layers=4,
        # reference-sanctioned temporal patching (sim_scratch.yaml:30,
        # encoder/base.py:27): patch 5 cuts context tokens 301 -> 61
        encoder_patch_size=args.patch,
        compute_dtype="bfloat16" if args.bf16 else "float32",
    )
    model = DiffusionPolicy(cfg)
    schedule = make_schedule(1000)
    normalizer = Normalizer.identity(cfg.num_joints)

    fused = {"none": False, "step": True, "chunk": "chunk"}[args.sampler]
    engine = RolloutEngine(
        model, schedule, normalizer,
        num_inference_steps=args.steps, distilled=args.distilled,
        fused=fused, fused_block_robots=args.fused_block,
        fused_encoder=args.fused_encoder,
        fused_encoder_block_robots=args.fused_encoder_block,
        fused_kv_quant=args.kv_quant,
        solver=args.solver,
    )
    carry = engine.init(args.batch, jax.random.key(0))

    init_batch = make_controller_batch(cfg, carry.controller)
    variables = model.init(
        jax.random.key(1), init_batch,
        jnp.zeros((args.batch, 10, 20)), jnp.zeros((args.batch,), jnp.int32),
    )

    # MEASUREMENT VALIDITY (CLAUDE.md): (a) the tunnel runtime
    # result-caches repeated calls whose input buffers are identical
    # (donated carries can alias!), so every timed call gets its own
    # freshly materialized carry (distinct rng -> distinct buffers), one
    # call per measurement with all chained work inside, per-call sync,
    # and a per-iteration checksum printed as a did-it-really-run
    # cross-check; (b) EVERY call carries a ~15-35 ms tunnel round trip,
    # which at a handful of periods per call inflates the per-period
    # number by several ms (the round-2/3 B=1024 headline chained only 5
    # periods and was ~12% RTT-inflated; see perf_notes "Deployment-batch
    # latency ladder"). The RTT is removed by differencing two chain
    # lengths: time K_hi and K_lo periods inside one jitted scan each,
    # per-period = (t_hi - t_lo) / (K_hi - K_lo).
    k_hi, k_lo = args.chunks, max(1, args.chunks // 4)
    if k_lo == k_hi:  # --chunks 1: differencing impossible, raw-only
        k_lo = None
    medians = {}
    for k in ([k_hi] if k_lo is None else [k_hi, k_lo]):
        rollout = engine.make_rollout_fn(num_chunks=k, jit=True)
        t0 = time.perf_counter()
        _, chunks = rollout(variables,
                            engine.init(args.batch, jax.random.key(7 + k)))
        jax.block_until_ready(chunks)
        log(f"compile+first run ({args.sampler}, K={k}): "
            f"{time.perf_counter() - t0:.2f}s")
        carries = [engine.init(args.batch, jax.random.key(100 + 17 * k + i))
                   for i in range(args.iters)]
        jax.block_until_ready(carries)
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            _, chunks = rollout(variables, carries[i])
            jax.block_until_ready(chunks)
            times.append(time.perf_counter() - t0)
            log(f"iter {i}: {times[-1] * 1e3:.1f} ms for {k} chunks x "
                f"{args.batch} robots (checksum {float(jnp.sum(chunks)):.6e})")
        # Tripwire for result-cache replays (CLAUDE.md): no real replan
        # period completes in under ~2 us of device time per robot (the
        # measured distilled floor is ~11 us/robot). Distinct per-call
        # carries are the primary guard; this catches identical-buffer
        # mistakes that return sub-floor.
        floor_ms = max(0.05, 0.002 * args.batch) * k
        if min(times) * 1e3 < floor_ms:
            log("SUSPECT TIMINGS: sub-floor measurement, treating as invalid")
            raise SystemExit(3)
        medians[k] = statistics.median(times)

    raw_period_ms = medians[k_hi] / k_hi * 1e3
    protocol = "raw(K=%d)" % k_hi
    p50_period_ms = raw_period_ms
    if k_lo is not None:
        diff_ms = (medians[k_hi] - medians[k_lo]) / (k_hi - k_lo) * 1e3
        if diff_ms <= 0 or diff_ms > raw_period_ms * 1.05:
            log(f"differencing unstable (diff {diff_ms:.3f} vs raw "
                f"{raw_period_ms:.3f}); falling back to the raw number")
        else:
            p50_period_ms = diff_ms
            protocol = "chain-differenced(K=%d,%d)" % (k_hi, k_lo)
    chunks_per_sec = args.batch / (p50_period_ms / 1e3)

    north_star = 4096 / 8 * (1000.0 / 10.0)  # 51200 chunks/s/chip
    from soccerdiffusion_tpu.diffusion import solver_label

    sampler_name = ("distilled1" if args.distilled
                    else solver_label(args.solver, args.steps))
    return {
        "metric": "%s_action_chunks_per_sec_per_chip" % sampler_name,
        "value": round(chunks_per_sec, 1),
        "unit": "chunks/s/chip",
        "vs_baseline": round(chunks_per_sec / north_star, 3),
        "p50_replan_period_ms": round(p50_period_ms, 3),
        "p50_raw_rtt_inclusive_ms": round(raw_period_ms, 3),
        "timing_protocol": protocol,
        "batch_robots": args.batch,
        "ddim_steps": 1 if args.distilled else args.steps,
        "hidden_dim": args.hidden,
        "compute_dtype": "bfloat16" if args.bf16 else "float32",
        "sampler_path": args.sampler,
        "encoder_path": "fused" if args.fused_encoder else "xla",
        "encoder_patch_size": args.patch,
        "context_kv_quant": args.kv_quant,
    }


def run_child(extra: list[str], timeout: int) -> dict | None:
    cmd = [sys.executable, os.path.abspath(__file__), "--inline"] + extra
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout, cwd=REPO)
    except subprocess.TimeoutExpired:
        log(f"child timed out after {timeout}s: {extra}")
        return None
    sys.stderr.write(proc.stderr[-4000:])
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    if proc.returncode == 0 and line.startswith("{"):
        return json.loads(line)
    log(f"child failed rc={proc.returncode}: {extra}")
    return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024, help="robots per chip")
    parser.add_argument("--chunks", type=int, default=20,
                        help="replan periods per timed iteration (K_hi of "
                             "the chain-differenced protocol; K_lo = K/4)")
    parser.add_argument("--iters", type=int, default=3, help="timed iterations")
    parser.add_argument("--steps", type=int, default=30, help="DDIM steps")
    parser.add_argument("--solver", default="ddim",
                        help="reverse-process solver: 'ddim' (reference), "
                             "'dpmpp' (DPM-Solver++(2M), training-free "
                             "few-step), optionally with an '@lambda' "
                             "log-SNR-uniform spacing suffix "
                             "(diffusion/dpm_solver.py)")
    parser.add_argument("--distilled", action="store_true")
    parser.add_argument("--sampler", choices=["none", "step", "chunk"], default="chunk",
                        help="denoiser path: plain XLA, per-step fused kernel, "
                             "or whole-chunk fused kernel (default)")
    parser.add_argument("--fused-block", type=int, default=16)
    parser.add_argument("--fused-encoder", action="store_true", default=True,
                        help="encode context with the fused Pallas encoder "
                             "(ops/fused_encoder.py)")
    parser.add_argument("--xla-encoder", dest="fused_encoder", action="store_false")
    parser.add_argument("--fused-encoder-block", type=int, default=32)
    parser.add_argument("--fused-block-distilled", type=int, default=32,
                        help="robot block for the distilled 1-step kernel (tiny "
                             "per-program work -> fewer launches wins)")
    parser.add_argument("--hidden", type=int, default=128)
    parser.add_argument("--patch", type=int, default=1,
                        help="encoder_patch_size (reference sanctions 1-10; "
                             "5 cuts context tokens 301 -> 61)")
    parser.add_argument("--kv-quant", choices=["none", "int8"], default="none",
                        help="context K/V precision inside the fused chunk "
                             "kernel")
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--fp32", dest="bf16", action="store_false")
    parser.add_argument("--inline", action="store_true",
                        help="measure in-process (no fallback orchestration)")
    parser.add_argument("--sidecars", type=str,
                        default="distilled1,ddim4,ddim2,dpmpp10,lat64,patch5,int8kv",
                        help="comma list of extra recorded points: distilled1 "
                             "(1-step student path), ddim4/ddim2 (few-step-"
                             "student operating points through the chunk "
                             "kernel; quality ledger backs both), "
                             "patch5 (encoder_patch_size=5, S=61), int8kv "
                             "(int8 context K/V in-kernel); '' = headline only")
    parser.add_argument("--no-distilled-sidecar", action="store_true",
                        help="skip all sidecar measurements (headline only)")
    parser.add_argument("--child-timeout", type=int, default=3600,
                        help="per-child wall limit; a cold-cache Mosaic "
                             "compile of the chunk program through the "
                             "tunnel has been observed at 800-1500+ s, "
                             "and a timed-out child writes no cache entry")
    args = parser.parse_args()

    if args.inline:
        print(json.dumps(measure(args)), flush=True)
        return

    # --solver rides in base so the headline/fallback children honor it;
    # named sidecars that ARE a specific solver pin their own --solver
    # afterwards (argparse last-occurrence-wins).
    base = ["--batch", str(args.batch), "--chunks", str(args.chunks),
            "--iters", str(args.iters), "--hidden", str(args.hidden),
            "--solver", args.solver]
    if not args.bf16:
        base.append("--fp32")
    enc = ([] if args.fused_encoder else ["--xla-encoder"]) + \
        ["--fused-encoder-block", str(args.fused_encoder_block)]

    # Headline: 30-step DDIM through the fused chunk kernel, with fallback.
    result = None
    if args.sampler == "chunk":
        result = run_child(base + enc + ["--steps", str(args.steps),
                                         "--sampler", "chunk",
                                         "--patch", str(args.patch),
                                         "--kv-quant", args.kv_quant,
                                         "--fused-block", str(args.fused_block)],
                           args.child_timeout)
        if result is None:
            log("falling back to the all-XLA path")
    if result is None:
        # fallback avoids Mosaic entirely (encoder included)
        result = run_child(base + ["--xla-encoder", "--steps", str(args.steps),
                                   "--sampler",
                                   "none" if args.sampler == "chunk" else args.sampler],
                           args.child_timeout)
    if result is None:
        log("benchmark failed on all paths")
        sys.exit(1)

    # Sidecars: additional recorded operating points in the same JSON line.
    #   distilled1 — 1-step student (BASELINE.md north star "30 Hz closed
    #                loop with distilled sampler")
    #   ddim4/ddim2 — few-step-distilled student serving points (same
    #                kernel, T=4/T=2; quality ledger: docs/quality_ledger_r3c.md)
    #   dpmpp10    — TRAINING-FREE few-step: DPM-Solver++(2M) at 10 steps
    #                through the same chunk kernel (host-side coefficient
    #                table swap; diffusion/dpm_solver.py). Measured at
    #                "leading" spacing: spacing changes only the (T,5)
    #                scalar table + step-token rows (identical kernel
    #                work), and the recommended @lambda spacing amplifies
    #                THIS bench's random-init model into huge outputs —
    #                quality claims for dpmpp@lambda live in the trained
    #                quality ledger, speed is spacing-independent.
    #   patch5     — reference-sanctioned encoder_patch_size=5 (S=61)
    #   int8kv     — int8 context K/V inside the chunk kernel
    #   lat64      — deployment-batch latency point (64 robots; the
    #                north-star "<10 ms p50 30-step chunk" contract;
    #                perf_notes "Deployment-batch latency ladder")
    sidecar_flags = {
        "distilled1": ["--steps", "1", "--distilled", "--sampler", "chunk",
                       "--solver", "ddim",
                       "--chunks", str(4 * args.chunks),
                       "--fused-block", str(args.fused_block_distilled)],
        "ddim4": ["--steps", "4", "--sampler", "chunk", "--solver", "ddim",
                  "--chunks", str(2 * args.chunks),
                  "--fused-block", str(args.fused_block)],
        "ddim2": ["--steps", "2", "--sampler", "chunk", "--solver", "ddim",
                  "--chunks", str(3 * args.chunks),
                  "--fused-block", str(args.fused_block)],
        "dpmpp10": ["--steps", "10", "--solver", "dpmpp",
                    "--sampler", "chunk",
                    "--chunks", str(2 * args.chunks),
                    "--fused-block", str(args.fused_block)],
        "patch5": ["--steps", str(args.steps), "--sampler", "chunk",
                   "--patch", "5",
                   "--fused-block", str(args.fused_block)],
        "int8kv": ["--steps", str(args.steps), "--sampler", "chunk",
                   "--kv-quant", "int8",
                   "--fused-block", str(args.fused_block)],
        "lat64": ["--steps", str(args.steps), "--sampler", "chunk",
                  "--batch", "64", "--chunks", "68",
                  "--fused-block", str(args.fused_block)],
    }
    wanted = [] if args.no_distilled_sidecar else [
        s for s in args.sidecars.split(",") if s]
    for name in wanted:
        if name not in sidecar_flags:
            log(f"unknown sidecar {name!r}; skipping")
            continue
        side = run_child(base + enc + sidecar_flags[name], args.child_timeout)
        if side is None and name == "distilled1":
            side = run_child(base + ["--xla-encoder", "--steps", "1",
                                     "--distilled", "--sampler", "none"],
                             args.child_timeout // 2)
        if side is None:
            log(f"sidecar {name} failed; omitting")
            continue
        result[f"{name}_chunks_per_sec_per_chip"] = side["value"]
        result[f"{name}_p50_replan_period_ms"] = side["p50_replan_period_ms"]
        result[f"{name}_sampler_path"] = side["sampler_path"]
        if side.get("batch_robots") != args.batch:
            result[f"{name}_batch_robots"] = side["batch_robots"]

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
