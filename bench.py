"""Benchmark: batched closed-loop rollout throughput on one TPU chip.

Workload (BASELINE.json headline metric "action chunks/sec/chip (batched
rollout); p50 30-step DDIM sampling latency"): N simulated robots per chip
run the full perception->plan->act loop — controller buffers, context
encoding, 30-step DDIM action-chunk sampling, chunk feedback, 10 plant
ticks — with the default.yaml proprioceptive+gamestate architecture (h128,
100-step contexts, 10-step chunks).

The default sampler path is the whole-chunk fused Pallas program
(ops/fused_chunk.py, one op per 30-step chunk). Because a cold Mosaic
compile through the tunneled backend can take ~10 min per program, ALL
operating points (headline + sidecars) are measured in ONE child process
(one backend init, shared persistent compile cache) that spools each
completed point to a results file and enforces a total wall budget
(--budget, default 1800 s): when the budget runs short it SKIPS remaining
sidecars instead of dying, and if the child hangs in a compile the parent
kills it at the deadline and reports whatever points completed. A cold
run therefore always produces at least the headline (falling back to the
Mosaic-free XLA path if even that cannot finish); a warm-cache run
(.jax_cache/) completes the default point set in a few minutes.

vs_baseline is measured against the north-star target derived from
BASELINE.json (>=4096 rollouts on a v5e-8 at <10 ms per 30-step chunk
=> 4096/8 robots * 100 chunks/s = 51200 chunks/s/chip). The reference
itself publishes no numbers (BASELINE.md).

The default point set also records the training-MFU north star (`mfu`
sidecar, measure_mfu): the committed vit_flagship train step on a
device-resident synthetic batch, chain-differenced, with FLOPs from XLA
cost analysis of the unfused twin — so BENCH_r*.json carries the >=45%
MFU target as driver evidence, not a builder-only claim.

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


def measure_mfu(args) -> dict:
    """Training-MFU probe: the flagship train step on a device-resident
    synthetic batch, chain-differenced (VERDICT r4 item 2 — the >=45% MFU
    north star must be driver-recorded, not builder-only).

    Protocol: vit_flagship.yaml exactly as committed (fused fwd+bwd ViT
    blocks, quick-GELU, fused encoder stack + decoder layer, bf16) at the
    recorded B=256 geometry with pre-patchified uint8 frames (the packed
    production layout, data/pipeline.patchify_frames). FLOPs come from XLA
    cost analysis of the mathematically identical unfused step at B=64
    scaled linearly (Pallas custom calls are invisible to cost analysis;
    same accounting as benchmarks/train_mfu.py). Timing: the step is
    carry-fed (the donated state differs every call, so the tunnel result
    cache cannot replay it) and the constant drain/RTT overhead of the
    final fetch is removed by differencing two loop lengths:
    per-step = (t(K_hi) - t(K_lo)) / (K_hi - K_lo).
    """
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE_DIR)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp  # noqa: F401  (device_batch uses jnp via numpy)
    import numpy as np
    import yaml

    from soccerdiffusion_tpu.config import Config
    from soccerdiffusion_tpu.data import Normalizer
    from soccerdiffusion_tpu.data.pipeline import prepare_batch
    from soccerdiffusion_tpu.diffusion import make_schedule
    from soccerdiffusion_tpu.models import DiffusionPolicy
    from soccerdiffusion_tpu.training.trainer import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from soccerdiffusion_tpu.utils.profiling import (
        device_peak_flops,
        estimate_flops,
    )

    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    from train_mfu import device_batch

    cfg_path = os.path.join(REPO, "soccerdiffusion_tpu", "training",
                            "configs", "vit_flagship.yaml")
    with open(cfg_path) as f:
        config = Config.from_dict(yaml.safe_load(f))
    cfg = config.model
    b = args.mfu_batch
    model = DiffusionPolicy(cfg)
    schedule = make_schedule(config.train.train_denoising_timesteps)
    rng = np.random.default_rng(0)
    batch = device_batch(cfg, b, rng)
    optimizer = make_optimizer(config.train.lr, 1000)
    state = create_train_state(
        model, prepare_batch(batch), optimizer, jax.random.key(0),
        cfg.trajectory_prediction_length, cfg.num_joints,
        ema=config.train.ema_decay > 0.0,
    )
    train_step = make_train_step(model, schedule, optimizer,
                                 Normalizer.identity(cfg.num_joints),
                                 ema_decay=config.train.ema_decay)

    # FLOPs: unfused twin at B=64, scaled (cost analysis cannot see inside
    # Pallas custom calls; FLOPs are linear in batch)
    plain_model = DiffusionPolicy(dataclasses.replace(
        cfg, vit_fused_block=False, encoder_fused_stack=False,
        decoder_fused_block=False))
    plain_step = make_train_step(plain_model, schedule, optimizer,
                                 Normalizer.identity(cfg.num_joints),
                                 donate=False)
    small = device_batch(cfg, 64, rng)
    flops = estimate_flops(plain_step, state, small, 0) * (b / 64)
    del small
    if not flops:
        raise RuntimeError("FLOPs estimation failed; not recording mfu=0")

    t0 = time.perf_counter()
    state, metrics = train_step(state, batch, 0)
    jax.block_until_ready(metrics["loss"])
    log(f"mfu probe compile+first step: {time.perf_counter() - t0:.1f}s")

    k_hi, k_lo = args.mfu_steps, max(2, args.mfu_steps // 4)
    timings = {}
    for k in (k_lo, k_hi):
        t0 = time.perf_counter()
        for _ in range(k):
            state, metrics = train_step(state, batch, 0)
        jax.block_until_ready(metrics["loss"])
        timings[k] = time.perf_counter() - t0
        log(f"mfu probe: {k} steps in {timings[k]:.2f}s "
            f"(loss {float(metrics['loss']):.4f})")
    dt = (timings[k_hi] - timings[k_lo]) / (k_hi - k_lo)
    raw_dt = timings[k_hi] / k_hi
    if dt <= 0 or dt > raw_dt * 1.05:
        log(f"mfu differencing unstable (diff {dt * 1e3:.1f} vs raw "
            f"{raw_dt * 1e3:.1f} ms); falling back to the raw number")
        dt = raw_dt
    peak = device_peak_flops()
    if not (0 < flops / dt / peak < 1.0):
        raise RuntimeError(
            f"implausible MFU {flops / dt / peak:.3f}; not recording")
    return {
        "mfu": round(flops / dt / peak, 4),
        "mfu_config": "vit_flagship",
        "mfu_batch": b,
        "mfu_step_ms": round(dt * 1e3, 1),
        "mfu_samples_per_sec": round(b / dt, 1),
        "mfu_flops_per_step": flops,
        "mfu_loss_finite": bool(np.isfinite(float(metrics["loss"]))),
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


# Per-point overrides applied on top of the base args. All points ride the
# fused whole-chunk kernel; measurement order is the priority order (the
# budget cuts from the tail). Rationale per point:
#   headline    — 30-step DDIM (reference fidelity semantics, ros.py:301-310)
#   distilled1  — 1-step student (BASELINE.md "30 Hz closed loop with
#                 distilled sampler"); quality: docs/quality_ledger_r3c.md
#   ddim4       — few-step-student operating point, same kernel at T=4;
#                 the quality-gated deployment headline (docs/HEADLINE.md)
#   dpmpp10     — training-free DPM-Solver++(2M); leading spacing (speed is
#                 spacing-independent, see round-3 notes)
#   lat64       — deployment-batch latency point (<10 ms p50 contract)
#   ddim2/patch5/int8kv — experiment-tier records (measured neutral or
#                 refuted as headline levers; kept for the ledger)
def point_overrides(args) -> dict[str, dict]:
    k = args.chunks
    return {
        "headline": {},
        "mfu": {},  # training-MFU probe (measure_mfu; no rollout overrides)
        "distilled1": {"steps": 1, "distilled": True, "solver": "ddim",
                       "chunks": 4 * k,
                       "fused_block": args.fused_block_distilled},
        "ddim4": {"steps": 4, "solver": "ddim", "chunks": 2 * k},
        "dpmpp10": {"steps": 10, "solver": "dpmpp", "chunks": 2 * k},
        "lat64": {"batch": 64, "chunks": 68},
        "ddim2": {"steps": 2, "solver": "ddim", "chunks": 3 * k},
        "patch5": {"patch": 5},
        "int8kv": {"kv_quant": "int8"},
    }


DEFAULT_SIDECARS = "mfu,distilled1,ddim4"
FULL_SIDECARS = "mfu,distilled1,ddim4,dpmpp10,lat64,ddim2,patch5,int8kv"


def run_multi(args) -> None:
    """Child mode: measure every planned point in THIS process, spooling
    each completed result as a JSON line to --results-file so the parent
    can salvage partial progress if a compile hangs past the deadline.

    Budget policy: the headline is always attempted; each subsequent point
    starts only if the elapsed wall time leaves room for a point at the
    cost of the slowest one seen so far (cold compiles dominate, and all
    points compile the same family of programs).
    """
    import copy

    t0 = time.monotonic()
    overrides = point_overrides(args)
    wanted = ["headline"] + [s for s in args.sidecars.split(",")
                             if s and s in overrides]
    out = open(args.results_file or os.path.join(REPO, ".bench_points.jsonl"),
               "a", buffering=1)
    slowest = 0.0
    for i, name in enumerate(wanted):
        elapsed = time.monotonic() - t0
        if i > 0:
            need = max(slowest * 1.1, 120.0)
            if elapsed + need > args.budget:
                log(f"budget: {elapsed:.0f}s elapsed of {args.budget}s, "
                    f"~{need:.0f}s needed -> skipping {wanted[i:]}")
                for skipped in wanted[i:]:
                    out.write(json.dumps({"point": skipped,
                                          "skipped": "budget"}) + "\n")
                break
        pa = copy.copy(args)
        for key, val in overrides[name].items():
            setattr(pa, key, val)
        tp = time.monotonic()
        try:
            res = measure_mfu(pa) if name == "mfu" else measure(pa)
        except SystemExit as e:
            log(f"point {name} invalid (rc {e.code}); recording failure")
            out.write(json.dumps({"point": name,
                                  "failed": f"rc {e.code}"}) + "\n")
            continue
        except Exception as e:  # noqa: BLE001 — keep measuring other points
            log(f"point {name} failed: {type(e).__name__}: {e}")
            out.write(json.dumps({"point": name,
                                  "failed": repr(e)[:200]}) + "\n")
            continue
        dt = time.monotonic() - tp
        slowest = max(slowest, dt)
        res["point"] = name
        res["point_wall_s"] = round(dt, 1)
        out.write(json.dumps(res) + "\n")
        log(f"point {name} done in {dt:.0f}s")
    out.close()


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
                        help="measure ONE point in-process (no orchestration)")
    parser.add_argument("--multi", action="store_true",
                        help="child mode: measure headline + sidecars in one "
                             "process, spooling results to --results-file")
    parser.add_argument("--results-file", type=str, default="",
                        help="(--multi) JSONL spool for completed points")
    parser.add_argument("--budget", type=int, default=1800,
                        help="total wall budget (s); when it runs short, "
                             "remaining sidecars are SKIPPED, never the run "
                             "killed — the headline is always attempted")
    parser.add_argument("--mfu-steps", type=int, default=16,
                        help="(mfu sidecar) K_hi of the chain-differenced "
                             "train-step timing; K_lo = K/4")
    parser.add_argument("--mfu-batch", type=int, default=256,
                        help="(mfu sidecar) flagship train batch (256 is "
                             "the recorded 50.4%%-MFU geometry)")
    parser.add_argument("--sidecars", type=str, default=DEFAULT_SIDECARS,
                        help="comma list of extra recorded points (priority "
                             "order is fixed: %s); 'full' = all of them, "
                             "'' = headline only" % FULL_SIDECARS)
    parser.add_argument("--no-distilled-sidecar", action="store_true",
                        help="skip all sidecar measurements (headline only)")
    args = parser.parse_args()
    if args.sidecars == "full":
        args.sidecars = FULL_SIDECARS
    if args.no_distilled_sidecar:
        args.sidecars = ""

    if args.inline:
        print(json.dumps(measure(args)), flush=True)
        return
    if args.multi:
        run_multi(args)
        return

    # Parent: ONE child measures every point (one backend init, one warm
    # compile-cache lineage — round 3's 8-children design blew the driver
    # budget, BENCH_r03.json rc=124). The child spools each completed point;
    # if it hangs in a cold Mosaic compile we kill it at the deadline and
    # still report what finished.
    t_start = time.monotonic()
    # Per-run unique spool: a fixed path can be clobbered by a concurrent
    # bench/test process (observed: a pytest run poisoned a live bench's
    # results with stub records), and "a" mode keeps writing to the
    # unlinked inode while the parent reads fresh garbage.
    results_file = os.path.join(REPO, f".bench_points.{os.getpid()}.jsonl")
    if os.path.exists(results_file):
        os.remove(results_file)
    # pass flags through verbatim — including EMPTY values ('--sidecars ""'
    # means headline-only; filtering empties turned it into a bare
    # --sidecars and an argparse error in the child, observed 2026-08-20)
    child_args = list(sys.argv[1:])
    cmd = [sys.executable, os.path.abspath(__file__), "--multi",
           "--results-file", results_file] + child_args
    try:
        proc = subprocess.run(cmd, capture_output=False, text=True,
                              timeout=args.budget + 120, cwd=REPO,
                              stdout=sys.stderr, stderr=sys.stderr)
        if proc.returncode != 0:
            log(f"multi child exited rc={proc.returncode}")
    except subprocess.TimeoutExpired:
        log(f"multi child killed at deadline ({args.budget + 120}s); "
            "salvaging completed points")

    points: dict[str, dict] = {}
    if os.path.exists(results_file):
        with open(results_file) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    rec = json.loads(line)
                    points[rec.pop("point", "?")] = rec
        os.remove(results_file)

    result = points.get("headline")
    if result is not None and ("skipped" in result or "failed" in result):
        result = None
    if result is None:
        # Headline never completed (cold-compile hang or kernel failure):
        # fall back to the Mosaic-free XLA path, bounded by what's left of
        # the budget (the XLA program compiles in ~1-2 min even cold).
        log("headline missing; falling back to the all-XLA path")
        remaining = max(300, int(args.budget + 300 - (time.monotonic() - t_start)))
        base = ["--batch", str(args.batch), "--chunks", str(args.chunks),
                "--iters", str(args.iters), "--hidden", str(args.hidden),
                "--solver", args.solver, "--steps", str(args.steps)]
        if not args.bf16:
            base.append("--fp32")
        result = run_child(base + ["--xla-encoder", "--sampler", "none"],
                           remaining)
    if result is None:
        log("benchmark failed on all paths")
        sys.exit(1)
    result.pop("point_wall_s", None)

    skipped = []
    for name in [s for s in args.sidecars.split(",") if s]:
        side = points.get(name)
        if side is None or "failed" in side or "skipped" in side:
            skipped.append(name)
            continue
        if name == "mfu":
            # training-MFU probe: its fields are already mfu-prefixed
            side.pop("point_wall_s", None)
            result.update(side)
            continue
        result[f"{name}_chunks_per_sec_per_chip"] = side["value"]
        result[f"{name}_p50_replan_period_ms"] = side["p50_replan_period_ms"]
        result[f"{name}_sampler_path"] = side["sampler_path"]
        if side.get("batch_robots") != args.batch:
            result[f"{name}_batch_robots"] = side["batch_robots"]
    if skipped:
        result["sidecars_skipped"] = ",".join(skipped)
    # Deployment headline (round-4 decision, docs/HEADLINE.md): the
    # quality-gated 4-step student is the DEPLOYMENT operating point
    # (1.37x the north star, quality within teacher self-consistency —
    # docs/quality_ledger_r3c.md); the top-level `metric` stays the
    # 30-step DDIM FIDELITY reference (the reference's own sampling
    # semantics, ros.py:301-310) for cross-round protocol continuity.
    if "ddim4_chunks_per_sec_per_chip" in result:
        north_star = 4096 / 8 * (1000.0 / 10.0)
        result["deployment_headline"] = "ddim4"
        result["deployment_chunks_per_sec_per_chip"] = \
            result["ddim4_chunks_per_sec_per_chip"]
        result["deployment_vs_baseline"] = round(
            result["ddim4_chunks_per_sec_per_chip"] / north_star, 3)
        result["deployment_quality_gate"] = "docs/quality_ledger_r3c.md"
    result["bench_wall_s"] = round(time.monotonic() - t_start, 1)

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
