"""Serving throughput of the MULTIMODAL (camera-conditioned) policy.

BASELINE.json config[2]: the flagship ViT-conditioned model in the
closed-loop rollout engine — the full perception->plan->act period
including per-period 10 Hz camera frames through the ViT encoder, 30-step
fused-chunk DDIM (and the distilled single step) on one chip. Complements
bench.py's proprioceptive headline (VERDICT round-1 weak #4: "the bench
never exercises the multimodal model").

Run: nohup python benchmarks/serve_multimodal.py > /tmp/serve_mm.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import yaml

from soccerdiffusion_tpu.config import Config
from soccerdiffusion_tpu.data import Normalizer
from soccerdiffusion_tpu.diffusion import make_schedule
from soccerdiffusion_tpu.inference import RolloutEngine
from soccerdiffusion_tpu.inference.controller import make_controller_batch
from soccerdiffusion_tpu.models import DiffusionPolicy


def emit(**kw):
    print(json.dumps(kw), flush=True)


def distinct_carry(engine, batch_robots, key):
    """A rollout carry whose LARGE input buffers are all distinct per call.

    ``engine.init`` zero-fills every controller/plant buffer, so two
    timed calls would share identical image/history buffers and differ
    only in the tiny rng leaf — exactly the shape of input the tunnel
    runtime has been observed serving from its result cache (CLAUDE.md
    "BENCHMARK VALIDITY"; the r4 raw-frames lane recorded an invalid
    0.8 ms iter-0 this way, docs/serve_mm_r4.log). Small per-call noise
    on every major buffer (the chunk microbenches' noise-input pattern)
    makes each call's inputs unique without changing the measured work.
    """
    carry = engine.init(batch_robots, key)
    k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(key, 1), 4)
    ctrl = carry.controller
    upd = dict(
        joint_command_history=ctrl.joint_command_history
        + 0.01 * jax.random.normal(k1, ctrl.joint_command_history.shape),
        joint_state_history=ctrl.joint_state_history
        + 0.01 * jax.random.normal(k2, ctrl.joint_state_history.shape),
    )
    if ctrl.images is not None:
        upd["images"] = ctrl.images + 0.01 * jax.random.normal(
            k3, ctrl.images.shape)
    if ctrl.image_tokens is not None:
        upd["image_tokens"] = ctrl.image_tokens + 0.01 * jax.random.normal(
            k3, ctrl.image_tokens.shape)
    plant = carry.plant.replace(
        positions=carry.plant.positions
        + 0.01 * jax.random.normal(k4, carry.plant.positions.shape))
    return carry.replace(controller=ctrl.replace(**upd), plant=plant)


def measure(name, engine, variables, batch_robots, chunks, iters=3):
    # Chain-differenced protocol (CLAUDE.md; same as bench.py): time K_hi
    # and K_lo replan periods inside one jitted scan each, with a fresh
    # distinct carry and a checksum per timed call; per-period =
    # (t_hi - t_lo) / (K_hi - K_lo) cancels the ~15-35 ms tunnel RTT
    # (the pre-2026-08-18 numbers here chained only 3 periods per call
    # and were RTT-inflated by up to ~12 ms/period).
    k_hi, k_lo = chunks, max(1, chunks // 4)
    if k_lo == k_hi:  # chunks=1: differencing impossible, raw-only
        k_lo = None
    medians = {}
    for k in ([k_hi] if k_lo is None else [k_hi, k_lo]):
        rollout = engine.make_rollout_fn(num_chunks=k, jit=True)
        t0 = time.perf_counter()
        _, out = rollout(variables, distinct_carry(engine, batch_robots,
                                                   jax.random.key(7 + k)))
        jax.block_until_ready(out)
        emit(bench=name, k=k, compile_s=round(time.perf_counter() - t0, 1))
        carries = [distinct_carry(engine, batch_robots,
                                  jax.random.key(100 + 17 * k + i))
                   for i in range(iters)]
        jax.block_until_ready(carries)
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            _, out = rollout(variables, carries[i])
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
            emit(bench=name, k=k, iter=i, ms=round(times[-1] * 1e3, 1),
                 checksum=float(jnp.sum(out)))
        # Per-iter validity: a single sub-floor time is the tunnel's
        # result-cache/deferred-fetch artifact (CLAUDE.md "BENCHMARK
        # VALIDITY"; observed live: iter 0 of a 233 ms/call lane returning
        # in 0.8 ms) — discard it rather than invalidating the lane. Only
        # an all-sub-floor lane is genuinely unmeasurable.
        floor_s = max(0.05, 0.002 * batch_robots) * k / 1e3
        valid = [t for t in times if t >= floor_s]
        if not valid:
            emit(bench=name, error="sub-floor timing, invalid")
            raise SystemExit(3)
        if len(valid) < len(times):
            emit(bench=name, k=k, warning="discarded sub-floor iters",
                 kept=len(valid), of=len(times))
        medians[k] = sorted(valid)[len(valid) // 2]
    raw_ms = medians[k_hi] / k_hi * 1e3
    period_ms, protocol = raw_ms, f"raw(K={k_hi})"
    if k_lo is not None:
        diff_ms = (medians[k_hi] - medians[k_lo]) / (k_hi - k_lo) * 1e3
        if diff_ms <= 0 or diff_ms > raw_ms * 1.05:
            emit(bench=name, warning="differencing unstable, raw fallback",
                 diff_ms=round(diff_ms, 2), raw_ms=round(raw_ms, 2))
        else:
            period_ms, protocol = diff_ms, f"chain-differenced(K={k_hi},{k_lo})"
    emit(bench=name, batch_robots=batch_robots,
         p50_replan_period_ms=round(period_ms, 2),
         p50_raw_rtt_inclusive_ms=round(raw_ms, 2),
         timing_protocol=protocol,
         chunks_per_sec_per_chip=round(batch_robots / (period_ms / 1e3), 1))


def main():
    with open(os.path.join(REPO, "soccerdiffusion_tpu", "training", "configs",
                           "vit_flagship.yaml")) as f:
        config = Config.from_dict(yaml.safe_load(f))
    cfg = config.model
    model = DiffusionPolicy(cfg)
    schedule = make_schedule(config.train.train_denoising_timesteps)
    normalizer = Normalizer.identity(cfg.num_joints)
    B = int(os.environ.get("MM_BATCH", "64"))
    emit(bench="devices", devices=str(jax.devices()), config="vit_flagship",
         image_resolution=cfg.image_resolution, batch=B)

    # cached image tokens (the round-4 default for image configs): frames
    # are encoded once on arrival inside the replan period; the raw path
    # re-encodes the whole image_context_length stack every replan
    # (VERDICT r3 weak #5 — image encoding ran every replan tick even
    # though frames refresh at 10 Hz vs the 5 Hz replan rate).
    eng30 = RolloutEngine(model, schedule, normalizer, num_inference_steps=30,
                          fused="chunk", fused_block_robots=16)
    # init params from a RAW-FRAME batch: a token-cache batch would skip
    # the image encoder entirely and its params would never be created
    # (production loads trained checkpoints, so only scratch-init
    # benchmarks hit this)
    from soccerdiffusion_tpu.inference.controller import init_controller_state

    raw_state = init_controller_state(cfg, batch_size=B)
    batch = make_controller_batch(cfg, raw_state)
    variables = model.init(jax.random.key(1), batch,
                           jnp.zeros((B, cfg.trajectory_prediction_length,
                                      cfg.num_joints)),
                           jnp.zeros((B,), jnp.int32))
    if os.environ.get("MM_DDIM30", "1") != "0":
        measure("mm_ddim30_fused_chunk_cached", eng30, variables, B,
                chunks=int(os.environ.get("MM_CHUNKS", "12")))

    if os.environ.get("MM_RAW", "1") != "0":
        eng30_raw = RolloutEngine(model, schedule, normalizer,
                                  num_inference_steps=30, fused="chunk",
                                  fused_block_robots=16,
                                  cache_image_tokens=False)
        measure("mm_ddim30_fused_chunk_rawframes", eng30_raw, variables, B,
                chunks=int(os.environ.get("MM_CHUNKS", "12")))

    eng1 = RolloutEngine(model, schedule, normalizer, num_inference_steps=1,
                         distilled=True, fused="chunk", fused_block_robots=32)
    measure("mm_distilled1_cached", eng1, variables, B,
            chunks=int(os.environ.get("MM_CHUNKS_D1", "32")))
    emit(bench="done")


if __name__ == "__main__":
    main()
