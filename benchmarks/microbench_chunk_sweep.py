"""Decompose the v2 fused-chunk serving path and sweep block_robots.

Times, on the real chip: the whole-chunk Pallas kernel alone at several
block sizes, the context encode, the non-sampler remainder of a replan
period, and the full period — to locate the next serving bottleneck
(docs/perf_notes.md round-2).

Run: nohup python benchmarks/microbench_chunk_sweep.py > /tmp/chunk_sweep.log 2>&1 &
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

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data import Normalizer
from soccerdiffusion_tpu.diffusion import make_schedule
from soccerdiffusion_tpu.diffusion.ddim import ddim_timesteps
from soccerdiffusion_tpu.inference import RolloutEngine
from soccerdiffusion_tpu.inference.controller import make_controller_batch
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.ops.fused_chunk import FusedChunkSampler


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, noise_variants, *args, iters=5):
    """Per-call sync with a DISTINCT first argument each call — repeated
    identical input buffers can be served from the tunnel runtime's result
    cache (CLAUDE.md "BENCHMARK VALIDITY")."""
    out = fn(noise_variants[0], *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(noise_variants[(i + 1) % len(noise_variants)], *args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = 1024
    T = 30
    cfg = ModelConfig(
        num_joints=20, hidden_dim=128, trajectory_prediction_length=10,
        action_context_length=100, joint_state_context_length=100,
        imu_context_length=100, use_images=False, use_gamestate=True,
        num_action_history_encoder_layers=2, num_imu_encoder_layers=2,
        joint_state_encoder_layers=2, num_decoder_layers=4,
        compute_dtype="bfloat16",
    )
    model = DiffusionPolicy(cfg)
    schedule = make_schedule(1000)
    normalizer = Normalizer.identity(cfg.num_joints)
    engine = RolloutEngine(model, schedule, normalizer, num_inference_steps=T,
                           fused="chunk")
    carry = engine.init(B, jax.random.key(0))
    batch = make_controller_batch(cfg, carry.controller)
    variables = model.init(jax.random.key(1), batch,
                           jnp.zeros((B, 10, 20)), jnp.zeros((B,), jnp.int32))
    emit(bench="devices", devices=str(jax.devices()))

    f_ctx = jax.jit(lambda v, b: model.apply(v, b, False, method=model.encode_context))
    t = timeit(f_ctx, [variables], batch)
    emit(bench="context_encode", ms=round(t * 1e3, 3))  # NB identical-input
    context = jax.block_until_ready(f_ctx(variables, batch))

    ts = jnp.asarray(ddim_timesteps(schedule.num_train_timesteps, T))
    st_table = model.apply(variables, ts, method=lambda m, tt: m.step_encoding(tt))[:, 0]
    noises = [jax.block_until_ready(jax.random.normal(
        jax.random.key(2 + i),
        (B, cfg.trajectory_prediction_length, cfg.num_joints), jnp.float32))
        for i in range(6)]

    # --- the whole-chunk kernel alone, sweeping block size and robot
    # grouping ("R" or "R:G" args; G robots per flat block-diag attention)
    blocks = tuple((int(a.split(":")[0]), int(a.split(":")[1]) if ":" in a else 1)
                   for a in sys.argv[1:]) or ((8, 1), (16, 1))
    for R, G in blocks:
        try:
            sampler = FusedChunkSampler(model, variables["params"], block_robots=R,
                                        group_robots=G)

            def run(nz, ctx, st):
                return sampler.sample(ctx, nz, st, schedule, T)

            f = jax.jit(run)
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(noises[0], context, st_table))
            emit(bench="chunk_kernel", block_robots=R, group_robots=G,
                 compile_s=round(time.perf_counter() - t0, 1))
            t = timeit(f, noises, context, st_table)
            emit(bench="chunk_kernel", block_robots=R, group_robots=G,
                 ms=round(t * 1e3, 3), chunks_per_sec=round(B / t, 1))
        except Exception as e:  # noqa: BLE001
            emit(bench="chunk_kernel", block_robots=R, group_robots=G,
                 error=repr(e)[:300])

    # --- full replan period at the default block, for the residual
    rollout = engine.make_rollout_fn(num_chunks=1, jit=True)
    carry2, _ = jax.block_until_ready(rollout(variables, carry))
    t = timeit(rollout, [variables], carry2, iters=5)  # carry-fed would be better
    emit(bench="full_replan_period", ms=round(t * 1e3, 3),
         chunks_per_sec=round(B / t, 1))


if __name__ == "__main__":
    main()
