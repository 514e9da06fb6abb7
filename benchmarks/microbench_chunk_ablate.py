"""Attribute fused-chunk kernel time to its sub-blocks by ablation.

Motivation (docs/perf_notes.md round 2): halving the context length S only
cuts kernel time 54.9 -> 47.5 ms, so the kernel is NOT bound by context
K/V transit; ~47 ms is S-independent. This bench compiles the real kernel
(ops/fused_chunk.py) with named sub-blocks dropped via the ``ablate``
profiling hook and measures each variant on the chip, plus the qstat
(streamed-K) cross orientation.

Run: nohup python benchmarks/microbench_chunk_ablate.py > /tmp/chunk_ablate.log 2>&1 &
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
from soccerdiffusion_tpu.diffusion import make_schedule
from soccerdiffusion_tpu.diffusion.ddim import ddim_timesteps
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
    B, T, R = 1024, 30, 16
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
    key = jax.random.key(0)
    batch_stub = {
        "joint_command_history": jnp.zeros((2, 100, cfg.num_joints)),
        "rotation": jnp.zeros((2, 100, 4)),
        "joint_state": jnp.zeros((2, 100, cfg.num_joints)),
        "game_state": jnp.zeros((2,), jnp.int32),
    }
    variables = model.init(jax.random.key(1), batch_stub, jnp.zeros((2, 10, 20)),
                           jnp.zeros((2,), jnp.int32))
    ts = jnp.asarray(ddim_timesteps(1000, T))
    st = model.apply(variables, ts, method=lambda m, tt: m.step_encoding(tt))[:, 0]
    noises = [jax.block_until_ready(
        jax.random.normal(jax.random.key(100 + i), (B, 10, 20), jnp.float32))
        for i in range(6)]
    ctx = jax.random.normal(key, (B, 301, cfg.hidden_dim), jnp.float32)
    emit(bench="devices", devices=str(jax.devices()))

    variants = [
        ("kstat_full", "kstat", frozenset()),
        ("qstat_full", "qstat", frozenset()),
        ("kstat_no_self", "kstat", frozenset({"self"})),
        ("kstat_no_cross", "kstat", frozenset({"cross"})),
        ("kstat_no_mlp", "kstat", frozenset({"mlp"})),
        ("kstat_no_ln", "kstat", frozenset({"ln"})),
        ("kstat_minimal", "kstat", frozenset({"self", "cross", "mlp"})),
        # round 2: inside the attention blocks
        ("kstat_no_self_dots", "kstat", frozenset({"self_dots"})),
        ("kstat_no_softmax", "kstat", frozenset({"softmax"})),
        ("kstat_no_headmask", "kstat", frozenset({"headmask"})),
        ("kstat_no_merge", "kstat", frozenset({"merge"})),
    ]
    only = set(sys.argv[1:])
    if only:
        variants = [v for v in variants if v[0] in only]
    for name, orient, ablate in variants:
        try:
            sampler = FusedChunkSampler(model, variables["params"], block_robots=R,
                                        cross_orientation=orient)
            sampler._ablate = ablate
            f = jax.jit(lambda n, c, s, _s=sampler: _s.sample(c, n, s, schedule, T))
            t0 = time.perf_counter()
            jax.block_until_ready(f(noises[0], ctx, st))
            comp = time.perf_counter() - t0
            t = timeit(f, noises, ctx, st)
            emit(bench=name, ms=round(t * 1e3, 2), chunks_per_sec=round(B / t, 1),
                 compile_s=round(comp, 1))
        except Exception as e:  # noqa: BLE001
            emit(bench=name, error=repr(e)[:300])


if __name__ == "__main__":
    main()
