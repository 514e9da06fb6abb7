"""Time the fused context encoder on the chip, plus full replan periods
with it enabled (distilled-1 and ddim30-chunk paths).

Run: nohup python benchmarks/microbench_encoder.py > /tmp/enc.log 2>&1 &
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
from soccerdiffusion_tpu.inference import RolloutEngine
from soccerdiffusion_tpu.inference.controller import make_controller_batch
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.ops.fused_encoder import FusedContextEncoder


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = 1024
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
    emit(bench="devices", devices=str(jax.devices()))

    engine = RolloutEngine(model, schedule, normalizer)
    carry = engine.init(B, jax.random.key(0))
    batch = make_controller_batch(cfg, carry.controller)
    variables = model.init(jax.random.key(1), batch,
                           jnp.zeros((B, 10, 20)), jnp.zeros((B,), jnp.int32))

    for R in (int(a) for a in (sys.argv[1:] or ["16", "32"])):
        try:
            enc = FusedContextEncoder(model, variables["params"], block_robots=R)
            f = jax.jit(lambda b: enc.encode(b))
            t0 = time.perf_counter()
            jax.block_until_ready(f(batch))
            emit(bench="fused_encoder", block_robots=R,
                 compile_s=round(time.perf_counter() - t0, 1))
            emit(bench="fused_encoder", block_robots=R,
                 ms=round(timeit(f, batch) * 1e3, 3))
        except Exception as e:  # noqa: BLE001
            emit(bench="fused_encoder", block_robots=R, error=repr(e)[:300])

    # full distilled replan with fused encoder + fused step kernel
    dist = RolloutEngine(model, schedule, normalizer, num_inference_steps=1,
                         distilled=True, fused="chunk", fused_block_robots=32,
                         fused_encoder=True, fused_encoder_block_robots=32)
    dcarry = dist.init(B, jax.random.key(3))
    f_dist = jax.jit(dist.replan_period)
    t0 = time.perf_counter()
    jax.block_until_ready(f_dist(variables, dcarry))
    emit(bench="replan_distilled_fused_enc", compile_s=round(time.perf_counter() - t0, 1))
    t = timeit(f_dist, variables, dcarry)
    emit(bench="replan_distilled_fused_enc", ms=round(t * 1e3, 3),
         chunks_per_sec=round(B / t, 1))


if __name__ == "__main__":
    main()
