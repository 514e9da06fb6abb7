"""Isolate the lax.scan per-iteration pathology found by microbench_rollout:
one denoise step costs 0.22 ms standalone but 6 ms inside the DDIM scan.

Variants timed: scan (baseline), scan with unroll, Python-unrolled loop,
fori_loop, and scan with a constant timestep. Whatever is fast becomes the
serving sampler's loop structure.

Run: nohup python benchmarks/microbench_scan.py > /tmp/microbench3.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.diffusion import make_schedule
from soccerdiffusion_tpu.diffusion.ddim import ddim_step, ddim_timesteps
from soccerdiffusion_tpu.inference import RolloutEngine
from soccerdiffusion_tpu.inference.controller import make_controller_batch
from soccerdiffusion_tpu.models import DiffusionPolicy


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
    from soccerdiffusion_tpu.data import Normalizer

    engine = RolloutEngine(model, schedule, Normalizer.identity(20))
    carry = engine.init(B, jax.random.key(0))
    batch = make_controller_batch(cfg, carry.controller)
    variables = model.init(jax.random.key(1), batch,
                           jnp.zeros((B, 10, 20)), jnp.zeros((B,), jnp.int32))
    context = jax.jit(lambda v, b: model.apply(v, b, False, method=model.encode_context))(variables, batch)
    context_kv = jax.jit(lambda v, c: model.apply(v, c, method=model.precompute_context_kv))(variables, context)
    noise = jax.random.normal(jax.random.key(2), (B, 10, 20))
    emit(bench="devices", devices=str(jax.devices()))

    ts = np.asarray(ddim_timesteps(1000, 30))
    step_ratio = 1000 // 30

    def dstep(v, kv, x, t):
        return model.apply(v, kv, x, jnp.full((B,), t, jnp.int32),
                           method=model.denoise_with_kv)

    # 1. scan (current baseline)
    def scan_version(v, kv, x):
        def body(xx, t):
            eps = dstep(v, kv, xx, t)
            return ddim_step(schedule, eps, t, t - step_ratio, xx), None
        x0, _ = jax.lax.scan(body, x, jnp.asarray(ts))
        return x0

    # 2. scan with full unroll
    def scan_unrolled(v, kv, x):
        def body(xx, t):
            eps = dstep(v, kv, xx, t)
            return ddim_step(schedule, eps, t, t - step_ratio, xx), None
        x0, _ = jax.lax.scan(body, x, jnp.asarray(ts), unroll=True)
        return x0

    # 3. Python loop, static timesteps
    def python_loop(v, kv, x):
        for t in ts:
            eps = dstep(v, kv, x, int(t))
            x = ddim_step(schedule, eps, int(t), int(t) - step_ratio, x)
        return x

    # 4. fori_loop with dynamic gather of ts
    ts_dev = jnp.asarray(ts)

    def fori_version(v, kv, x):
        def body(i, xx):
            t = ts_dev[i]
            eps = dstep(v, kv, xx, t)
            return ddim_step(schedule, eps, t, t - step_ratio, xx)
        return jax.lax.fori_loop(0, 30, body, x)

    # 5. scan, constant t (isolates traced-t cost)
    def scan_const_t(v, kv, x):
        def body(xx, _):
            eps = dstep(v, kv, xx, 500)
            return ddim_step(schedule, eps, 500, 500 - step_ratio, xx), None
        x0, _ = jax.lax.scan(body, x, None, length=30)
        return x0

    for name, fn in [("scan", scan_version), ("scan_unrolled", scan_unrolled),
                     ("python_loop", python_loop), ("fori", fori_version),
                     ("scan_const_t", scan_const_t)]:
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = f(variables, context_kv, noise)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t = timeit(f, variables, context_kv, noise)
        emit(bench=f"ddim30_{name}", ms=t * 1e3, per_step_ms=t / 30 * 1e3,
             compile_s=round(compile_s, 1))

    # 6. plant ticks unrolled vs scan
    chunk = jnp.zeros((B, 10, 20))

    def ticks_unrolled(carry, chunk):
        from soccerdiffusion_tpu.inference.controller import observe, push_action_chunk
        controller = push_action_chunk(carry.controller, chunk)
        plant = carry.plant
        for p in range(10):
            plant, js, imu = engine._plant_tick(plant, chunk[:, p])
            controller = observe(controller, joint_state=js, imu=imu)
        return controller.joint_command_history

    f = jax.jit(ticks_unrolled)
    t = timeit(f, carry, chunk)
    emit(bench="plant_ticks_unrolled", ms=t * 1e3)

    emit(bench="done")


if __name__ == "__main__":
    main()
