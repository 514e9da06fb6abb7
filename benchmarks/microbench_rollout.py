"""Decompose the serving rollout's per-chunk cost on the real chip.

Times each stage of RolloutEngine.replan_period separately (context encode,
KV precompute, single denoise step, 30-step scan, plant ticks, full period)
plus the true per-launch cost of a chained Pallas kernel. Informs where the
round-2 fused-kernel effort should go (docs/perf_notes.md).

Run: nohup python benchmarks/microbench_rollout.py > /tmp/microbench2.log 2>&1 &
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data import Normalizer
from soccerdiffusion_tpu.diffusion import ddim_sample, make_schedule
from soccerdiffusion_tpu.inference import RolloutEngine
from soccerdiffusion_tpu.inference.controller import make_controller_batch


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, iters=5):
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
    from soccerdiffusion_tpu.models import DiffusionPolicy

    model = DiffusionPolicy(cfg)
    schedule = make_schedule(1000)
    normalizer = Normalizer.identity(cfg.num_joints)
    engine = RolloutEngine(model, schedule, normalizer, num_inference_steps=30)
    carry = engine.init(B, jax.random.key(0))
    batch = make_controller_batch(cfg, carry.controller)
    variables = model.init(jax.random.key(1), batch,
                           jnp.zeros((B, 10, 20)), jnp.zeros((B,), jnp.int32))
    emit(bench="devices", devices=str(jax.devices()))

    # --- stage: context encode
    f_ctx = jax.jit(lambda v, b: model.apply(v, b, False, method=model.encode_context))
    t = timeit(f_ctx, variables, batch)
    emit(bench="context_encode", ms=t * 1e3)
    context = f_ctx(variables, batch)

    # --- stage: KV precompute
    f_kv = jax.jit(lambda v, c: model.apply(v, c, method=model.precompute_context_kv))
    t = timeit(f_kv, variables, context)
    emit(bench="kv_precompute", ms=t * 1e3)
    context_kv = f_kv(variables, context)

    noise = jax.random.normal(jax.random.key(2), (B, 10, 20))

    # --- stage: ONE denoise step (XLA path)
    f_d1 = jax.jit(lambda v, kv, x: model.apply(
        v, kv, x, jnp.full((B,), 500, jnp.int32), method=model.denoise_with_kv))
    t = timeit(f_d1, variables, context_kv, noise)
    emit(bench="denoise_step_x1", ms=t * 1e3)

    # --- stage: 30-step DDIM scan (XLA path)
    def d30(v, kv, x):
        def fn(xx, tt):
            return model.apply(v, kv, xx, jnp.full((B,), tt, jnp.int32),
                               method=model.denoise_with_kv)
        return ddim_sample(schedule, fn, x, 30)

    f_d30 = jax.jit(d30)
    t = timeit(f_d30, variables, context_kv, noise)
    emit(bench="ddim30_scan", ms=t * 1e3, per_step_ms=t / 30 * 1e3)

    # --- stage: plant ticks (10 x observe+tick scan)
    def ticks(carry, chunk):
        from soccerdiffusion_tpu.inference.controller import observe, push_action_chunk
        controller = push_action_chunk(carry.controller, chunk)

        def tick(state, command):
            controller, plant = state
            plant, js, imu = engine._plant_tick(plant, command)
            controller = observe(controller, joint_state=js, imu=imu)
            return (controller, plant), None

        (controller, plant), _ = jax.lax.scan(
            tick, (controller, carry.plant), jnp.swapaxes(chunk, 0, 1))
        return controller.joint_command_history

    f_ticks = jax.jit(ticks)
    chunk = jnp.zeros((B, 10, 20))
    t = timeit(f_ticks, carry, chunk)
    emit(bench="plant_ticks", ms=t * 1e3)

    # --- full replan period (1 chunk) and 5-chunk rollout
    rollout1 = engine.make_rollout_fn(num_chunks=1, jit=True)
    c2 = engine.init(B, jax.random.key(3))
    t0 = time.perf_counter()
    c2, ch = rollout1(variables, c2)
    jax.block_until_ready(ch)
    emit(bench="replan_period_compile_s", s=time.perf_counter() - t0)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        c2, ch = rollout1(variables, c2)
        jax.block_until_ready(ch)
        times.append(time.perf_counter() - t0)
    emit(bench="replan_period_full", ms=float(np.median(times)) * 1e3)

    # --- chained pallas launches: true per-launch overhead
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.0001

    def chain(n):
        @jax.jit
        def f(x):
            def body(i, xx):
                return pl.pallas_call(
                    k, out_shape=jax.ShapeDtypeStruct(xx.shape, xx.dtype))(xx)
            return jax.lax.fori_loop(0, n, body, x)
        return f

    x = jnp.ones((256, 128), jnp.float32)
    t1 = timeit(chain(10), x, iters=10)
    t2 = timeit(chain(110), x, iters=10)
    emit(bench="pallas_launch_chained", per_launch_us=(t2 - t1) / 100 * 1e6)

    # --- chained XLA ops at serving shapes: per-op cost of a real matmul op
    w = jax.random.normal(jax.random.key(4), (128, 128), jnp.bfloat16)

    def mm_chain(n):
        @jax.jit
        def f(x):
            def body(i, xx):
                return jax.lax.dot(xx, w, preferred_element_type=jnp.bfloat16)
            return jax.lax.fori_loop(0, n, body, x)
        return f

    x = jax.random.normal(jax.random.key(5), (10240, 128), jnp.bfloat16)
    t1 = timeit(mm_chain(10), x, iters=10)
    t2 = timeit(mm_chain(110), x, iters=10)
    emit(bench="xla_matmul_10240_chained", per_op_us=(t2 - t1) / 100 * 1e6)

    emit(bench="done")


if __name__ == "__main__":
    main()
