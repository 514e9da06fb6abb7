"""TPU microbenchmarks informing the fused-kernel round-2 redesign.

Measures, on the real chip:
  1. per-XLA-op overhead inside one compiled program (chained small ops)
  2. dense matmul throughput at serving shapes
  3. batched tiny dot_general (the round-1 per-head attention form)
  4. block-diagonal packed attention dots (the round-2 candidate form)
  5. Pallas per-program overhead + in-kernel throughput of candidate
     attention forms (fori inside the kernel isolates compute from launch)
  6. whether a Mosaic (Pallas) program hits the persistent compilation cache
     across processes

Run: nohup python benchmarks/microbench_tpu.py > /tmp/microbench.log 2>&1 &
Prints one JSON line per measurement.
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


# ---------------------------------------------------------------- 1. op cost
def op_chain_cost():
    def chain(n):
        @jax.jit
        def f(x):
            def body(i, x):
                return x * 1.0001 + 1e-6
            return jax.lax.fori_loop(0, n, body, x, unroll=True)
        return f

    x = jnp.ones((8, 128), jnp.float32)
    t1 = timeit(chain(100), x)
    t2 = timeit(chain(400), x)
    emit(bench="op_chain", per_op_us=(t2 - t1) / 300 * 1e6,
         t100_ms=t1 * 1e3, t400_ms=t2 * 1e3)


# ------------------------------------------------------------- 2/3/4. matmuls
def matmul_forms():
    def loop_of(f, n, *consts):
        @jax.jit
        def g(x):
            def body(i, acc):
                return acc + f(x * (1.0 + 1e-6 * i), *consts)
            return jax.lax.fori_loop(0, n, body, jnp.zeros_like(f(x, *consts)))
        return g

    key = jax.random.key(0)
    N1, N2 = 20, 80

    # dense serving matmul, all robots packed in rows
    x = jax.random.normal(key, (10240, 128), jnp.bfloat16)
    w = jax.random.normal(key, (128, 1024), jnp.bfloat16)
    f = lambda x, w: jax.lax.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)[:, :128]
    t1, t2 = timeit(loop_of(f, N1, w), x), timeit(loop_of(f, N2, w), x)
    per = (t2 - t1) / (N2 - N1)
    emit(bench="dense_10240x128x1024", per_op_us=per * 1e6,
         tflops=10240 * 128 * 1024 * 2 / per / 1e12)

    # batched tiny dot (round-1 per-head cross-attn scores): B=1024 robots
    q = jax.random.normal(key, (1024, 10, 32), jnp.bfloat16)
    k = jax.random.normal(key, (1024, 112, 32), jnp.bfloat16)
    f = lambda q, k: jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)[..., :32]
    t1, t2 = timeit(loop_of(f, N1, k), q), timeit(loop_of(f, N2, k), q)
    per = (t2 - t1) / (N2 - N1)
    emit(bench="batched_dot_1024x10x32_kv112", per_op_us=per * 1e6,
         tflops=1024 * 10 * 112 * 32 * 2 / per / 1e12)

    # block-diagonal packed form, R=32: (320, 32) @ (32, 3584)
    q = jax.random.normal(key, (320, 32), jnp.bfloat16)
    k = jax.random.normal(key, (32, 3584), jnp.bfloat16)
    f = lambda q, k: jax.lax.dot(q, k, preferred_element_type=jnp.float32).astype(jnp.bfloat16)[:, :32]
    t1, t2 = timeit(loop_of(f, N1, k), q), timeit(loop_of(f, N2, k), q)
    per = (t2 - t1) / (N2 - N1)
    emit(bench="blockdiag_dot_320x32x3584", per_op_us=per * 1e6,
         tflops=320 * 32 * 3584 * 2 / per / 1e12)


# --------------------------------------------------------- 5. pallas kernels
def pallas_forms():
    H, D, P, S, R = 4, 32, 10, 112, 32
    INNER = 64  # fori iterations inside the kernel

    def time_kernel(name, kernel, inputs, out_shape, grid, flops_per_program):
        f = jax.jit(lambda *a: pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        )(*a))
        t0 = time.perf_counter()
        out = f(*inputs)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t = timeit(f, *inputs, iters=10)
        n_programs = int(np.prod(grid)) if grid else 1
        emit(bench=name, total_us=t * 1e6,
             per_program_per_iter_us=t / n_programs / INNER * 1e6,
             compile_s=round(compile_s, 1),
             tflops=flops_per_program * n_programs * INNER / t / 1e12)

    key = jax.random.key(1)

    # trivial kernel: launch overhead, grid (1,) and (32,)
    def triv_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    x = jax.random.normal(key, (8, 128), jnp.float32)
    for g in (1, 32, 256):
        f = jax.jit(lambda a: pl.pallas_call(
            triv_kernel, grid=(g,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(a))
        t = timeit(f, x, iters=20)
        emit(bench=f"pallas_trivial_grid{g}", total_us=t * 1e6)

    # in-kernel batched tiny dots (round-1 attention form), R robots resident
    def batched_kernel(q_ref, k_ref, o_ref):
        q0 = q_ref[...]
        k = k_ref[...]

        def body(i, acc):
            q = q0 * (1.0 + 1e-6 * i)
            s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            return acc + s

        o_ref[...] = jax.lax.fori_loop(
            0, INNER, body, jnp.zeros((R, P, S), jnp.float32))

    q = jax.random.normal(key, (R, P, D), jnp.bfloat16)
    k = jax.random.normal(key, (R, S, D), jnp.bfloat16)
    time_kernel("pallas_batched_tinydot_R32", batched_kernel, (q, k),
                jax.ShapeDtypeStruct((R, P, S), jnp.float32), (32,),
                R * P * S * D * 2)

    # in-kernel block-diagonal dot: (R*P, D) @ (D, R*S)
    def bd_kernel(q_ref, k_ref, o_ref):
        q0 = q_ref[...]
        k = k_ref[...]

        def body(i, acc):
            q = q0 * (1.0 + 1e-6 * i)
            s = jax.lax.dot(q, k, preferred_element_type=jnp.float32)
            return acc + s

        o_ref[...] = jax.lax.fori_loop(
            0, INNER, body, jnp.zeros((R * P, R * S), jnp.float32))

    q = jax.random.normal(key, (R * P, D), jnp.bfloat16)
    k = jax.random.normal(key, (D, R * S), jnp.bfloat16)
    time_kernel("pallas_blockdiag_dot_R32", bd_kernel, (q, k),
                jax.ShapeDtypeStruct((R * P, R * S), jnp.float32), (32,),
                R * P * R * S * D * 2)

    # in-kernel dense matmul (R*P, E) @ (E, 3E)
    E = 128

    def dense_kernel(x_ref, w_ref, o_ref):
        x0 = x_ref[...]
        w = w_ref[...]

        def body(i, acc):
            x = x0 * (1.0 + 1e-6 * i)
            return acc + jax.lax.dot(x, w, preferred_element_type=jnp.float32)

        o_ref[...] = jax.lax.fori_loop(
            0, INNER, body, jnp.zeros((R * P, 3 * E), jnp.float32))

    x = jax.random.normal(key, (R * P, E), jnp.bfloat16)
    w = jax.random.normal(key, (E, 3 * E), jnp.bfloat16)
    time_kernel("pallas_dense_320x128x384", dense_kernel, (x, w),
                jax.ShapeDtypeStruct((R * P, 3 * E), jnp.float32), (32,),
                R * P * E * 3 * E * 2)

    # in-kernel softmax over block-diag scores (VPU cost)
    def softmax_kernel(s_ref, o_ref):
        s0 = s_ref[...]

        def body(i, acc):
            s = s0 + 1e-6 * i
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            return acc + p / jnp.sum(p, axis=-1, keepdims=True)

        o_ref[...] = jax.lax.fori_loop(
            0, INNER, body, jnp.zeros((R * P, R * S), jnp.float32))

    s = jax.random.normal(key, (R * P, R * S), jnp.float32)
    time_kernel("pallas_softmax_320x3584", softmax_kernel, (s,),
                jax.ShapeDtypeStruct((R * P, R * S), jnp.float32), (32,),
                R * P * R * S * 6)


# ------------------------------------------------- 6. persistent-cache probe
CHILD_SNIPPET = r"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k(x_ref, o_ref):
    o_ref[...] = jnp.dot(x_ref[...], x_ref[...].T, preferred_element_type=jnp.float32)

x = jnp.ones((256, 256), jnp.bfloat16)
f = jax.jit(lambda a: pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32))(a))
t0 = time.perf_counter()
f(x).block_until_ready()
print(f"COMPILE_S {time.perf_counter()-t0:.2f}", flush=True)
"""


def cache_probe():
    for run in (1, 2):
        t0 = time.perf_counter()
        proc = subprocess.run([sys.executable, "-c", CHILD_SNIPPET],
                              capture_output=True, text=True, timeout=1200)
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("COMPILE_S")]
        emit(bench=f"mosaic_cache_probe_run{run}",
             compile_s=float(line[0].split()[1]) if line else None,
             wall_s=round(time.perf_counter() - t0, 1), rc=proc.returncode,
             stderr_tail=proc.stderr.strip().splitlines()[-2:] if proc.returncode else [])


if __name__ == "__main__":
    emit(bench="devices", devices=str(jax.devices()))
    op_chain_cost()
    matmul_forms()
    pallas_forms()
    cache_probe()
    emit(bench="done")
