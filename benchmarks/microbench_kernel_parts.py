"""DEPRECATED — measurements from this file are INVALID on the axon
tunnel runtime: it repeats calls with identical input buffers and small
outputs, which the runtime serves from a result cache (~0.02 ms "timings"
for arbitrarily large kernels; see CLAUDE.md "BENCHMARK VALIDITY" and
docs/perf_notes.md round 2). Kept for the record. Use
benchmarks/microbench_chunk_ablate.py's whole-kernel ablation methodology
instead: one large-work call per measurement, distinct inputs, per-call
sync, multi-MB outputs.

Original (invalid) description follows.

In-kernel component timing at the fused_chunk shapes (R=8: rows 80,
ctx 896) to find where the measured ~31 us per (8-robot, step) goes.

Every variant CHAINS the component: x_{i+1} = g(component(x_i)) inside a
fori_loop, so nothing can be hoisted or elided. A calibration kernel
(re-running microbench_tpu's batched tiny dot in the same harness) sanity
-checks the methodology.

Run: nohup python benchmarks/microbench_kernel_parts.py > /tmp/microbench4.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from soccerdiffusion_tpu.ops.fused_denoise import _gelu_exact, _layer_norm

RP, RS, E, D, H = 80, 896, 128, 32, 4
INNER = 64
GRID = 32


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


def run(name, kernel, inputs, out_shape):
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel, grid=(GRID,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(*a))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*inputs))
    compile_s = time.perf_counter() - t0
    t = timeit(f, *inputs)
    emit(bench=name, per_program_per_iter_us=t / GRID / INNER * 1e6,
         total_ms=round(t * 1e3, 3), compile_s=round(compile_s, 1))


key = jax.random.key(0)
bf = jnp.bfloat16


def dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def chain(component, init):
    """x_{i+1} = tanh-squash(component(x_i, i)) — strictly sequential."""
    def body(i, x):
        y = component(x, i)
        # squash back to the carry's shape/scale without big extra cost
        return (x * 0.5 + 0.5 * y).astype(x.dtype)
    return jax.lax.fori_loop(0, INNER, body, init)


def main():
    emit(bench="devices", devices=str(jax.devices()))
    x80f = jax.random.normal(key, (RP, E), jnp.float32)
    qkv_w = jax.random.normal(key, (E, 3 * E), bf)
    ctx_k = jax.random.normal(key, (D, RS), bf)
    ctx_v = jax.random.normal(key, (RS, D), bf)

    # 0. calibration: batched tiny dot (microbench_tpu measured 2.03us)
    def k_calib(q_ref, k_ref, o_ref):
        k = k_ref[...]

        def comp(x, i):
            s = jax.lax.dot_general(x.astype(bf), k, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)  # (32,10,112)
            return jnp.pad(jnp.sum(s, axis=-1, keepdims=True) * 1e-3,
                           ((0, 0), (0, 0), (0, 31)))

        o_ref[...] = chain(comp, q_ref[...])

    q3 = jax.random.normal(key, (32, 10, 32), jnp.float32)
    k3 = jax.random.normal(key, (32, 112, 32), bf)
    run("calib_batched_tinydot", k_calib, (q3, k3),
        jax.ShapeDtypeStruct((32, 10, 32), jnp.float32))

    # 1. full self-attention block (qkv matmul + lane-sliced heads)
    def k_self(x_ref, w_ref, o_ref):
        w = w_ref[...]

        def comp(x, i):
            qkv = dot(x.astype(bf), w).astype(bf)  # (RP, 3E)
            heads = []
            for hh in range(H):
                qh = jax.lax.slice_in_dim(qkv, hh * D, (hh + 1) * D, axis=1)
                kh = jax.lax.slice_in_dim(qkv, E + hh * D, E + (hh + 1) * D, axis=1)
                vh = jax.lax.slice_in_dim(qkv, 2 * E + hh * D, 2 * E + (hh + 1) * D, axis=1)
                s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                heads.append(dot(p.astype(bf), vh).astype(bf))
            return jnp.concatenate(heads, axis=-1).astype(jnp.float32)

        o_ref[...] = chain(comp, x_ref[...])

    run("self_attn_block", k_self, (x80f, qkv_w),
        jax.ShapeDtypeStruct((RP, E), jnp.float32))

    # 2. cross-attention block (4 heads vs block-diag context)
    def k_cross(x_ref, k_ref, v_ref, o_ref):
        kk, vv = k_ref[...], v_ref[...]

        def comp(x, i):
            heads = []
            for hh in range(H):
                qh = jax.lax.slice_in_dim(x.astype(bf), hh * D, (hh + 1) * D, axis=1)
                s = dot(qh, kk)  # (RP, RS) fp32
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                heads.append(dot(p.astype(bf), vv).astype(bf))
            return jnp.concatenate(heads, axis=-1).astype(jnp.float32)

        o_ref[...] = chain(comp, x_ref[...])

    run("cross_attn_block", k_cross, (x80f, ctx_k, ctx_v),
        jax.ShapeDtypeStruct((RP, E), jnp.float32))

    # 3. cross dots only, no softmax
    def k_cross_dots(x_ref, k_ref, v_ref, o_ref):
        kk, vv = k_ref[...], v_ref[...]

        def comp(x, i):
            heads = []
            for hh in range(H):
                qh = jax.lax.slice_in_dim(x.astype(bf), hh * D, (hh + 1) * D, axis=1)
                s = dot(qh, kk)
                heads.append(dot((s * 1e-3).astype(bf), vv).astype(bf))
            return jnp.concatenate(heads, axis=-1).astype(jnp.float32)

        o_ref[...] = chain(comp, x_ref[...])

    run("cross_dots_only", k_cross_dots, (x80f, ctx_k, ctx_v),
        jax.ShapeDtypeStruct((RP, E), jnp.float32))

    # 4. LN x3 + MLP (2 matmuls + gelu)
    g1 = jax.random.normal(key, (1, E), jnp.float32)
    w1 = jax.random.normal(key, (E, E), bf)

    def k_dense(x_ref, g_ref, w_ref, o_ref):
        g = g_ref[...][0]
        w = w_ref[...]

        def comp(x, i):
            y = x
            for _ in range(3):
                y = _layer_norm(y, g, g * 0)
            m1 = _gelu_exact(dot(y.astype(bf), w)).astype(bf)
            return dot(m1, w).astype(jnp.float32)

        o_ref[...] = chain(comp, x_ref[...])

    run("ln3_plus_mlp", k_dense, (x80f, g1, w1),
        jax.ShapeDtypeStruct((RP, E), jnp.float32))

    # 5. softmax only on (RP, RS) fp32 x4
    s0 = jax.random.normal(key, (RP, RS), jnp.float32)

    def k_softmax(s_ref, o_ref):
        def comp(x, i):
            y = x
            for _ in range(H):
                m = jnp.max(y, axis=-1, keepdims=True)
                p = jnp.exp(y - m)
                y = p / jnp.sum(p, axis=-1, keepdims=True) + y * 0.1
            return y

        o_ref[...] = chain(comp, s_ref[...])

    run("softmax_x4_80x896", k_softmax, (s0,),
        jax.ShapeDtypeStruct((RP, RS), jnp.float32))

    emit(bench="done")


if __name__ == "__main__":
    main()
