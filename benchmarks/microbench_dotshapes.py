"""DEPRECATED — measurements from this file are INVALID on the axon
tunnel runtime: it repeats calls with identical input buffers and small
outputs, which the runtime serves from a result cache (~0.02 ms "timings"
for arbitrarily large kernels; see CLAUDE.md "BENCHMARK VALIDITY" and
docs/perf_notes.md round 2). Kept for the record. Use
benchmarks/microbench_chunk_ablate.py's whole-kernel ablation methodology
instead: one large-work call per measurement, distinct inputs, per-call
sync, multi-MB outputs.

Original (invalid) description follows.

Isolate the MXU cost of the fused-chunk attention dot shapes.

The grouped block-diagonal rewrite (fused_chunk.py group_robots) measured
2x SLOWER than the batched per-robot dots it replaced (112 ms vs 57 ms for
the full chunk), contradicting the op-issue-floor model. This bench times
each candidate dot formulation alone, chained inside a fori_loop so nothing
is hoisted, to find where the cycles actually go:

  * batched      — (R, HP, E) x (R, S, E) ct(2,2)      [current kernel]
  * flat_ct11    — (R*HP, E) x (R*S, E) ct(1,1)        [grouped, as landed]
  * flat_kT      — (R*HP, E) x (E, R*S) ct(1,0)        [pre-transposed K]
  * flat_kT_pad  — same with S padded to 128-aligned lanes
  * value dots for the winning score layout

Run: nohup python benchmarks/microbench_dotshapes.py > /tmp/dotshapes.log 2>&1 &
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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, HP, E, S = 16, 40, 128, 301
SPAD = 384  # lane-aligned padded context length
INNER = int(os.environ.get("INNER", "256"))
GRID = int(os.environ.get("GRID", "8"))
bf = jnp.bfloat16


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
    try:
        t0 = time.perf_counter()
        jax.block_until_ready(f(*inputs))
        compile_s = time.perf_counter() - t0
        t = timeit(f, *inputs)
        emit(bench=name, per_iter_us=round(t / GRID / INNER * 1e6, 3),
             total_ms=round(t * 1e3, 3), compile_s=round(compile_s, 1))
    except Exception as e:  # noqa: BLE001
        emit(bench=name, error=repr(e)[:200])


def chain(component, init):
    def body(i, x):
        y = component(x)
        return (x * 0.5 + 0.5 * y).astype(x.dtype)
    return jax.lax.fori_loop(0, INNER, body, init)


key = jax.random.key(0)


def main():
    emit(bench="devices", devices=str(jax.devices()))

    # ---- score dots: q x K^T, squashed back to q's shape via row-sum
    q_b = jax.random.normal(key, (R, HP, E), jnp.float32)
    k_b = jax.random.normal(key, (R, S, E), bf)

    def k_batched(q_ref, k_ref, o_ref):
        k = k_ref[...]

        def comp(q):
            s = jax.lax.dot_general(q.astype(bf), k, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            return jnp.abs(jax.lax.slice_in_dim(s, 0, q.shape[-1], axis=-1)) * 1e-3

        o_ref[...] = chain(comp, q_ref[...])

    run("score_batched_ct22", k_batched, (q_b, k_b),
        jax.ShapeDtypeStruct((R, HP, E), jnp.float32))

    q_f = jax.random.normal(key, (R * HP, E), jnp.float32)
    k_f = jax.random.normal(key, (R * S, E), bf)

    def k_flat11(q_ref, k_ref, o_ref):
        k = k_ref[...]

        def comp(q):
            s = jax.lax.dot_general(q.astype(bf), k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return jnp.abs(jax.lax.slice_in_dim(s, 0, q.shape[-1], axis=-1)) * 1e-3

        o_ref[...] = chain(comp, q_ref[...])

    run("score_flat_ct11", k_flat11, (q_f, k_f),
        jax.ShapeDtypeStruct((R * HP, E), jnp.float32))

    kT = jax.random.normal(key, (E, R * S), bf)

    def k_flatT(q_ref, k_ref, o_ref):
        k = k_ref[...]

        def comp(q):
            s = jax.lax.dot_general(q.astype(bf), k, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return jnp.abs(jax.lax.slice_in_dim(s, 0, q.shape[-1], axis=-1)) * 1e-3

        o_ref[...] = chain(comp, q_ref[...])

    run("score_flat_kT", k_flatT, (q_f, kT),
        jax.ShapeDtypeStruct((R * HP, E), jnp.float32))

    kTp = jax.random.normal(key, (E, R * SPAD), bf)

    def k_flatTp(q_ref, k_ref, o_ref):
        k = k_ref[...]

        def comp(q):
            s = jax.lax.dot_general(q.astype(bf), k, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return jnp.abs(jax.lax.slice_in_dim(s, 0, q.shape[-1], axis=-1)) * 1e-3

        o_ref[...] = chain(comp, q_ref[...])

    run("score_flat_kT_pad", k_flatTp, (q_f, kTp),
        jax.ShapeDtypeStruct((R * HP, E), jnp.float32))

    # per-group flat (G=4): 4 dots of (160, E) x (E, 4*S)
    G = 4

    def k_groupT(q_ref, k_ref, o_ref):
        k = k_ref[...]  # (E, R*S)

        def comp(q):
            outs = []
            for g in range(R // G):
                qg = jax.lax.slice_in_dim(q, g * G * HP, (g + 1) * G * HP, axis=0)
                kg = jax.lax.slice_in_dim(k, g * G * S, (g + 1) * G * S, axis=1)
                s = jax.lax.dot_general(qg.astype(bf), kg, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                outs.append(jnp.abs(jax.lax.slice_in_dim(s, 0, E, axis=-1)) * 1e-3)
            return jnp.concatenate(outs, axis=0)

        o_ref[...] = chain(comp, q_ref[...])

    run("score_group4_kT", k_groupT, (q_f, kT),
        jax.ShapeDtypeStruct((R * HP, E), jnp.float32))

    # ---- value dots: p x V
    p_b = jax.random.normal(key, (R, HP, S), jnp.float32)
    v_b = jax.random.normal(key, (R, S, E), bf)

    def v_batched(p_ref, v_ref, o_ref):
        v = v_ref[...]

        def comp(p):
            o = jax.lax.dot_general(p.astype(bf), v, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            return jnp.abs(jnp.concatenate([o] * (p.shape[-1] // o.shape[-1] + 1), axis=-1)[..., :p.shape[-1]]) * 1e-3

        o_ref[...] = chain(comp, p_ref[...])

    run("value_batched_ct21", v_batched, (p_b, v_b),
        jax.ShapeDtypeStruct((R, HP, S), jnp.float32))

    p_f = jax.random.normal(key, (R * HP, R * S), jnp.float32)
    v_f = jax.random.normal(key, (R * S, E), bf)

    def v_flat(p_ref, v_ref, o_ref):
        v = v_ref[...]

        def comp(p):
            o = jax.lax.dot_general(p.astype(bf), v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return jnp.abs(jnp.concatenate([o] * (p.shape[-1] // o.shape[-1] + 1), axis=-1)[..., :p.shape[-1]]) * 1e-3

        o_ref[...] = chain(comp, p_ref[...])

    run("value_flat_full", v_flat, (p_f, v_f),
        jax.ShapeDtypeStruct((R * HP, R * S), jnp.float32))

    emit(bench="done")


if __name__ == "__main__":
    main()
