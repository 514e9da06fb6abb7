"""Attribute the fused ViT block's kernel time on the real chip.

The round-3 flagship train step measured 117.3 ms at B=256 / frames=16
(26.5% MFU, benchmarks/train_mfu.py). This microbench splits that time:

  1. the 8-block fused ViT stack itself (fwd and fwd+bwd), timed as ONE
     jitted call chaining depth=8 blocks (so the ~15-35 ms tunnel RTT is
     amortized and the per-call work is far above the result-cache regime);
  2. kernel-internal attribution via the ``ablate`` knob of
     ops/fused_vit_block.make_vit_block_fn: no_attn (whole attention
     sublayer), no_mlp (whole MLP sublayer), relu_gelu (polynomial-erf GELU
     -> ReLU: isolates the VPU transcendental cost), no_softmax (exp/
     normalize removed, score dots kept).

MEASUREMENT VALIDITY (CLAUDE.md): every timed call consumes a distinct
freshly-materialized x (and dy), one call per measurement with per-call
sync, and outputs are ~64 MB — far above the tunnel result-cache regime;
a checksum is printed per iteration as a did-it-run cross-check.

Run: nohup python benchmarks/microbench_vit_block.py > /tmp/mb_vit.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.ops.fused_vit_block import make_vit_block_fn

# vit_flagship geometry: B=256, 10 frames -> N=2560 rows of (T=49, W=256)
N, T, W, FF, HEADS, DEPTH, FRAMES = 2560, 49, 256, 1024, 4, 8, 16
# every one-call measurement includes one tunnel round trip (~15-35 ms,
# CLAUDE.md); measure at MB_DEPTH=16 too and difference against 8 to get
# the RTT-free marginal cost of an 8-block stack
DEPTH = int(os.environ.get("MB_DEPTH", DEPTH))
# MB_T=64 measures the current tile-aligned patch-28 geometry; MB_GELU
# overrides the default activation for the non-GELU-specific variants
# (e.g. "quick", the flagship default).
T = int(os.environ.get("MB_T", T))
GELU = os.environ.get("MB_GELU", "exact")
ITERS = 3


def emit(**kw):
    print(json.dumps(kw), flush=True)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_weights(rng):
    s = lambda *shape: jnp.asarray(rng.standard_normal(shape) * 0.02,
                                   jnp.float32)
    return (jnp.ones((W,), jnp.float32), jnp.zeros((W,), jnp.float32),
            s(W, 3 * W), jnp.zeros((3 * W,), jnp.float32),
            s(W, W), jnp.zeros((W,), jnp.float32),
            jnp.ones((W,), jnp.float32), jnp.zeros((W,), jnp.float32),
            s(W, FF), jnp.zeros((FF,), jnp.float32),
            s(FF, W), jnp.zeros((W,), jnp.float32))


def bench_variant(name: str, ablate: tuple, weights, rng, gelu="exact",
                  layout="stacked"):
    block = make_vit_block_fn(HEADS, FRAMES, ablate=ablate, gelu=gelu,
                              layout=layout)

    def stack(x, w):
        # fp32 master weights cast to the bf16 compute dtype INSIDE the
        # differentiated fn — exactly what FusedTransformerEncoderLayer
        # does (models/transformer.py), so dots run at bf16 MXU rate and
        # the fp32 weight grads flow back through the astype. Python loop
        # (8 inlined blocks), matching the production encoder structure —
        # lax.scan would also assert on the kernel's fp32 weight-grad
        # accumulators vs bf16 primals in its transpose rule.
        wb = tuple(t.astype(jnp.bfloat16) for t in w)
        for _ in range(DEPTH):
            x = block(x, *wb).astype(x.dtype)
        return x

    fwd = jax.jit(stack)
    vjp_call = jax.jit(
        lambda x, w, dy: jax.vjp(stack, x, w)[1](dy))

    xs = [jnp.asarray(rng.standard_normal((N, T, W)), jnp.bfloat16)
          for _ in range(ITERS + 1)]
    dys = [jnp.asarray(rng.standard_normal((N, T, W)), jnp.bfloat16)
           for _ in range(ITERS + 1)]
    jax.block_until_ready((xs, dys))

    # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(fwd(xs[-1], weights))
    fwd_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(vjp_call(xs[-1], weights, dys[-1]))
    vjp_compile = time.perf_counter() - t0

    fwd_t, vjp_t = [], []
    for i in range(ITERS):
        t0 = time.perf_counter()
        y = fwd(xs[i], weights)
        jax.block_until_ready(y)
        fwd_t.append(time.perf_counter() - t0)
        log(f"{name} fwd iter {i}: {fwd_t[-1]*1e3:.2f} ms "
            f"(checksum {float(jnp.sum(y.astype(jnp.float32))):.4e})")
    for i in range(ITERS):
        t0 = time.perf_counter()
        dx, dw = vjp_call(xs[i], weights, dys[i])
        jax.block_until_ready(dx)
        vjp_t.append(time.perf_counter() - t0)
        log(f"{name} fwd+bwd iter {i}: {vjp_t[-1]*1e3:.2f} ms "
            f"(checksum {float(jnp.sum(dx.astype(jnp.float32))):.4e})")
    emit(variant=name, depth=DEPTH, rows=N,
         fwd_ms=round(statistics.median(fwd_t) * 1e3, 2),
         fwd_bwd_ms=round(statistics.median(vjp_t) * 1e3, 2),
         fwd_compile_s=round(fwd_compile, 1),
         vjp_compile_s=round(vjp_compile, 1))


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    weights = make_weights(rng)
    only = [v for v in os.environ.get("MB_VARIANTS", "").split(",") if v]
    variants = [
        ("full", (), GELU, "stacked"),
        # rank-3 per-head-loop attention layout: no stack/merge copies, no
        # misaligned (FT, W) reshapes (ops/fused_vit_block._headloop_core)
        ("headloop", (), GELU, "headloop"),
        ("headloop_no_attn", ("no_attn",), GELU, "headloop"),
        ("headloop_no_mlp", ("no_mlp",), GELU, "headloop"),
        ("poly_gelu", (), "poly", "stacked"),
        ("relu_gelu", ("relu_gelu",), GELU, "stacked"),
        ("no_softmax", ("no_softmax",), GELU, "stacked"),
        ("no_attn", ("no_attn",), GELU, "stacked"),
        ("no_mlp", ("no_mlp",), GELU, "stacked"),
        # both sublayers ablated: LN x2 + residual + x/y streaming + grid
        # skeleton — the non-additive "base" the deltas above sit on
        ("ln_only", ("no_attn", "no_mlp"), GELU, "stacked"),
    ]
    for name, ablate, gelu, layout in variants:
        if only and name not in only:
            continue
        bench_variant(name, ablate, weights, rng, gelu, layout)
    emit(bench="done")


if __name__ == "__main__":
    main()
