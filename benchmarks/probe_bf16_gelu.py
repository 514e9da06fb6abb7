"""Probe: which part of the fused-block "bf16" GELU variant fails Mosaic?

The MFU lane recorded `tpu_compile_helper exit 1` at every batch size
(so a lowering error, not OOM), but train_mfu truncates the exception.
This compiles the kernel piecewise on the real chip and prints FULL
tracebacks: (a) forward only, (b) forward+backward.

Run (TPU, one client): python benchmarks/probe_bf16_gelu.py
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.ops.fused_vit_block import make_vit_block_fn

W, T, H, FF = 256, 64, 4, 1024  # flagship fused-block geometry (aligned T)
N = 16


def weights(rng):
    def a(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.02,
                           jnp.bfloat16)
    return (a(W), a(W), a(W, 3 * W), a(3 * W), a(W, W), a(W),
            a(W), a(W), a(W, FF), a(FF), a(FF, W), a(W))


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, T, W)).astype(np.float32),
                    jnp.bfloat16)
    w = weights(rng)

    for name, gelu in (("exact-fwd", "exact"), ("bf16-fwd", "bf16")):
        try:
            fn = make_vit_block_fn(H, block_frames=16, interpret=False,
                                   gelu=gelu)
            y = jax.jit(fn)(x, *w)
            jax.block_until_ready(y)
            print(f"{name}: OK", flush=True)
        except Exception:
            print(f"{name}: FAIL", flush=True)
            traceback.print_exc()

    for name, gelu in (("exact-bwd", "exact"), ("bf16-bwd", "bf16")):
        try:
            fn = make_vit_block_fn(H, block_frames=16, interpret=False,
                                   gelu=gelu)

            def loss(xx, ww):
                return jnp.sum(fn(xx, *ww).astype(jnp.float32))

            g = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, w)
            jax.block_until_ready(g)
            print(f"{name}: OK", flush=True)
        except Exception:
            print(f"{name}: FAIL", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
