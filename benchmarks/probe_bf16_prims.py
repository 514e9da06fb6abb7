"""Probe: which bf16 VPU primitives does v5e Mosaic support?

Context: the fused-block "bf16" GELU failed with `Target does not support
this comparison` (arith.cmpf on vector<8x128x2xbf16>). The poly chain is
FMAs + clip + where; this compiles one tiny kernel per primitive to map
the supported set before redesigning.

Run (TPU, one client): python benchmarks/probe_bf16_prims.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_case(name, body):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((256, 512)),
                    jnp.bfloat16)

    def kernel(x_ref, y_ref):
        y_ref[...] = body(x_ref[...])

    try:
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        jax.block_until_ready(y)
        print(f"{name}: OK", flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:140]
        print(f"{name}: FAIL {msg}", flush=True)
        return False


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    run_case("fma_chain", lambda z: (z * z) * jnp.asarray(0.5, z.dtype)
             + z + jnp.asarray(0.25, z.dtype))
    run_case("maximum0", lambda z: jnp.maximum(z, jnp.asarray(0.0, z.dtype)))
    run_case("minimum", lambda z: jnp.minimum(z, jnp.asarray(1.0, z.dtype)))
    run_case("clip", lambda z: jnp.clip(z, -3.75, 3.75))
    run_case("cmp_bf16", lambda z: jnp.where(z > 3.75, z, z * z))
    run_case("select_f32mask",
             lambda z: jnp.where(z.astype(jnp.float32) > 3.75, z, z * z))
    run_case("exp_bf16", lambda z: jnp.exp(z))
    run_case("abs_bf16", lambda z: jnp.abs(z))



# appended after the first probe run: quick-GELU needs bf16 division
# (sigmoid) — probe it plus the full sigmoid form
def extra():
    run_case("div_bf16", lambda z: jnp.asarray(1.0, z.dtype) / (jnp.asarray(1.0, z.dtype) + jnp.exp(-z)))
    run_case("sigmoid_chain", lambda z: z * (1.0 / (1.0 + jnp.exp(-1.702 * z))))


if __name__ == "__main__":
    main()
    extra()
