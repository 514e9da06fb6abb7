"""Find the non-sampler residual of a serving replan period on the chip.

bench.py shows ~74 ms/period for ddim30-chunk (kernel alone: ~55 ms) and
~27 ms for distilled-1 (kernel alone: a few ms) — both carry a ~20 ms
residual. This times: the full period, the period with the sampler stubbed
out (noise passthrough), the sampler alone, and the distilled KV
pack/precompute chain, at bench shapes.

Run: nohup python benchmarks/microbench_residual.py > /tmp/residual.log 2>&1 &
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


class StubSamplerEngine(RolloutEngine):
    """Replan period with the sampler replaced by a noise passthrough —
    isolates buffer/plant/encode overhead."""

    def _sample_chunk(self, variables, controller, rng):
        batch = make_controller_batch(self.cfg, controller)
        context = self.model.apply(variables, batch, False,
                                   method=self.model.encode_context)
        bsz = context.shape[0]
        shape = (bsz, self.cfg.trajectory_prediction_length, self.cfg.num_joints)
        noise = jax.random.normal(rng, shape, dtype=jnp.float32)
        # keep context live so the encode is not dead-code-eliminated
        noise = noise + 1e-12 * jnp.mean(context)
        return self.normalizer.denormalize(noise)


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

    stub = StubSamplerEngine(model, schedule, normalizer, num_inference_steps=1)
    carry = stub.init(B, jax.random.key(0))
    batch = make_controller_batch(cfg, carry.controller)
    variables = model.init(jax.random.key(1), batch,
                           jnp.zeros((B, 10, 20)), jnp.zeros((B,), jnp.int32))

    f_stub = jax.jit(stub.replan_period)
    t = timeit(f_stub, variables, carry)
    emit(bench="replan_stub_sampler", ms=round(t * 1e3, 3))

    # distilled path pieces: encode -> precompute_context_kv -> pack
    from soccerdiffusion_tpu.ops.fused_denoise import FusedDenoiser

    fused = FusedDenoiser(model, variables["params"], block_robots=32)

    def enc(v, b):
        return model.apply(v, b, False, method=model.encode_context)

    f_enc = jax.jit(enc)
    context = jax.block_until_ready(f_enc(variables, batch))
    emit(bench="encode_context", ms=round(timeit(f_enc, variables, batch) * 1e3, 3))

    def kvpack(v, ctx):
        kv = model.apply(v, ctx, method=model.precompute_context_kv)
        return fused.pack_context_kv(kv)

    f_kv = jax.jit(kvpack)
    packed = jax.block_until_ready(f_kv(variables, context))
    emit(bench="precompute_plus_pack_kv", ms=round(timeit(f_kv, variables, context) * 1e3, 3))

    st = model.apply(variables, jnp.zeros((1,), jnp.int32),
                     method=lambda m, tt: m.step_encoding(tt))[0, 0]
    noise = jax.random.normal(jax.random.key(2), (B, 10, 20), jnp.float32)

    f_k1 = jax.jit(lambda p, n, s: fused(p, n, s))
    jax.block_until_ready(f_k1(packed, noise, st))
    emit(bench="distilled_step_kernel_R32", ms=round(timeit(f_k1, packed, noise, st) * 1e3, 3))

    # full distilled replan for reference
    dist = RolloutEngine(model, schedule, normalizer, num_inference_steps=1,
                         distilled=True, fused="chunk", fused_block_robots=32)
    dcarry = dist.init(B, jax.random.key(3))
    f_dist = jax.jit(dist.replan_period)
    jax.block_until_ready(f_dist(variables, dcarry))
    emit(bench="replan_distilled_full", ms=round(timeit(f_dist, variables, dcarry) * 1e3, 3))


if __name__ == "__main__":
    main()
