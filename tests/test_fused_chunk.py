"""Whole-chunk fused sampler (interpret mode on CPU) vs the XLA DDIM path."""

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.diffusion import ddim_sample, ddim_timesteps, make_schedule
from soccerdiffusion_tpu.ops.fused_chunk import FusedChunkSampler
from tests.test_fused_denoise import CFG, setup


def xla_sample(model, variables, kv, noise, schedule, steps):
    b = noise.shape[0]

    def denoise_fn(x, t):
        return model.apply(variables, kv, x, jnp.full((b,), t, jnp.int32),
                           method=model.denoise_with_kv)

    return ddim_sample(schedule, denoise_fn, noise, steps)


def step_table(model, variables, schedule, steps):
    ts = jnp.asarray(ddim_timesteps(schedule.num_train_timesteps, steps))
    return model.apply(variables, ts, method=lambda m, tt: m.step_encoding(tt))[:, 0]


class TestFusedChunkSampler:
    def test_full_chunk_matches_xla_sampler(self):
        model, variables, kv, noisy, t = setup(b=4)
        schedule = make_schedule(100)
        steps = 5
        expected = xla_sample(model, variables, kv, noisy, schedule, steps)

        fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                  block_robots=2)
        got = fused.sample(fused.pack_context_bd(kv), noisy,
                           step_table(model, variables, schedule, steps),
                           schedule, steps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=8e-3, atol=8e-3)

    def test_block_sizes_agree(self):
        model, variables, kv, noisy, t = setup(b=8)
        schedule = make_schedule(60)
        steps = 3
        st = step_table(model, variables, schedule, steps)
        outs = []
        for block in (2, 4, 8):
            fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                      block_robots=block)
            outs.append(np.asarray(fused.sample(
                fused.pack_context_bd(kv), noisy, st, schedule, steps)))
        np.testing.assert_allclose(outs[0], outs[1], rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(outs[0], outs[2], rtol=2e-3, atol=2e-3)

    def test_single_step_is_distilled_forward(self):
        """T=1 chunk == one denoise + one DDIM update (the distilled path)."""
        from soccerdiffusion_tpu.diffusion import ddim_step

        model, variables, kv, noisy, t = setup(b=4)
        schedule = make_schedule(50)
        expected = xla_sample(model, variables, kv, noisy, schedule, 1)

        fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                  block_robots=4)
        got = fused.sample(fused.pack_context_bd(kv), noisy,
                           step_table(model, variables, schedule, 1), schedule, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=5e-3, atol=5e-3)

    def test_rejects_indivisible_batch(self):
        model, variables, kv, noisy, t = setup(b=4)
        schedule = make_schedule(50)
        fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                  block_robots=3)
        try:
            fused.sample(fused.pack_context_bd(kv), noisy,
                         step_table(model, variables, schedule, 1), schedule, 1)
            assert False, "should raise"
        except AssertionError as e:
            assert "divisible" in str(e)
