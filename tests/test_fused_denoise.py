"""Fused Pallas denoiser vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.diffusion import ddim_sample, ddim_timesteps, make_schedule
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.ops.fused_denoise import FusedDenoiser

CFG = ModelConfig(
    num_joints=20, hidden_dim=128, trajectory_prediction_length=10,
    action_context_length=24, joint_state_context_length=24, imu_context_length=24,
    use_images=False, use_gamestate=True,
    num_action_history_encoder_layers=1, num_imu_encoder_layers=1,
    joint_state_encoder_layers=1, num_decoder_layers=2,
)


def setup(b=4):
    rng = np.random.default_rng(0)
    model = DiffusionPolicy(CFG)
    batch = {
        "joint_command_history": jnp.asarray(rng.random((b, 24, 20), dtype=np.float32)),
        "rotation": jnp.asarray(rng.random((b, 24, 4), dtype=np.float32)),
        "joint_state": jnp.asarray(rng.random((b, 24, 20), dtype=np.float32)),
        "game_state": jnp.zeros((b,), jnp.int32),
    }
    noisy = jnp.asarray(rng.standard_normal((b, 10, 20)).astype(np.float32))
    # sampling uses one shared timestep per denoise call
    t = jnp.full((b,), 37, jnp.int32)
    variables = model.init(jax.random.key(0), batch, noisy, t)
    ctx = model.apply(variables, batch, method=model.encode_context)
    kv = model.apply(variables, ctx, method=model.precompute_context_kv)
    return model, variables, kv, noisy, t


def step_token(model, variables, t):
    return model.apply(variables, t, method=lambda m, tt: m.step_encoding(tt))[0, 0]


class TestFusedDenoiser:
    def test_matches_xla_path(self):
        model, variables, kv, noisy, t = setup()
        expected = model.apply(variables, kv, noisy, t, method=model.denoise_with_kv)
        fused = FusedDenoiser(model, variables["params"], interpret=True, block_robots=2)
        got = fused(fused.pack_context_kv(kv), noisy, step_token(model, variables, t))
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-3, atol=2e-3)

    def test_batch_block_sizes(self):
        model, variables, kv, noisy, t = setup(b=8)
        expected = model.apply(variables, kv, noisy, t, method=model.denoise_with_kv)
        st = step_token(model, variables, t)
        for block in (2, 4, 8):
            fused = FusedDenoiser(model, variables["params"], interpret=True,
                                  block_robots=block)
            got = fused(fused.pack_context_kv(kv), noisy, st)
            np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                       rtol=2e-3, atol=2e-3)

    def test_in_kernel_ddim_step_matches(self):
        from soccerdiffusion_tpu.diffusion import ddim_step

        model, variables, kv, noisy, t = setup()
        sched = make_schedule(100)
        eps = model.apply(variables, kv, noisy, t, method=model.denoise_with_kv)
        tt = int(t[0])
        expected = ddim_step(sched, eps, tt, tt - 10, noisy)

        acp = np.asarray(sched.alphas_cumprod, dtype=np.float64)
        abar_t, abar_prev = acp[tt], acp[tt - 10]
        coefs = jnp.asarray([[1 / np.sqrt(abar_t), np.sqrt(1 - abar_t),
                              np.sqrt(abar_prev), np.sqrt(1 - abar_prev)]], jnp.float32)
        fused = FusedDenoiser(model, variables["params"], interpret=True, block_robots=2)
        got = fused(fused.pack_context_kv(kv), noisy, step_token(model, variables, t),
                    ddim_coefs=coefs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=5e-3, atol=5e-3)

    def test_full_sample_matches_xla_sampler(self):
        model, variables, kv, noisy, t = setup()
        sched = make_schedule(100)
        steps = 10
        b = noisy.shape[0]

        def denoise_fn(x, tt):
            return model.apply(variables, kv, x, jnp.full((b,), tt, jnp.int32),
                               method=model.denoise_with_kv)

        expected = ddim_sample(sched, denoise_fn, noisy, steps)

        ts = ddim_timesteps(100, steps)
        st_table = jnp.stack([
            step_token(model, variables, jnp.full((1,), int(tt), jnp.int32))
            for tt in ts
        ])
        fused = FusedDenoiser(model, variables["params"], interpret=True, block_robots=2)
        got = fused.sample(fused.pack_context_kv(kv), noisy, st_table, sched, steps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-2, atol=2e-2)


class TestHeadConfigGuards:
    def test_eight_head_h512_parity(self):
        """Non-default head count: derived from config, verified vs XLA."""
        cfg8 = ModelConfig(**{**CFG.__dict__, "hidden_dim": 512,
                              "num_decoder_heads": 8})
        rng = np.random.default_rng(1)
        model = DiffusionPolicy(cfg8)
        b = 2
        batch = {
            "joint_command_history": jnp.asarray(rng.random((b, 24, 20), dtype=np.float32)),
            "rotation": jnp.asarray(rng.random((b, 24, 4), dtype=np.float32)),
            "joint_state": jnp.asarray(rng.random((b, 24, 20), dtype=np.float32)),
            "game_state": jnp.zeros((b,), jnp.int32),
        }
        noisy = jnp.asarray(rng.standard_normal((b, 10, 20)).astype(np.float32))
        t = jnp.full((b,), 11, jnp.int32)
        variables = model.init(jax.random.key(3), batch, noisy, t)
        ctx = model.apply(variables, batch, method=model.encode_context)
        kv = model.apply(variables, ctx, method=model.precompute_context_kv)
        expected = model.apply(variables, kv, noisy, t, method=model.denoise_with_kv)

        fused = FusedDenoiser(model, variables["params"], interpret=True, block_robots=2)
        assert fused.num_heads == 8 and fused.head_dim == 64
        got = fused(fused.pack_context_kv(kv), noisy, step_token(model, variables, t))
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-3, atol=2e-3)

    def test_mismatched_heads_raise_at_build(self):
        cfg_bad = ModelConfig(**{**CFG.__dict__, "num_decoder_heads": 3})
        model, variables, kv, noisy, t = setup()
        bad_model = DiffusionPolicy(cfg_bad)
        try:
            FusedDenoiser(bad_model, variables["params"], interpret=True)
            assert False, "should raise"
        except ValueError as e:
            assert "divisible" in str(e)

    def test_layer_count_mismatch_raises(self):
        model, variables, kv, noisy, t = setup()
        cfg_more = ModelConfig(**{**CFG.__dict__, "num_decoder_layers": 5})
        try:
            FusedDenoiser(DiffusionPolicy(cfg_more), variables["params"], interpret=True)
            assert False, "should raise"
        except ValueError as e:
            assert "layers" in str(e)
