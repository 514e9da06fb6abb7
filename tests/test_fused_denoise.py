"""Fused Pallas denoiser vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.config import ModelConfig
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
    t = jnp.asarray(rng.integers(0, 100, b).astype(np.int32))
    variables = model.init(jax.random.key(0), batch, noisy, t)
    return model, variables, batch, noisy, t


class TestFusedDenoiser:
    def test_matches_xla_path(self):
        model, variables, batch, noisy, t = setup()
        ctx = model.apply(variables, batch, method=model.encode_context)
        kv = model.apply(variables, ctx, method=model.precompute_context_kv)
        expected = model.apply(variables, kv, noisy, t, method=model.denoise_with_kv)

        fused = FusedDenoiser(model, variables["params"], interpret=True, block_robots=2)
        packed = fused.pack_context_kv(kv)
        step_tok = model.apply(variables, t, method=lambda m, tt: m.step_encoding(tt))[:, 0]
        got = fused(packed, noisy, step_tok)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-3, atol=2e-3)

    def test_batch_block_sizes(self):
        model, variables, batch, noisy, t = setup(b=8)
        ctx = model.apply(variables, batch, method=model.encode_context)
        kv = model.apply(variables, ctx, method=model.precompute_context_kv)
        expected = model.apply(variables, kv, noisy, t, method=model.denoise_with_kv)
        step_tok = model.apply(variables, t, method=lambda m, tt: m.step_encoding(tt))[:, 0]
        for block in (2, 4, 8):
            fused = FusedDenoiser(model, variables["params"], interpret=True,
                                  block_robots=block)
            got = fused(fused.pack_context_kv(kv), noisy, step_tok)
            np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                       rtol=2e-3, atol=2e-3)
