"""Parity tests for the fused context-encoder kernel (interpret mode).

The kernel must reproduce DiffusionPolicy.encode_context (models/policy.py:
88-109) — patch embed, sinusoidal posenc, pre-norm GELU encoder layers,
game-state token, canonical concat order — to bf16 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.inference.controller import (
    init_controller_state,
    make_controller_batch,
)
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.ops.fused_encoder import FusedContextEncoder


def build(cfg, batch_size, seed=0):
    model = DiffusionPolicy(cfg)
    ctrl = init_controller_state(cfg, batch_size)
    batch = make_controller_batch(cfg, ctrl)
    rng = np.random.default_rng(seed)
    for k, v in batch.items():
        if k == "game_state":
            batch[k] = jnp.asarray(rng.integers(0, 4, v.shape), jnp.int32)
        else:
            batch[k] = jnp.asarray(rng.normal(size=v.shape).astype(np.float32))
    variables = model.init(
        jax.random.key(1), batch,
        jnp.zeros((batch_size, cfg.trajectory_prediction_length, cfg.num_joints)),
        jnp.zeros((batch_size,), jnp.int32),
    )
    return model, variables, batch


def assert_context_parity(cfg, batch_size, block_robots, atol):
    model, variables, batch = build(cfg, batch_size)
    ref = model.apply(variables, batch, False, method=model.encode_context)
    fused = FusedContextEncoder(model, variables["params"], interpret=True,
                                block_robots=block_robots)
    out = fused.encode(batch)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=atol, rtol=atol)


def test_parity_default_family_bf16():
    cfg = ModelConfig(
        num_joints=6, hidden_dim=64, trajectory_prediction_length=5,
        action_context_length=16, joint_state_context_length=16,
        imu_context_length=16, use_images=False, use_gamestate=True,
        num_action_history_encoder_layers=2, num_imu_encoder_layers=2,
        joint_state_encoder_layers=2, num_decoder_layers=2,
        compute_dtype="bfloat16",
    )
    assert_context_parity(cfg, batch_size=8, block_robots=4, atol=5e-2)


def test_parity_float32_exact():
    cfg = ModelConfig(
        num_joints=6, hidden_dim=64, trajectory_prediction_length=5,
        action_context_length=12, joint_state_context_length=12,
        imu_context_length=12, use_images=False, use_gamestate=True,
        num_action_history_encoder_layers=1, num_imu_encoder_layers=1,
        joint_state_encoder_layers=1, num_decoder_layers=1,
        compute_dtype="float32",
    )
    assert_context_parity(cfg, batch_size=4, block_robots=4, atol=2e-5)


def test_parity_patch2_no_gamestate_imu5():
    cfg = ModelConfig(
        num_joints=6, hidden_dim=64, trajectory_prediction_length=5,
        action_context_length=16, joint_state_context_length=16,
        imu_context_length=16, use_images=False, use_gamestate=False,
        use_joint_states=False, imu_orientation_embedding_method="five_dim",
        encoder_patch_size=2,
        num_action_history_encoder_layers=2, num_imu_encoder_layers=2,
        joint_state_encoder_layers=2, num_decoder_layers=2,
        compute_dtype="float32",
    )
    assert_context_parity(cfg, batch_size=4, block_robots=2, atol=2e-5)


def test_rejects_image_configs():
    cfg = ModelConfig(
        num_joints=6, hidden_dim=64, trajectory_prediction_length=5,
        action_context_length=8, joint_state_context_length=8,
        imu_context_length=8, use_images=True, image_resolution=32,
        image_context_length=2, use_gamestate=True,
        num_action_history_encoder_layers=1, num_imu_encoder_layers=1,
        joint_state_encoder_layers=1, num_decoder_layers=1,
    )
    model = DiffusionPolicy(cfg)
    with pytest.raises(ValueError, match="proprioceptive"):
        FusedContextEncoder(model, {}, interpret=True)


def test_rollout_with_fused_encoder_matches_xla_rollout():
    from soccerdiffusion_tpu.data import Normalizer
    from soccerdiffusion_tpu.diffusion import make_schedule
    from soccerdiffusion_tpu.inference import RolloutEngine

    cfg = ModelConfig(
        num_joints=6, hidden_dim=64, trajectory_prediction_length=5,
        action_context_length=16, joint_state_context_length=16,
        imu_context_length=16, use_images=False, use_gamestate=True,
        num_action_history_encoder_layers=2, num_imu_encoder_layers=2,
        joint_state_encoder_layers=2, num_decoder_layers=2,
        compute_dtype="float32",
    )
    model, variables, _ = build(cfg, batch_size=4)
    schedule = make_schedule(50)
    norm = Normalizer.identity(cfg.num_joints)
    base = RolloutEngine(model, schedule, norm, num_inference_steps=3)
    fused = RolloutEngine(model, schedule, norm, num_inference_steps=3,
                          fused_encoder="interpret")
    c0 = base.init(4, jax.random.key(0))
    c1 = fused.init(4, jax.random.key(0))
    _, chunks0 = base.make_rollout_fn(2, jit=False)(variables, c0)
    _, chunks1 = fused.make_rollout_fn(2, jit=False)(variables, c1)
    np.testing.assert_allclose(np.asarray(chunks1), np.asarray(chunks0),
                               atol=5e-4)


def test_guided_rollout_with_fused_encoder_matches_xla():
    """CFG through the fused encoder: BOTH the conditional and the nulled
    unconditional branch ride the same encoder (advisor r3 — a mixed
    fused/XLA pair would leak the encoder numeric gap into eps_c - eps_u)."""
    from soccerdiffusion_tpu.data import Normalizer
    from soccerdiffusion_tpu.diffusion import make_schedule
    from soccerdiffusion_tpu.inference import RolloutEngine

    cfg = ModelConfig(
        num_joints=6, hidden_dim=64, trajectory_prediction_length=5,
        action_context_length=16, joint_state_context_length=16,
        imu_context_length=16, use_images=False, use_gamestate=True,
        num_action_history_encoder_layers=2, num_imu_encoder_layers=2,
        joint_state_encoder_layers=2, num_decoder_layers=2,
        compute_dtype="float32",
    )
    model, variables, _ = build(cfg, batch_size=4)
    schedule = make_schedule(50)
    norm = Normalizer.identity(cfg.num_joints)
    kw = dict(num_inference_steps=3, guidance_scale=2.5,
              guidance_null=("imu", "game_state"))
    base = RolloutEngine(model, schedule, norm, **kw)
    fused = RolloutEngine(model, schedule, norm,
                          fused_encoder="interpret", **kw)
    c0 = base.init(4, jax.random.key(0))
    c1 = fused.init(4, jax.random.key(0))
    _, chunks0 = base.make_rollout_fn(2, jit=False)(variables, c0)
    _, chunks1 = fused.make_rollout_fn(2, jit=False)(variables, c1)
    assert np.isfinite(np.asarray(chunks1)).all()
    np.testing.assert_allclose(np.asarray(chunks1), np.asarray(chunks0),
                               atol=5e-3)
