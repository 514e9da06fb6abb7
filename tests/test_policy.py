"""DiffusionPolicy tests: shapes, context ordering, and end-to-end numeric
parity against a torch replica of the reference architecture.

The torch replica below is assembled in-test from torch primitives following
the reference's published architecture (reference ml/model/model.py,
encoder/base.py, decoder.py, misc.py) to generate real state dicts for the
port path — the proprioceptive config (no images; images need torchvision
which is unavailable in CI).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch import nn as tnn

from soccerdiffusion_tpu.config import Config, ModelConfig
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.utils import torch_port

PROPRIO = dict(
    num_joints=6,
    hidden_dim=16,
    use_action_history=True,
    num_action_history_encoder_layers=1,
    action_context_length=20,
    use_imu=True,
    imu_orientation_embedding_method="quaternion",
    num_imu_encoder_layers=1,
    imu_context_length=20,
    use_joint_states=True,
    joint_state_encoder_layers=1,
    joint_state_context_length=20,
    use_images=False,
    use_gamestate=True,
    num_decoder_layers=2,
    trajectory_prediction_length=5,
    encoder_patch_size=1,
)


def make_batch(rng, b=2, cfg=None):
    cfg = cfg or ModelConfig(**PROPRIO)
    return {
        "joint_command_history": jnp.asarray(
            rng.standard_normal((b, cfg.action_context_length, cfg.num_joints)).astype(np.float32)
        ),
        "rotation": jnp.asarray(
            rng.standard_normal((b, cfg.imu_context_length, cfg.imu_input_dim)).astype(np.float32)
        ),
        "joint_state": jnp.asarray(
            rng.standard_normal((b, cfg.joint_state_context_length, cfg.num_joints)).astype(np.float32)
        ),
        "game_state": jnp.asarray(np.array([0, 2], dtype=np.int32)[:b]),
    }


class TestShapes:
    def test_forward_shape_and_finite(self, rng):
        cfg = ModelConfig(**PROPRIO)
        model = DiffusionPolicy(cfg)
        batch = make_batch(rng)
        noisy = jnp.asarray(rng.standard_normal((2, 5, 6)).astype(np.float32))
        t = jnp.array([3, 900])
        variables = model.init(jax.random.key(0), batch, noisy, t)
        out = model.apply(variables, batch, noisy, t)
        assert out.shape == (2, 5, 6)
        assert np.isfinite(np.asarray(out)).all()

    def test_encode_once_matches_full_forward(self, rng):
        cfg = ModelConfig(**PROPRIO)
        model = DiffusionPolicy(cfg)
        batch = make_batch(rng)
        noisy = jnp.asarray(rng.standard_normal((2, 5, 6)).astype(np.float32))
        t = jnp.array([3, 900])
        variables = model.init(jax.random.key(0), batch, noisy, t)
        ctx = model.apply(variables, batch, method=model.encode_context)
        # context tokens: 20 + 20 + 20 + 1 game state
        assert ctx.shape == (2, 61, 16)
        out_cached = model.apply(variables, ctx, noisy, t, method=model.denoise)
        out_full = model.apply(variables, batch, noisy, t)
        np.testing.assert_allclose(np.asarray(out_cached), np.asarray(out_full), rtol=1e-6)

    def test_patch_size_downsamples_context(self, rng):
        cfg = ModelConfig(**{**PROPRIO, "encoder_patch_size": 5})
        model = DiffusionPolicy(cfg)
        batch = make_batch(rng)
        noisy = jnp.asarray(rng.standard_normal((2, 5, 6)).astype(np.float32))
        t = jnp.array([0, 0])
        variables = model.init(jax.random.key(0), batch, noisy, t)
        ctx = model.apply(variables, batch, method=model.encode_context)
        # 20/5 per modality * 3 + 1 game state
        assert ctx.shape == (2, 13, 16)

    def test_image_token_cache_matches_full_image_path(self, rng):
        """encode_image_frames |> encode_context({'image_tokens': ...}) is
        numerically identical to encode_context({'image_data': ...}) — the
        contract the serving-side token cache rests on
        (models/vision.py mode docstring, inference/controller.py)."""
        cfg = ModelConfig(**{
            **PROPRIO, "use_images": True, "image_encoder_type": "vit",
            "image_sequence_encoder_type": "transformer",
            "num_image_sequence_encoder_layers": 1,
            "image_context_length": 3, "image_resolution": 32,
            "vit_patch_size": 16, "vit_width": 32, "vit_depth": 1,
        })
        model = DiffusionPolicy(cfg)
        batch = make_batch(rng, cfg=cfg)
        batch["image_data"] = jnp.asarray(
            rng.standard_normal((2, 3, 32, 32, 3)).astype(np.float32))
        noisy = jnp.asarray(rng.standard_normal((2, 5, 6)).astype(np.float32))
        t = jnp.array([3, 900])
        variables = model.init(jax.random.key(0), batch, noisy, t)
        ctx_full = model.apply(variables, batch, False,
                               method=model.encode_context)
        tokens = model.apply(variables, batch["image_data"],
                             method=model.encode_image_frames)
        assert tokens.shape == (2, 3, cfg.hidden_dim)
        batch_tok = {k: v for k, v in batch.items() if k != "image_data"}
        batch_tok["image_tokens"] = tokens
        ctx_tok = model.apply(variables, batch_tok, False,
                              method=model.encode_context)
        np.testing.assert_allclose(np.asarray(ctx_tok), np.asarray(ctx_full),
                                   rtol=1e-6, atol=1e-6)

    def test_all_encoders_off_uses_step_token_only(self, rng):
        # decoder_only tier (reference config/decoder_only.yaml): context is
        # just the diffusion step token.
        cfg = ModelConfig(**{**PROPRIO, "use_action_history": False, "use_imu": False,
                             "use_joint_states": False, "use_gamestate": False})
        model = DiffusionPolicy(cfg)
        noisy = jnp.asarray(rng.standard_normal((2, 5, 6)).astype(np.float32))
        batch = {"joint_command": jnp.zeros((2, 5, 6))}
        variables = model.init(jax.random.key(0), batch, noisy, jnp.array([0, 1]))
        out = model.apply(variables, batch, noisy, jnp.array([0, 1]))
        assert out.shape == (2, 5, 6)
        assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# torch replica of the reference architecture (for state-dict port parity)
# ---------------------------------------------------------------------------


class TorchPositionalEncoding(tnn.Module):
    def __init__(self, d_model, max_len):
        super().__init__()
        pe = torch.zeros(1, max_len, d_model)
        position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
        div_term = torch.exp(torch.arange(0, d_model, 2).float() * (-math.log(10000.0) / d_model))
        pe[0, :, 0::2] = torch.sin(position * div_term)
        pe[0, :, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe, persistent=False)

    def forward(self, x):
        return x + self.pe[:, : x.size(1)]


class TorchBaseEncoder(tnn.Module):
    """Reference BaseEncoder semantics (base.py:7-53)."""

    def __init__(self, input_dim, patch_size, hidden_dim, num_layers, num_heads, max_seq_len):
        super().__init__()
        self.embedding = tnn.Conv1d(input_dim, hidden_dim, kernel_size=patch_size, stride=patch_size)
        self.positional_encoding = TorchPositionalEncoding(hidden_dim, max_seq_len)
        self.transformer_encoder = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(
                d_model=hidden_dim, nhead=num_heads, dim_feedforward=hidden_dim,
                batch_first=True, norm_first=True, activation="gelu", dropout=0.0,
            ),
            num_layers=num_layers,
        )

    def forward(self, x):
        x = self.embedding(x.permute(0, 2, 1)).permute(0, 2, 1)
        x = self.positional_encoding(x)
        return self.transformer_encoder(x)


class TorchStepToken(tnn.Module):
    """Reference StepToken semantics (misc.py:6-35)."""

    def __init__(self, dim):
        super().__init__()
        self.dim = dim
        self.token = tnn.Parameter(torch.randn(1, dim // 2))

    def forward(self, steps):
        half_dim = self.dim // 4
        emb = torch.exp(torch.arange(half_dim) * -math.log(10000) / (half_dim - 1))
        emb = steps[:, None] * emb[None, :]
        return torch.cat(
            (emb.sin(), emb.cos(), self.token.expand((steps.size(0), self.dim // 2))), dim=-1
        ).unsqueeze(1)


class TorchActionGenerator(tnn.Module):
    """Reference DiffusionActionGenerator semantics (decoder.py:6-54)."""

    def __init__(self, num_joints, hidden_dim, num_layers, num_heads, max_seq_len):
        super().__init__()
        self.embedding = tnn.Linear(num_joints, hidden_dim)
        self.positional_encoding = TorchPositionalEncoding(hidden_dim, max_seq_len)
        self.transformer_decoder = tnn.TransformerDecoder(
            tnn.TransformerDecoderLayer(
                d_model=hidden_dim, nhead=num_heads, dim_feedforward=hidden_dim,
                batch_first=True, norm_first=True, activation="gelu", dropout=0.0,
            ),
            num_layers=num_layers,
        )
        self.fc_out = tnn.Linear(hidden_dim, num_joints)

    def forward(self, x, context):
        x = self.embedding(x)
        x = self.positional_encoding(x)
        return self.fc_out(self.transformer_decoder(x, context))


class TorchReferencePolicy(tnn.Module):
    """Reference End2EndDiffusionTransformer semantics, proprioceptive subset
    (model.py:16-179)."""

    def __init__(self, cfg: ModelConfig):
        super().__init__()
        h = cfg.hidden_dim
        self.step_encoding = TorchStepToken(h)
        self.action_history_encoder = TorchBaseEncoder(
            cfg.num_joints, cfg.encoder_patch_size, h,
            cfg.num_action_history_encoder_layers, 4, cfg.action_context_length)
        self.imu_encoder = TorchBaseEncoder(
            cfg.imu_input_dim, cfg.encoder_patch_size, h,
            cfg.num_imu_encoder_layers, 4, cfg.imu_context_length)
        self.joint_states_encoder = TorchBaseEncoder(
            cfg.num_joints, cfg.encoder_patch_size, h,
            cfg.joint_state_encoder_layers, 4, cfg.joint_state_context_length)
        self.game_state_encoder_embedding = tnn.Embedding(4, h)
        self.diffusion_action_generator = TorchActionGenerator(
            cfg.num_joints, h, cfg.num_decoder_layers, 4, cfg.trajectory_prediction_length)
        self.register_buffer("mean", torch.zeros(cfg.num_joints))
        self.register_buffer("std", torch.ones(cfg.num_joints))

    def forward(self, batch, noisy, steps):
        context = [
            self.action_history_encoder(batch["joint_command_history"]),
            self.imu_encoder(batch["rotation"]),
            self.joint_states_encoder(batch["joint_state"]),
            self.game_state_encoder_embedding(batch["game_state"]).unsqueeze(1),
        ]
        context_tensor = torch.cat(context + [self.step_encoding(steps)], dim=1)
        return self.diffusion_action_generator(noisy, context_tensor)


class TestReferencePortParity:
    def test_full_state_dict_port_matches(self, rng):
        cfg = ModelConfig(**PROPRIO)
        torch.manual_seed(7)
        tmodel = TorchReferencePolicy(cfg)
        tmodel.eval()
        # rename game_state embedding key to the reference layout
        sd = {
            k.replace("game_state_encoder_embedding", "game_state_encoder.embedding"): v
            for k, v in tmodel.state_dict().items()
        }

        batch = make_batch(rng)
        noisy = rng.standard_normal((2, 5, 6)).astype(np.float32)
        steps = np.array([3, 900], dtype=np.int64)
        tbatch = {
            k: torch.tensor(np.asarray(v)) if k != "game_state" else torch.tensor(np.asarray(v), dtype=torch.long)
            for k, v in batch.items()
        }
        with torch.no_grad():
            expected = tmodel(tbatch, torch.tensor(noisy), torch.tensor(steps))

        params, stats, norm = torch_port.port_policy_state_dict(sd, cfg)
        assert norm["mean"].shape == (6,)
        model = DiffusionPolicy(cfg)
        got = model.apply(
            {"params": jax.tree.map(jnp.asarray, params)},
            batch, jnp.asarray(noisy), jnp.asarray(steps),
        )
        np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=5e-4, atol=1e-5)


class TestKVCache:
    def test_denoise_with_kv_matches_denoise(self, rng):
        cfg = ModelConfig(**PROPRIO)
        model = DiffusionPolicy(cfg)
        batch = make_batch(rng)
        noisy = jnp.asarray(rng.standard_normal((2, 5, 6)).astype(np.float32))
        t = jnp.array([3, 70])
        variables = model.init(jax.random.key(0), batch, noisy, t)
        ctx = model.apply(variables, batch, method=model.encode_context)
        full = model.apply(variables, ctx, noisy, t, method=model.denoise)
        kv = model.apply(variables, ctx, method=model.precompute_context_kv)
        cached = model.apply(variables, kv, noisy, t, method=model.denoise_with_kv)
        np.testing.assert_allclose(np.asarray(cached), np.asarray(full), rtol=1e-5, atol=1e-6)
