"""Modality context encoders.

``SequenceEncoder`` is the counterpart of the reference's ``BaseEncoder``
(reference ml/model/encoder/base.py:7-53): non-overlapping patch-conv
embedding -> sinusoidal positional encoding -> pre-norm GELU transformer
encoder with ``dim_feedforward == hidden_dim``. The joint/IMU encoders are
thin configurations of it (reference encoder/joint.py:4-29,
encoder/imu.py:6-53); the game-state encoder is a single learned embedding
token (reference encoder/game_state.py:7-27).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from soccerdiffusion_tpu.models.embeddings import PatchConvEmbed, PositionalEncoding
from soccerdiffusion_tpu.models.transformer import TransformerEncoder

# 4-value robot state space {PLAYING, POSITIONING, STOPPED, UNKNOWN}
# (reference dataset/models.py:13-25).
NUM_ROBOT_STATES = 4


class SequenceEncoder(nn.Module):
    """(B, T, input_dim) -> (B, T // patch_size, hidden_dim) context tokens."""

    hidden_dim: int
    patch_size: int
    num_layers: int
    num_heads: int
    max_seq_len: int
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    # run blocks as ONE fused Pallas fwd+bwd program each
    # (ops/fused_vit_block.py); ignores attention_impl
    fused_block: bool = False
    fused_block_rows: int = 16
    # whole-stack fused Pallas program (ops/fused_encoder_stack.py)
    fused_stack: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = PatchConvEmbed(self.hidden_dim, self.patch_size, dtype=self.dtype, name="embedding")(x)
        x = PositionalEncoding(self.hidden_dim, self.max_seq_len, dtype=self.dtype, name="pos")(x)
        return TransformerEncoder(
            self.hidden_dim, self.num_heads, self.num_layers, dtype=self.dtype,
            attention_impl=self.attention_impl,
            fused_block=self.fused_block,
            fused_block_frames=self.fused_block_rows,
            fused_stack=self.fused_stack, name="encoder",
        )(x)


class JointEncoder(nn.Module):
    """Encodes joint-angle sequences (action history or joint states)."""

    num_joints: int
    hidden_dim: int
    patch_size: int
    num_layers: int
    max_seq_len: int
    num_heads: int = 4
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    fused_block: bool = False
    fused_block_rows: int = 16
    # whole-stack fused Pallas program (ops/fused_encoder_stack.py)
    fused_stack: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] != self.num_joints:
            raise ValueError(f"expected {self.num_joints} joints, got {x.shape[-1]}")
        return SequenceEncoder(
            self.hidden_dim, self.patch_size, self.num_layers, self.num_heads,
            self.max_seq_len, dtype=self.dtype, attention_impl=self.attention_impl,
            fused_block=self.fused_block, fused_block_rows=self.fused_block_rows,
            fused_stack=self.fused_stack, name="seq",
        )(x)


class IMUEncoder(nn.Module):
    """Encodes orientation sequences; input dim 4 (quaternion) or 5 (axis +
    sin/cos angle) chosen by the embedding method (reference encoder/imu.py:39-44)."""

    input_dim: int  # 4 or 5
    hidden_dim: int
    patch_size: int
    num_layers: int
    max_seq_len: int
    num_heads: int = 4
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    fused_block: bool = False
    fused_block_rows: int = 16
    # whole-stack fused Pallas program (ops/fused_encoder_stack.py)
    fused_stack: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] != self.input_dim:
            raise ValueError(f"expected imu dim {self.input_dim}, got {x.shape[-1]}")
        return SequenceEncoder(
            self.hidden_dim, self.patch_size, self.num_layers, self.num_heads,
            self.max_seq_len, dtype=self.dtype, attention_impl=self.attention_impl,
            fused_block=self.fused_block, fused_block_rows=self.fused_block_rows,
            fused_stack=self.fused_stack, name="seq",
        )(x)


class GameStateEncoder(nn.Module):
    """(B,) int robot-state ids -> (B, 1, hidden_dim) learned token."""

    hidden_dim: int
    num_states: int = NUM_ROBOT_STATES
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(self.num_states, self.hidden_dim, dtype=self.dtype, name="embedding")(x)
        return emb[:, None, :]
