"""Embeddings: sinusoidal position tables, diffusion step token, patch-conv.

Semantics match reference ml/model/misc.py (StepToken :6-35,
PositionalEncoding :38-65) and the patch embedding conv in
reference ml/model/encoder/base.py:27.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    """Standard fixed sin/cos positional table, shape (max_len, d_model).

    pe[:, 0::2] = sin(pos * exp(-ln(1e4) * 2i / d)), pe[:, 1::2] = cos(...)
    (reference misc.py:55-60). Computed once on host in float64 and cast.
    """
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


class PositionalEncoding(nn.Module):
    """Adds the fixed sinusoidal table to a (B, T, D) sequence."""

    d_model: int
    max_len: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        table = jnp.asarray(sinusoidal_table(self.max_len, self.d_model), dtype=self.dtype)
        return x + table[None, : x.shape[1], :]


class StepToken(nn.Module):
    """Diffusion-timestep token: half sinusoidal embedding of t, half learned.

    Output shape (B, 1, dim). Matches reference misc.py:26-35: with
    half_dim = dim // 4, the embedding is
    [sin(t * w), cos(t * w), learned_token] where
    w_i = exp(-i * ln(1e4) / (half_dim - 1)).
    """

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, steps: jnp.ndarray) -> jnp.ndarray:
        token = self.param("token", nn.initializers.normal(stddev=1.0), (1, self.dim // 2))
        half_dim = self.dim // 4
        freqs = jnp.exp(
            jnp.arange(half_dim, dtype=jnp.float32) * (-math.log(10000.0) / (half_dim - 1))
        )
        ang = steps.astype(jnp.float32)[:, None] * freqs[None, :]
        tok = jnp.broadcast_to(token, (steps.shape[0], self.dim // 2))
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang), tok], axis=-1)
        return emb[:, None, :].astype(self.dtype)


class PatchConvEmbed(nn.Module):
    """Non-overlapping 1-D conv patch embedding over time.

    (B, T, C) -> (B, T // patch_size, hidden_dim). Equivalent to the
    reference's ``nn.Conv1d(input_dim, hidden, kernel=stride=patch)``
    (reference base.py:27), expressed channels-last for TPU layout.
    """

    hidden_dim: int
    patch_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            features=self.hidden_dim,
            kernel_size=(self.patch_size,),
            strides=(self.patch_size,),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)
