"""Pre-norm GELU transformer encoder/decoder stacks.

Layer semantics replicate torch's ``nn.TransformerEncoderLayer`` /
``nn.TransformerDecoderLayer`` with ``norm_first=True, activation="gelu"``
and ``dim_feedforward == hidden_dim`` as used throughout the reference
(reference ml/model/encoder/base.py:29-39, ml/model/decoder.py:36-46):

  encoder layer: x += attn(LN1(x));               x += mlp(LN2(x))
  decoder layer: x += self_attn(LN1(x));
                 x += cross_attn(LN2(x), memory); x += mlp(LN3(x))

GELU is the exact (erf) variant — torch's default. No final LayerNorm after
the stack (torch's ``nn.TransformerEncoder(..., norm=None)``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from soccerdiffusion_tpu.models.attention import MultiHeadAttention


class Mlp(nn.Module):
    """linear -> exact GELU -> linear (dim_feedforward defaults to hidden)."""

    hidden_dim: int
    ff_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.ff_dim, dtype=self.dtype, name="linear1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear2")(x)


class TransformerEncoderLayer(nn.Module):
    hidden_dim: int
    num_heads: int
    ff_dim: int | None = None
    dtype: Any = jnp.float32
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, name=name)
        attn = MultiHeadAttention(
            self.hidden_dim, self.num_heads, dtype=self.dtype,
            attention_impl=self.attention_impl, name="self_attn",
        )
        mlp = Mlp(self.hidden_dim, self.ff_dim or self.hidden_dim, dtype=self.dtype, name="mlp")
        x = x + attn(ln("norm1")(x))
        x = x + mlp(ln("norm2")(x))
        return x


class TransformerDecoderLayer(nn.Module):
    hidden_dim: int
    num_heads: int
    ff_dim: int | None = None
    dtype: Any = jnp.float32
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, memory: jnp.ndarray) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, name=name)
        self_attn = MultiHeadAttention(
            self.hidden_dim, self.num_heads, dtype=self.dtype,
            attention_impl=self.attention_impl, name="self_attn",
        )
        cross_attn = MultiHeadAttention(
            self.hidden_dim, self.num_heads, dtype=self.dtype,
            attention_impl=self.attention_impl, name="cross_attn",
        )
        mlp = Mlp(self.hidden_dim, self.ff_dim or self.hidden_dim, dtype=self.dtype, name="mlp")
        x = x + self_attn(ln("norm1")(x))
        x = x + cross_attn(ln("norm2")(x), memory)
        x = x + mlp(ln("norm3")(x))
        return x


class TransformerEncoder(nn.Module):
    hidden_dim: int
    num_heads: int
    num_layers: int
    ff_dim: int | None = None
    dtype: Any = jnp.float32
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.hidden_dim, self.num_heads, self.ff_dim, dtype=self.dtype,
                attention_impl=self.attention_impl, name=f"layer_{i}",
            )(x)
        return x


class TransformerDecoder(nn.Module):
    hidden_dim: int
    num_heads: int
    num_layers: int
    ff_dim: int | None = None
    dtype: Any = jnp.float32
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, memory: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = TransformerDecoderLayer(
                self.hidden_dim, self.num_heads, self.ff_dim, dtype=self.dtype,
                attention_impl=self.attention_impl, name=f"layer_{i}",
            )(x, memory)
        return x
