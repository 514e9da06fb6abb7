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

    def setup(self) -> None:
        self.self_attn = MultiHeadAttention(
            self.hidden_dim, self.num_heads, dtype=self.dtype,
            attention_impl=self.attention_impl, name="self_attn",
        )
        self.cross_attn = MultiHeadAttention(
            self.hidden_dim, self.num_heads, dtype=self.dtype,
            attention_impl=self.attention_impl, name="cross_attn",
        )
        self.mlp = Mlp(self.hidden_dim, self.ff_dim or self.hidden_dim,
                       dtype=self.dtype, name="mlp")
        self.norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        self.norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        self.norm3 = nn.LayerNorm(dtype=self.dtype, name="norm3")

    def compute_memory_kv(self, memory: jnp.ndarray):
        """Cacheable cross-attention K/V of a (B, S, H) memory. In the
        pre-norm torch layer the memory enters cross-attention un-normed, so
        its projections depend only on the memory itself."""
        return self.cross_attn.compute_kv(memory)

    def __call__(
        self,
        x: jnp.ndarray,
        memory: jnp.ndarray | None = None,
        memory_kv=None,
    ) -> jnp.ndarray:
        x = x + self.self_attn(self.norm1(x))
        x = x + self.cross_attn(self.norm2(x), memory, precomputed_kv=memory_kv)
        x = x + self.mlp(self.norm3(x))
        return x


class TransformerEncoder(nn.Module):
    hidden_dim: int
    num_heads: int
    num_layers: int
    ff_dim: int | None = None
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    # Rematerialize each block in the backward pass instead of storing its
    # activations. The vit_flagship train step is HBM-bandwidth-bound
    # (168 GB/step vs 28 ms of FLOPs at peak, docs/perf_notes.md), so
    # trading recompute FLOPs for activation traffic is the right default
    # for the large image encoders.
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        layer_cls = nn.remat(TransformerEncoderLayer) if self.remat \
            else TransformerEncoderLayer
        for i in range(self.num_layers):
            x = layer_cls(
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

    def setup(self) -> None:
        self.layers = [
            TransformerDecoderLayer(
                self.hidden_dim, self.num_heads, self.ff_dim, dtype=self.dtype,
                attention_impl=self.attention_impl, name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]

    def compute_memory_kv(self, memory: jnp.ndarray) -> list:
        """Per-layer cacheable cross-attention K/V for a static memory."""
        return [layer.compute_memory_kv(memory) for layer in self.layers]

    def __call__(
        self,
        x: jnp.ndarray,
        memory: jnp.ndarray | None = None,
        memory_kv: list | None = None,
    ) -> jnp.ndarray:
        for i, layer in enumerate(self.layers):
            x = layer(x, memory, memory_kv[i] if memory_kv is not None else None)
        return x
