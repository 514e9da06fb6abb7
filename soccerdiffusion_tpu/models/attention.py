"""Multi-head attention with a pluggable compute backend.

The projection layout maps 1:1 onto torch ``nn.MultiheadAttention``
(q/k/v projections are the three row-chunks of ``in_proj_weight``) so the
reference's weights port directly and fidelity tests are bit-comparable.

The inner attention computation is a backend function with signature
``f(q, k, v) -> o`` over (B, T, H, D) tensors:

  * "xla"    — einsum + softmax; XLA fuses this well for the short
               (~100-token) sequences this model family uses.
  * "pallas" — fused flash-attention kernel (soccerdiffusion_tpu.ops) that
               keeps the whole score tile in VMEM; used on TPU for larger
               batch*heads where it avoids HBM round trips.
  * "auto"   — pallas on TPU when shapes qualify, else xla.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

AttentionFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Reference attention: softmax(q k^T / sqrt(d)) v over (B, T, H, D)."""
    dtype = q.dtype
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], dtype=jnp.float32))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v, preferred_element_type=jnp.float32)
    return out.astype(dtype)


def resolve_attention_fn(impl: str) -> AttentionFn:
    """Resolve an attention implementation name to a backend function."""
    if impl == "xla":
        return xla_attention
    if impl == "pallas":
        from soccerdiffusion_tpu.ops.flash_attention import flash_attention

        return flash_attention
    if impl == "auto":
        if jax.default_backend() == "tpu":
            from soccerdiffusion_tpu.ops.flash_attention import flash_attention_auto

            return flash_attention_auto
        return xla_attention
    raise ValueError(f"unknown attention impl: {impl}")


class MultiHeadAttention(nn.Module):
    """torch-``nn.MultiheadAttention``-compatible MHA (batch_first semantics).

    ``__call__(x_q, x_kv=None)``: self-attention when ``x_kv`` is None,
    cross-attention otherwise. No masking — the reference model denoises the
    whole action chunk jointly with full bidirectional attention
    (reference ml/model/decoder.py:36-54).
    """

    hidden_dim: int
    num_heads: int
    dtype: Any = jnp.float32
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, x_q: jnp.ndarray, x_kv: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.hidden_dim % self.num_heads != 0:
            raise ValueError("hidden_dim must be divisible by num_heads")
        x_kv = x_q if x_kv is None else x_kv
        head_dim = self.hidden_dim // self.num_heads
        dense = lambda name: nn.Dense(self.hidden_dim, dtype=self.dtype, name=name)
        q = dense("q_proj")(x_q)
        k = dense("k_proj")(x_kv)
        v = dense("v_proj")(x_kv)

        batch, q_len = q.shape[0], q.shape[1]
        kv_len = k.shape[1]
        q = q.reshape(batch, q_len, self.num_heads, head_dim)
        k = k.reshape(batch, kv_len, self.num_heads, head_dim)
        v = v.reshape(batch, kv_len, self.num_heads, head_dim)

        out = resolve_attention_fn(self.attention_impl)(q, k, v)
        out = out.reshape(batch, q_len, self.hidden_dim)
        return nn.Dense(self.hidden_dim, dtype=self.dtype, name="out_proj")(out)
