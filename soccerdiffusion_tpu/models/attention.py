"""Multi-head attention with a pluggable compute backend and KV caching.

The projection layout maps 1:1 onto torch ``nn.MultiheadAttention``
(q/k/v projections are the three row-chunks of ``in_proj_weight``) so the
reference's weights port directly and fidelity tests are bit-comparable.

The inner attention computation is a backend function with signature
``f(q, k, v) -> o`` over (B, T, H, D) tensors:

  * "xla"    — einsum + softmax; fastest for this model family's short
               (10-200 token) sequences (batched matmuls fill the MXU).
  * "pallas" — fused flash-attention kernel (soccerdiffusion_tpu.ops)
               keeping the score tile in VMEM; wins on long sequences.
  * "auto"   — shape-aware: pallas on TPU for long sequences, else xla.
  * "ring"   — sequence parallelism over the ambient mesh's "seq" axis
               (parallel/ring_attention.py): true ring attention for
               self-attention whose length divides the axis, head-sharded
               attention for cross-attention, XLA fallback otherwise.

Cross-attention K/V can be precomputed once per memory
(``compute_kv``/``precomputed_kv``) — the serving path caches the context's
KV across all 30 denoising steps.
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
        from soccerdiffusion_tpu.ops.flash_attention import flash_attention_auto

        return flash_attention_auto
    if impl == "ring":
        # sequence parallelism over the ambient mesh's "seq" axis: ring
        # attention where the sequence divides the axis, head-sharded
        # (Ulysses-style) where only the heads do, XLA otherwise
        from soccerdiffusion_tpu.parallel.ring_attention import auto_ring_attention

        return auto_ring_attention
    raise ValueError(f"unknown attention impl: {impl}")


class MultiHeadAttention(nn.Module):
    """torch-``nn.MultiheadAttention``-compatible MHA (batch_first semantics).

    ``__call__(x_q, x_kv=None, precomputed_kv=None)``: self-attention when
    both kv inputs are None, cross-attention otherwise. No masking — the
    reference model denoises the whole action chunk jointly with full
    bidirectional attention (reference ml/model/decoder.py:36-54).
    """

    hidden_dim: int
    num_heads: int
    dtype: Any = jnp.float32
    attention_impl: str = "xla"

    def setup(self) -> None:
        if self.hidden_dim % self.num_heads != 0:
            raise ValueError("hidden_dim must be divisible by num_heads")
        dense = lambda name: nn.Dense(self.hidden_dim, dtype=self.dtype, name=name)
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = dense("out_proj")

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        return x.reshape(x.shape[0], x.shape[1], self.num_heads, self.head_dim)

    def compute_kv(self, x_kv: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Project memory to (k, v), each (B, S, H, D) — cacheable."""
        return self._split(self.k_proj(x_kv)), self._split(self.v_proj(x_kv))

    def __call__(
        self,
        x_q: jnp.ndarray,
        x_kv: Optional[jnp.ndarray] = None,
        precomputed_kv: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        q = self._split(self.q_proj(x_q))
        if precomputed_kv is not None:
            k, v = precomputed_kv
            if x_kv is not None:
                # Cached static part + freshly projected tail (e.g. the
                # per-step diffusion step token appended to the context).
                k_tail, v_tail = self.compute_kv(x_kv)
                k = jnp.concatenate([k, k_tail], axis=1)
                v = jnp.concatenate([v, v_tail], axis=1)
        else:
            k, v = self.compute_kv(x_q if x_kv is None else x_kv)

        out = resolve_attention_fn(self.attention_impl)(q, k, v)
        out = out.reshape(x_q.shape[0], x_q.shape[1], self.hidden_dim)
        return self.out_proj(out)
