"""The denoiser: cross-attending transformer decoder over the action chunk.

Counterpart of the reference's ``DiffusionActionGenerator``
(reference ml/model/decoder.py:6-54): linear embed of the noisy
(B, pred_len, joints) chunk + positional encoding + pre-norm GELU
transformer decoder cross-attending to the context tokens + linear out.
No causal mask — the whole chunk is denoised jointly.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from soccerdiffusion_tpu.models.embeddings import PositionalEncoding
from soccerdiffusion_tpu.models.transformer import TransformerDecoder


class DiffusionActionGenerator(nn.Module):
    num_joints: int
    hidden_dim: int
    num_layers: int
    max_seq_len: int
    num_heads: int = 4
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    remat: bool = False
    # fused Pallas fwd+bwd decoder layers (ops/fused_decoder_layer.py)
    fused_block: bool = False
    fused_block_rows: int = 32

    def setup(self) -> None:
        self.embedding = nn.Dense(self.hidden_dim, dtype=self.dtype, name="embedding")
        self.pos = PositionalEncoding(self.hidden_dim, self.max_seq_len,
                                      dtype=self.dtype, name="pos")
        self.decoder = TransformerDecoder(
            self.hidden_dim, self.num_heads, self.num_layers, dtype=self.dtype,
            attention_impl=self.attention_impl, remat=self.remat,
            fused_block=self.fused_block,
            fused_block_rows=self.fused_block_rows,
            name="decoder",
        )
        self.fc_out = nn.Dense(self.num_joints, dtype=self.dtype, name="fc_out")

    def compute_context_kv(self, context: jnp.ndarray) -> list:
        """Per-layer cross-attention K/V of the static context tokens —
        computed once per chunk on the serving path and reused across every
        denoising step."""
        return self.decoder.compute_memory_kv(context)

    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray | None = None,
        context_kv: list | None = None,
    ) -> jnp.ndarray:
        """x: noisy chunk (B, pred_len, joints); context: (B, S, hidden).
        With ``context_kv`` given, ``context`` may hold only the per-step
        tail tokens (the diffusion step token)."""
        x = self.embedding(x)
        x = self.pos(x)
        x = self.decoder(x, context, context_kv)
        return self.fc_out(x)
