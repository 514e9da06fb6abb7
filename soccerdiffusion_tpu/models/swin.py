"""Swin Transformer image encoder (tiny/small).

The reference offers torchvision's ``swin_t``/``swin_s`` (randomly
initialized — no pretrained weights; reference ml/model/encoder/image.py:
86-100) with the classification head swapped for a Linear to ``hidden_dim``.
This is a clean flax implementation of the same architecture family:
4x4 patch embedding, windowed multi-head self-attention with relative
position bias, shifted windows on alternating blocks, patch merging between
stages, MLP ratio 4 — laid out NHWC.

Variants: tiny = depths (2, 2, 6, 2), small = depths (2, 2, 18, 2); both
embed 96 with heads (3, 6, 12, 24) and window 7.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, window*window, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_unpartition(x: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of window_partition."""
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.reshape(b, h // window, w // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def relative_position_index(window: int) -> np.ndarray:
    """(window^2, window^2) index table into the (2w-1)^2 bias params."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, n, n)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """x: (num_windows*B, N, C); mask: (num_windows, N, N) additive or None."""
        nw_b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(nw_b, n, 3, self.num_heads, head_dim), 3, axis=2)
        q = q.squeeze(2).transpose(0, 2, 1, 3)  # (B', heads, N, d)
        k = k.squeeze(2).transpose(0, 2, 1, 3)
        v = v.squeeze(2).transpose(0, 2, 1, 3)

        scale = head_dim**-0.5
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32)

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
        )
        idx = jnp.asarray(relative_position_index(self.window)).reshape(-1)
        bias = bias_table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(nw_b // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(nw_b, self.num_heads, n, n)

        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(nw_b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Additive (-100 / 0) mask for shifted-window attention."""
    img_mask = np.zeros((1, h, w, 1), dtype=np.float32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    mask_windows = np.asarray(window_partition(jnp.asarray(img_mask), window)).squeeze(-1)
    diff = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        window = min(self.window, h, w)
        shift = self.shift if window < min(h, w) else 0

        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        windows = window_partition(y, window)
        mask = (
            jnp.asarray(shift_attn_mask(h, w, window, shift)) if shift > 0 else None
        )
        attn_out = WindowAttention(self.dim, self.num_heads, window,
                                   dtype=self.dtype, name="attn")(windows, mask)
        y = window_unpartition(attn_out, window, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + y

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int  # input dim; output is 2*dim
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinImageEncoder(nn.Module):
    """(N, H, W, 3) -> (N, hidden_dim); H, W divisible by 32 preferred."""

    hidden_dim: int
    variant: str = "tiny"  # "tiny" | "small"
    embed_dim: int = 96
    window: int = 7
    num_heads: Sequence[int] = (3, 6, 12, 24)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        depths = (2, 2, 6, 2) if self.variant == "tiny" else (2, 2, 18, 2)
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)
        dim = self.embed_dim
        for stage, depth in enumerate(depths):
            for i in range(depth):
                x = SwinBlock(
                    dim, self.num_heads[stage], self.window,
                    shift=0 if i % 2 == 0 else self.window // 2,
                    dtype=self.dtype, name=f"stage{stage}_block{i}",
                )(x)
            if stage < len(depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"merge{stage}")(x)
                dim *= 2
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.hidden_dim, dtype=self.dtype, name="head")(x)
