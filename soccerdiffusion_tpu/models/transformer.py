"""Pre-norm GELU transformer encoder/decoder stacks.

Layer semantics replicate torch's ``nn.TransformerEncoderLayer`` /
``nn.TransformerDecoderLayer`` with ``norm_first=True, activation="gelu"``
and ``dim_feedforward == hidden_dim`` as used throughout the reference
(reference ml/model/encoder/base.py:29-39, ml/model/decoder.py:36-46):

  encoder layer: x += attn(LN1(x));               x += mlp(LN2(x))
  decoder layer: x += self_attn(LN1(x));
                 x += cross_attn(LN2(x), memory); x += mlp(LN3(x))

GELU defaults to the exact (erf) variant — torch's default — everywhere;
the TPU-native ViT stack can opt into quick-GELU (z*sigmoid(1.702z), the
CLIP activation) via ``vit_fused_gelu: quick/bf16``, honored consistently
by both the fused Pallas blocks and this module's unfused path (the
flagship config does — docs/perf_notes.md). No final LayerNorm after the
stack (torch's ``nn.TransformerEncoder(..., norm=None)``).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from soccerdiffusion_tpu.models.attention import MultiHeadAttention


class Mlp(nn.Module):
    """linear -> GELU -> linear (dim_feedforward defaults to hidden).

    ``activation``: "gelu" (exact, the reference torch semantics) or
    "quick_gelu" (z*sigmoid(1.702z), CLIP's activation — what the fused
    ViT block computes under ``vit_fused_gelu: quick/bf16``; exposed here
    so a quick-trained checkpoint serves identically with the fused
    kernel off)."""

    hidden_dim: int
    ff_dim: int
    dtype: Any = jnp.float32
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.ff_dim, dtype=self.dtype, name="linear1")(x)
        if self.activation == "quick_gelu":
            x = x * nn.sigmoid(1.702 * x)
        elif self.activation == "gelu":
            x = nn.gelu(x, approximate=False)
        else:  # a silent fallthrough would serve the wrong activation
            raise ValueError(f"unknown Mlp activation: {self.activation!r}")
        return nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear2")(x)


class TransformerEncoderLayer(nn.Module):
    hidden_dim: int
    num_heads: int
    ff_dim: int | None = None
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, name=name)
        attn = MultiHeadAttention(
            self.hidden_dim, self.num_heads, dtype=self.dtype,
            attention_impl=self.attention_impl, name="self_attn",
        )
        mlp = Mlp(self.hidden_dim, self.ff_dim or self.hidden_dim,
                  dtype=self.dtype, activation=self.activation, name="mlp")
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


class _DenseParams(nn.Module):
    """Param-only stand-in for nn.Dense (same names/shapes/init)."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.fin, self.fout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(), (self.fout,),
                       jnp.float32)
        return k, b


class _LayerNormParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.dim,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(), (self.dim,),
                       jnp.float32)
        return s, b


class _MhaParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return {name: _DenseParams(self.dim, self.dim, name=name)()
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")}


class _MlpParams(nn.Module):
    dim: int
    ff: int

    @nn.compact
    def __call__(self):
        return {"linear1": _DenseParams(self.dim, self.ff, name="linear1")(),
                "linear2": _DenseParams(self.ff, self.dim, name="linear2")()}


class _EncoderLayerParams(nn.Module):
    """Param-only stand-in for a whole TransformerEncoderLayer (identical
    tree: norm1/2, self_attn, mlp)."""

    dim: int
    ff: int

    @nn.compact
    def __call__(self):
        return {
            "norm1": _LayerNormParams(self.dim, name="norm1")(),
            "norm2": _LayerNormParams(self.dim, name="norm2")(),
            "self_attn": _MhaParams(self.dim, name="self_attn")(),
            "mlp": _MlpParams(self.dim, self.ff, name="mlp")(),
        }


class FusedTransformerEncoderLayer(nn.Module):
    """Drop-in TransformerEncoderLayer executed by the fused Pallas
    fwd+bwd block (ops/fused_vit_block.py). The param tree is IDENTICAL to
    the plain layer (declared through param-only stand-in modules), so
    checkpoints trained either way interchange; the custom-VJP backward
    recomputes the block in VMEM instead of streaming every intermediate
    through HBM (the vit_flagship roofline fix, docs/perf_notes.md)."""

    hidden_dim: int
    num_heads: int
    ff_dim: int | None = None
    dtype: Any = jnp.float32
    block_frames: int = 8
    # None: Mosaic on TPU, interpret on CPU (tests / multichip dryrun)
    interpret: bool | None = None
    # "exact" (erf-based), "poly" (piecewise-minimax FMA-only GELU,
    # |err| <= 3.4e-4 fwd / 1.8e-3 grad), "quick" (quick-GELU
    # z*sigmoid(1.702z) — measured -11 ms per flagship step: the GELU
    # chain is VPU-pass-count-bound), or "bf16" (quick evaluated on
    # storage-dtype arrays; measured perf-identical to "quick").
    # See ops/fused_vit_block.py and docs/perf_notes.md.
    gelu: str = "exact"
    # attention formulation inside the kernel: "stacked" or "headloop"
    # (numerically identical; see ops/fused_vit_block.make_vit_block_fn)
    layout: str = "stacked"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from soccerdiffusion_tpu.ops.fused_vit_block import make_vit_block_fn

        dim, ff = self.hidden_dim, self.ff_dim or self.hidden_dim
        g1, be1 = _LayerNormParams(dim, name="norm1")()
        g2, be2 = _LayerNormParams(dim, name="norm2")()
        sa = _MhaParams(dim, name="self_attn")()
        mlp = _MlpParams(dim, ff, name="mlp")()
        wqkv = jnp.concatenate([sa["q_proj"][0], sa["k_proj"][0],
                                sa["v_proj"][0]], axis=1)
        bqkv = jnp.concatenate([sa["q_proj"][1], sa["k_proj"][1],
                                sa["v_proj"][1]])
        fn = make_vit_block_fn(self.num_heads, self.block_frames,
                               self.interpret, gelu=self.gelu,
                               layout=self.layout)
        c = lambda t: t.astype(self.dtype)
        return fn(x.astype(self.dtype), c(g1), c(be1), c(wqkv), c(bqkv),
                  c(sa["out_proj"][0]), c(sa["out_proj"][1]), c(g2), c(be2),
                  c(mlp["linear1"][0]), c(mlp["linear1"][1]),
                  c(mlp["linear2"][0]), c(mlp["linear2"][1]))


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
    # Run each block as the fused Pallas fwd+bwd program instead
    # (ops/fused_vit_block.py) — strictly less HBM traffic than remat:
    # intermediates never exist in HBM at all.
    fused_block: bool = False
    fused_block_frames: int = 8
    fused_interpret: bool | None = None
    fused_gelu: str = "exact"
    fused_layout: str = "stacked"
    # Run the WHOLE stack as one fused Pallas fwd+bwd program with
    # per-layer weights stacked on a leading axis
    # (ops/fused_encoder_stack.py) — built for the small proprioceptive
    # encoder stacks where per-layer programs lose to program count
    # (the round-3 encoder_fused_block refutation). Uses
    # fused_block_frames as the batch-rows block. Exact GELU only.
    fused_stack: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.fused_stack:
            from soccerdiffusion_tpu.ops.fused_encoder_stack import (
                make_encoder_stack_fn,
            )

            if self.fused_gelu != "exact":
                raise ValueError(
                    "fused_stack computes exact GELU; fused_gelu="
                    f"{self.fused_gelu!r} is not supported there")
            dim, ff = self.hidden_dim, self.ff_dim or self.hidden_dim
            layers = [_EncoderLayerParams(dim, ff, name=f"layer_{i}")()
                      for i in range(self.num_layers)]
            c = lambda t: t.astype(self.dtype)
            stk = lambda f: c(jnp.stack([f(p) for p in layers]))
            sa = lambda p: p["self_attn"]
            wqkv = stk(lambda p: jnp.concatenate(
                [sa(p)["q_proj"][0], sa(p)["k_proj"][0], sa(p)["v_proj"][0]],
                axis=1))
            bqkv = stk(lambda p: jnp.concatenate(
                [sa(p)["q_proj"][1], sa(p)["k_proj"][1], sa(p)["v_proj"][1]]))
            fn = make_encoder_stack_fn(self.num_heads, self.num_layers,
                                       self.fused_block_frames,
                                       self.fused_interpret)
            return fn(
                x.astype(self.dtype),
                stk(lambda p: p["norm1"][0]), stk(lambda p: p["norm1"][1]),
                wqkv, bqkv,
                stk(lambda p: sa(p)["out_proj"][0]),
                stk(lambda p: sa(p)["out_proj"][1]),
                stk(lambda p: p["norm2"][0]), stk(lambda p: p["norm2"][1]),
                stk(lambda p: p["mlp"]["linear1"][0]),
                stk(lambda p: p["mlp"]["linear1"][1]),
                stk(lambda p: p["mlp"]["linear2"][0]),
                stk(lambda p: p["mlp"]["linear2"][1]))
        if self.fused_block:
            for i in range(self.num_layers):
                x = FusedTransformerEncoderLayer(
                    self.hidden_dim, self.num_heads, self.ff_dim,
                    dtype=self.dtype, block_frames=self.fused_block_frames,
                    interpret=self.fused_interpret, gelu=self.fused_gelu,
                    layout=self.fused_layout,
                    name=f"layer_{i}",
                )(x)
            return x
        layer_cls = nn.remat(TransformerEncoderLayer) if self.remat \
            else TransformerEncoderLayer
        # honor the gelu knob in the UNFUSED path too, so a checkpoint
        # trained with the fused quick-GELU block serves identically with
        # fused_block off ("poly" approximates exact — stays "gelu" here)
        activation = ("quick_gelu" if self.fused_gelu in ("quick", "bf16")
                      else "gelu")
        for i in range(self.num_layers):
            x = layer_cls(
                self.hidden_dim, self.num_heads, self.ff_dim, dtype=self.dtype,
                attention_impl=self.attention_impl, activation=activation,
                name=f"layer_{i}",
            )(x)
        return x


class FusedTransformerDecoderLayer(nn.Module):
    """Drop-in TransformerDecoderLayer executed by the fused Pallas fwd+bwd
    decoder-layer program (ops/fused_decoder_layer.py). The param tree is
    IDENTICAL to the plain layer (declared through param-only stand-in
    modules), so checkpoints trained either way interchange; the custom-VJP
    backward recomputes the layer in VMEM — per layer only x/memory/dy/
    dx/dmemory and the weights/grads touch HBM (the flat step-remainder
    fix, docs/perf_notes.md round 3).

    The serving path (``memory_kv`` precomputed across denoising steps)
    falls back to the plain math on the same params: the fused kernel
    projects memory K/V in-kernel by design (that is what it saves in
    training), so a cached-K/V call has nothing to gain from it."""

    hidden_dim: int
    num_heads: int
    ff_dim: int | None = None
    dtype: Any = jnp.float32
    block_rows: int = 32
    # None: Mosaic on TPU, interpret on CPU (tests / multichip dryrun)
    interpret: bool | None = None

    def setup(self) -> None:
        dim, ff = self.hidden_dim, self.ff_dim or self.hidden_dim
        self._norm1 = _LayerNormParams(dim, name="norm1")
        self._norm2 = _LayerNormParams(dim, name="norm2")
        self._norm3 = _LayerNormParams(dim, name="norm3")
        self._self_attn = _MhaParams(dim, name="self_attn")
        self._cross_attn = _MhaParams(dim, name="cross_attn")
        self._mlp = _MlpParams(dim, ff, name="mlp")

    def _params(self):
        return dict(
            norm1=self._norm1(), norm2=self._norm2(), norm3=self._norm3(),
            self_attn=self._self_attn(), cross_attn=self._cross_attn(),
            mlp=self._mlp(),
        )

    def compute_memory_kv(self, memory: jnp.ndarray):
        """Cacheable cross-attention K/V (serving path), identical to the
        plain layer's."""
        p = self._params()["cross_attn"]
        b, s, _ = memory.shape
        split = lambda t: t.reshape(b, s, self.num_heads, -1)
        mem = memory.astype(self.dtype)
        k = jnp.dot(mem, p["k_proj"][0].astype(self.dtype)) + p["k_proj"][1]
        v = jnp.dot(mem, p["v_proj"][0].astype(self.dtype)) + p["v_proj"][1]
        return split(k.astype(self.dtype)), split(v.astype(self.dtype))

    def _plain(self, p, x, memory, memory_kv):
        """Plain-math fallback on the SAME params (serving with cached
        K/V, or shapes the kernel does not serve)."""
        from soccerdiffusion_tpu.models.attention import xla_attention

        dim = self.hidden_dim
        c = lambda t: t.astype(self.dtype)
        dense = lambda t, wb: jnp.dot(t, c(wb[0])) + c(wb[1])
        ln = lambda t, wb: _ln(t, wb[0], wb[1]).astype(self.dtype)
        split = lambda t: t.reshape(t.shape[0], t.shape[1], self.num_heads, -1)

        def mha(pp, xq, k, v):
            q = split(c(dense(xq, pp["q_proj"])))
            o = xla_attention(q, k, v).reshape(xq.shape[0], xq.shape[1], dim)
            return dense(o, pp["out_proj"])

        n1 = ln(x, p["norm1"])
        sa = p["self_attn"]
        k1 = split(c(dense(n1, sa["k_proj"])))
        v1 = split(c(dense(n1, sa["v_proj"])))
        x = x + mha(sa, n1, k1, v1)
        n2 = ln(x, p["norm2"])
        if memory_kv is not None:
            k2, v2 = memory_kv
        else:
            ca = p["cross_attn"]
            # memory=None degenerates to self-attention over n2, matching
            # MultiHeadAttention's x_kv=None semantics
            mem = n2 if memory is None else memory.astype(self.dtype)
            k2 = split(c(dense(mem, ca["k_proj"])))
            v2 = split(c(dense(mem, ca["v_proj"])))
        x = x + mha(p["cross_attn"], n2, c(k2), c(v2))
        n3 = ln(x, p["norm3"])
        m = p["mlp"]
        h = nn.gelu(dense(n3, m["linear1"]).astype(jnp.float32),
                    approximate=False)
        return x + dense(h.astype(self.dtype), m["linear2"])

    def __call__(
        self,
        x: jnp.ndarray,
        memory: jnp.ndarray | None = None,
        memory_kv=None,
    ) -> jnp.ndarray:
        from soccerdiffusion_tpu.ops.fused_decoder_layer import make_decoder_layer_fn

        p = self._params()
        if memory_kv is not None or memory is None:
            return self._plain(p, x, memory, memory_kv)
        sa, ca, m = p["self_attn"], p["cross_attn"], p["mlp"]
        wqkv = jnp.concatenate([sa["q_proj"][0], sa["k_proj"][0],
                                sa["v_proj"][0]], axis=1)
        bqkv = jnp.concatenate([sa["q_proj"][1], sa["k_proj"][1],
                                sa["v_proj"][1]])
        fn = make_decoder_layer_fn(self.num_heads, self.block_rows,
                                   self.interpret)
        c = lambda t: t.astype(self.dtype)
        return fn(x.astype(self.dtype), memory.astype(self.dtype),
                  c(p["norm1"][0]), c(p["norm1"][1]), c(wqkv), c(bqkv),
                  c(sa["out_proj"][0]), c(sa["out_proj"][1]),
                  c(p["norm2"][0]), c(p["norm2"][1]),
                  c(ca["q_proj"][0]), c(ca["q_proj"][1]),
                  c(ca["k_proj"][0]), c(ca["k_proj"][1]),
                  c(ca["v_proj"][0]), c(ca["v_proj"][1]),
                  c(ca["out_proj"][0]), c(ca["out_proj"][1]),
                  c(p["norm3"][0]), c(p["norm3"][1]),
                  c(m["linear1"][0]), c(m["linear1"][1]),
                  c(m["linear2"][0]), c(m["linear2"][1]))


def _ln(x, scale, bias, eps=1e-6):
    """fp32 LayerNorm on raw params (flax nn.LayerNorm semantics)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(var + eps)) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)


class TransformerDecoder(nn.Module):
    hidden_dim: int
    num_heads: int
    num_layers: int
    ff_dim: int | None = None
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    # rematerialize each decoder layer in backward: the stored cross-
    # attention K/V over the (B, S, hidden) context are the layer's
    # biggest intermediates; recompute them instead of streaming them
    # through HBM (training-path knob; serving never differentiates)
    remat: bool = False
    # run each layer as the fused Pallas fwd+bwd decoder program instead
    # (ops/fused_decoder_layer.py) — intermediates (memory K/V included)
    # never exist in HBM at all
    fused_block: bool = False
    fused_block_rows: int = 32
    fused_interpret: bool | None = None

    def setup(self) -> None:
        if self.fused_block:
            layer_cls = partial(FusedTransformerDecoderLayer,
                                block_rows=self.fused_block_rows,
                                interpret=self.fused_interpret)
        elif self.remat:
            layer_cls = nn.remat(TransformerDecoderLayer, methods=("__call__",))
        else:
            layer_cls = TransformerDecoderLayer
        extra = {} if self.fused_block else dict(
            attention_impl=self.attention_impl)
        self.layers = [
            layer_cls(
                self.hidden_dim, self.num_heads, self.ff_dim, dtype=self.dtype,
                name=f"layer_{i}", **extra,
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
