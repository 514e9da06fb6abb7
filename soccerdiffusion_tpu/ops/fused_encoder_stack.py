"""Fused multi-layer transformer-encoder stack with a hand-derived backward.

Why: the flagship step's depth-0 ablation (docs/perf_notes.md round 3 /
benchmarks/mfu_remainder_ablate.sh) attributes the largest remainder slice
to the three proprioceptive context-encoder stacks — ~2 layers x 100 tokens
x hidden each, whose per-op tensors are so small that the XLA path runs
~8 TFLOP/s. Round 3's attempt to route them through the generic per-layer
ViT block (``encoder_fused_block``) was a measured refutation: 12 separate
Pallas programs at sublane-misaligned T=100 lost more to program count and
relayouts than fusion saved. This kernel instead runs a WHOLE L-layer
stack as ONE program per batch block (per-layer weights stacked on a
leading axis), with a ``jax.custom_vjp`` backward that keeps the L+1
inter-layer activations in VMEM and recomputes each layer's internals —
per stack only x, y, dy, dx and the weights/grads touch HBM.

Layer semantics: reference torch ``nn.TransformerEncoderLayer
(norm_first=True, activation="gelu", dim_feedforward=hidden)``
(reference ml/model/encoder/base.py:29-39 via models/transformer.py):

    x += self_attn(LN1(x)); x += mlp(LN2(x))

Layout: tokens pad to a sublane-tile multiple Tp (100 -> 104) so the
(R, Tp, E) <-> (R, H, Tp, E) head stack/merge lower as free rank-4 tile
remaps; padded KEY columns are masked additively (padded rows carry
LN-bias garbage), padded query rows are sliced off and their cotangents
are zero, so gradients are exact (tests/test_fused_encoder_stack.py).
Attention uses the lane-masked (R, H*Tp, Tp) score layout of
ops/fused_vit_block.py.

Used by ``TransformerEncoder`` when ``fused_stack=True`` (the
``encoder_fused_stack`` config knob); exact (erf) GELU throughout — the
proprio encoders keep torch's default activation.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from soccerdiffusion_tpu.ops.fused_vit_block import (
    _gelu_cdf,
    _gelu_grad,
    _ln_bwd,
    _ln_fwd,
    _mask4,
)

# stacked weight tensors, each with a leading (L,) layer axis
STACK_WEIGHT_SHAPES = (
    ("g1", "(L, E)"), ("be1", "(L, E)"), ("wqkv", "(L, E, 3E)"),
    ("bqkv", "(L, 3E)"), ("wo", "(L, E, E)"), ("bo", "(L, E)"),
    ("g2", "(L, E)"), ("be2", "(L, E)"), ("w1", "(L, E, FF)"),
    ("b1", "(L, FF)"), ("w2", "(L, FF, E)"), ("b2", "(L, E)"),
)


def _stack_core(num_heads, T_real):
    """Single-layer forward returning every intermediate (shared by fwd and
    the bwd recompute). Inputs are one layer's (unstacked) weights."""

    def core(x32, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1, b1, w2, b2,
             dtype):
        R, Tp, E = x32.shape
        H = num_heads
        scale = 1.0 / np.sqrt(E // H)
        mask4 = _mask4(H, E, jnp.float32)

        def dot3(a, w):
            return jax.lax.dot_general(a, w, (((2,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def bdot(a, b, ca, cb):
            return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((0,), (0,))),
                                       preferred_element_type=jnp.float32)

        def head_stack(t3):
            t4 = t3.reshape(R, 1, Tp, E) * mask4.astype(t3.dtype)
            return t4.reshape(R, H * Tp, E)

        def merge_heads(o3):
            o4 = o3.reshape(R, H, Tp, E) * mask4.astype(o3.dtype)
            return jnp.sum(o4, axis=1)

        if Tp > T_real:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Tp), 2)
            colmask = jnp.where(col < T_real, 0.0, -1e9).astype(jnp.float32)
        else:
            colmask = None

        n1_32, xh1, r1 = _ln_fwd(x32, g1, be1)
        n1 = n1_32.astype(dtype)
        qkv = (dot3(n1, wqkv) + bqkv).astype(dtype)   # (R, Tp, 3E)
        q = jax.lax.slice_in_dim(qkv, 0, E, axis=2)
        k = jax.lax.slice_in_dim(qkv, E, 2 * E, axis=2)
        v = jax.lax.slice_in_dim(qkv, 2 * E, 3 * E, axis=2)
        qs = head_stack(q)
        s = bdot(qs, k, 2, 2) * scale                 # (R, HTp, Tp) fp32
        if colmask is not None:
            s = s + colmask
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = bdot(p.astype(dtype), v, 2, 1).astype(dtype)
        om = merge_heads(o)                           # (R, Tp, E)
        a = dot3(om, wo) + bo
        x2_32 = x32 + a
        n2_32, xh2, r2 = _ln_fwd(x2_32, g2, be2)
        n2 = n2_32.astype(dtype)
        z = dot3(n2, w1) + b1                         # (R, Tp, FF) fp32
        cdf = _gelu_cdf(z)
        hg = (z * cdf).astype(dtype)
        y32 = x2_32 + dot3(hg, w2) + b2
        return dict(dot3=dot3, bdot=bdot, head_stack=head_stack,
                    merge_heads=merge_heads, scale=scale,
                    xh1=xh1, r1=r1, n1=n1, qs=qs, k=k, v=v, p=p, om=om,
                    x2_32=x2_32, xh2=xh2, r2=r2, n2=n2,
                    z=z, cdf=cdf, hg=hg, y32=y32)

    return core


def _layer_weights(w_all, l):
    """Slice layer l's weights out of the stacked (L, ...) tensors."""
    return [jax.lax.index_in_dim(w, l, axis=0, keepdims=False) for w in w_all]


def _make_fwd_kernel(num_heads, num_layers, T_real):
    core = _stack_core(num_heads, T_real)

    def kernel(x_ref, *refs):
        w_all = [r[...] for r in refs[:12]]
        y_ref = refs[12]
        dtype = x_ref.dtype
        x32 = x_ref[...].astype(jnp.float32)
        for l in range(num_layers):
            x32 = core(x32, *_layer_weights(w_all, l), dtype)["y32"]
        y_ref[...] = x32.astype(dtype)

    return kernel


def _make_bwd_kernel(num_heads, num_layers, T_real):
    core = _stack_core(num_heads, T_real)

    def kernel(x_ref, dy_ref, *refs):
        w_all = [r[...] for r in refs[:12]]
        dx_ref = refs[12]
        grad_refs = refs[13:]
        dtype = x_ref.dtype

        def rows2d(t3):
            return t3.reshape(t3.shape[0] * t3.shape[1], t3.shape[2])

        def tdot(a3, b3):
            return jax.lax.dot_general(
                rows2d(a3), rows2d(b3), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def rsum(t3):
            return jnp.sum(jnp.sum(t3.astype(jnp.float32), axis=0),
                           axis=0).reshape(1, -1)

        # recompute the inter-layer activations (kept in VMEM)
        xs = [x_ref[...].astype(jnp.float32)]
        for l in range(num_layers):
            xs.append(core(xs[-1], *_layer_weights(w_all, l), dtype)["y32"])

        g = dy_ref[...].astype(jnp.float32)
        # per-layer grads accumulated over layers as python lists, written
        # back stacked
        acc = [None] * 12
        for l in reversed(range(num_layers)):
            wl = _layer_weights(w_all, l)
            (g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1, b1, w2, b2) = wl
            c = core(xs[l], *wl, dtype)
            dot3, bdot = c["dot3"], c["bdot"]
            head_stack, merge_heads = c["head_stack"], c["merge_heads"]

            # ---- MLP backward ----
            gc = g.astype(dtype)
            dhg = dot3(gc, jnp.transpose(w2))
            dw2 = tdot(c["hg"], gc)
            db2 = rsum(g)
            dz = dhg * _gelu_grad(c["z"], c["cdf"])
            dzc = dz.astype(dtype)
            dw1 = tdot(c["n2"], dzc)
            db1 = rsum(dz)
            dn2 = dot3(dzc, jnp.transpose(w1))
            dg2 = rsum(dn2 * c["xh2"])
            dbe2 = rsum(dn2)
            dx2 = g + _ln_bwd(dn2, c["xh2"], c["r2"], g2)

            # ---- attention backward ----
            da = dx2.astype(dtype)
            dwo = tdot(c["om"], da)
            dbo = rsum(dx2)
            dom = dot3(da, jnp.transpose(wo)).astype(dtype)
            do = head_stack(dom)
            dp = bdot(do, c["v"], 2, 2)
            dv = bdot(c["p"].astype(dtype), do, 1, 1)
            ds = (c["p"] * (dp - jnp.sum(dp * c["p"], axis=-1, keepdims=True))
                  * c["scale"]).astype(dtype)
            dqs = bdot(ds, c["k"], 2, 1)
            dk = bdot(ds, c["qs"], 1, 1)
            dq = merge_heads(dqs.astype(dtype))
            dqkv = jnp.concatenate(
                [dq.astype(dtype), dk.astype(dtype), dv.astype(dtype)],
                axis=2)
            dwqkv = tdot(c["n1"], dqkv)
            dbqkv = rsum(dqkv)
            dn1 = dot3(dqkv, jnp.transpose(wqkv))
            dg1 = rsum(dn1 * c["xh1"])
            dbe1 = rsum(dn1)
            g = dx2 + _ln_bwd(dn1, c["xh1"], c["r1"], g1)

            layer_grads = (dg1, dbe1, dwqkv, dbqkv, dwo, dbo, dg2, dbe2,
                           dw1, db1, dw2, db2)
            for i, lg in enumerate(layer_grads):
                if acc[i] is None:
                    acc[i] = [None] * num_layers
                acc[i][l] = lg

        dx_ref[...] = g.astype(dtype)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for ref in grad_refs:
                ref[...] = jnp.zeros_like(ref)

        # write stacked (L, ...) grads; 1-D params ride as (L, n) rows
        for i, ref in enumerate(grad_refs):
            stacked = jnp.stack([t.reshape(ref.shape[1:]) for t in acc[i]])
            ref[...] += stacked

    return kernel


def _pad_rows(t, rows):
    if rows == t.shape[1]:
        return t
    return jnp.pad(t, ((0, 0), (0, rows - t.shape[1]), (0, 0)))


@lru_cache(maxsize=None)
def make_encoder_stack_fn(num_heads: int, num_layers: int,
                          block_rows: int = 16,
                          interpret: bool | None = None):
    """Build the custom-VJP fused L-layer encoder stack.

    Returned fn: ``(x, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1, b1, w2, b2)
    -> y`` with x (B, T, E) and every weight stacked (L, ...); all weights
    differentiable (grads come back stacked). B shrinks to the largest
    dividing block. ``interpret=None``: Mosaic on TPU, interpret on CPU."""

    def _interp() -> bool:
        return (jax.default_backend() == "cpu") if interpret is None else interpret

    def _grid(n):
        r = min(block_rows, n)
        while n % r:
            r -= 1
        return r, n // r

    def _fwd_impl(x, *w):
        n, T, E = x.shape
        Tp = -(-T // 8) * 8
        xp = _pad_rows(x, Tp)
        R, nb = _grid(n)
        y = pl.pallas_call(
            _make_fwd_kernel(num_heads, num_layers, T),
            grid=(nb,),
            in_specs=[pl.BlockSpec((R, Tp, E), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
            out_specs=pl.BlockSpec((R, Tp, E), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, Tp, E), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=_interp(),
        )(xp, *w)
        return y[:, :T] if Tp != T else y

    def _bwd_impl(x, dy, *w):
        n, T, E = x.shape
        L = num_layers
        FF = w[8].shape[-1]  # w1 (L, E, FF)
        Tp = -(-T // 8) * 8
        xp = _pad_rows(x, Tp)
        dyp = _pad_rows(dy, Tp)
        R, nb = _grid(n)
        acc3 = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
        gspec = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                        memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _make_bwd_kernel(num_heads, num_layers, T),
            grid=(nb,),
            in_specs=[pl.BlockSpec((R, Tp, E), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
            out_specs=[pl.BlockSpec((R, Tp, E), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)]
            + [gspec(L, E), gspec(L, E), gspec(L, E, 3 * E), gspec(L, 3 * E),
               gspec(L, E, E), gspec(L, E), gspec(L, E), gspec(L, E),
               gspec(L, E, FF), gspec(L, FF), gspec(L, FF, E), gspec(L, E)],
            out_shape=[jax.ShapeDtypeStruct((n, Tp, E), x.dtype),
                       acc3(L, E), acc3(L, E), acc3(L, E, 3 * E),
                       acc3(L, 3 * E), acc3(L, E, E), acc3(L, E),
                       acc3(L, E), acc3(L, E), acc3(L, E, FF), acc3(L, FF),
                       acc3(L, FF, E), acc3(L, E)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=_interp(),
        )(xp, dyp, *w)
        dx = out[0][:, :T] if Tp != T else out[0]
        return (dx,) + tuple(out[1:])

    @jax.custom_vjp
    def stack(x, *w):
        return _fwd_impl(x, *w)

    def fwd(x, *w):
        return _fwd_impl(x, *w), (x, w)

    def bwd(res, dy):
        x, w = res
        out = _bwd_impl(x, dy, *w)
        return (out[0],) + tuple(out[1:])

    stack.defvjp(fwd, bwd)
    return stack
