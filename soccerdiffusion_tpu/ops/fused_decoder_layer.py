"""Fused cross-attending decoder layer with a hand-derived backward kernel.

Why: after the fused ViT stack (ops/fused_vit_block.py) the flagship train
step's remaining ~21 ms device time is a FLAT profile of ~100 small
HBM-bound fusions, and the denoising decoder's fwd+bwd is the largest
coherent slice of it (docs/perf_notes.md round 3). The decoder's shapes are
hostile to XLA: T=10 chunk-token rows per sample leave every projection,
LayerNorm, softmax, and attention dot a sliver that costs a full HBM round
trip. This module runs one whole pre-norm decoder layer — reference torch
``nn.TransformerDecoderLayer(norm_first=True)`` semantics
(reference ml/model/decoder.py:36-54 via models/transformer.py):

    x += self_attn(LN1(x)); x += cross_attn(LN2(x), memory); x += mlp(LN3(x))

— as ONE Pallas program per robot block, with a ``jax.custom_vjp`` backward
kernel that RECOMPUTES the layer in VMEM. Per layer, only x, memory, dy,
dx, dmemory and the (tiny) weights/grads touch HBM; every intermediate
(memory K/V among them — the layer's biggest activations, (B, S, E) each)
lives and dies in VMEM. ``remat_decoder`` saved the same storage but paid
XLA-shaped recompute; this keeps the recompute on-chip.

Layout: the chunk axis T (pred_len, 10 in every shipped config) is padded
in the wrapper to a sublane-tile multiple Tp, so the (R, Tp, E) <->
(R, H, Tp, E) head stack/merge lower as free rank-4 tile remaps (the
aligned-T path of the ViT block). Padded KEY columns of self-attention are
masked additively; padded query rows produce garbage that the wrapper
slices off, and their cotangents are zero, so gradients are exact (see
tests/test_fused_decoder_layer.py). Attention uses the lane-masked
(R, H*Tp, ·) score layout: only q is head-stacked+masked; k/v ride as
single unmasked copies (measured ~2x faster than per-head loops on the
MXU — docs/perf_notes.md "headloop" refutation).

Numerics: dots in the input dtype with fp32 accumulation; LayerNorm and
softmax in fp32; exact (erf) GELU — the decoder keeps torch's default
activation (only the ViT stack opts into quick-GELU).
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

# the kernel signature: x, memory, then these 22 weight tensors in order
WEIGHT_NAMES = (
    "g1", "be1", "wqkv", "bqkv", "wso", "bso",
    "g2", "be2", "wcq", "bcq", "wck", "bck", "wcv", "bcv", "wco", "bco",
    "g3", "be3", "w1", "b1", "w2", "b2",
)


def _decoder_core(num_heads, T_real):
    """Shared forward recomputation used by both kernels.

    Returns a function computing every intermediate from
    (x3 (R, Tp, E), mem (R, S, E), *weights). T_real <= Tp marks the valid
    chunk rows; self-attention masks key columns >= T_real.
    """

    def core(x3, mem, g1, be1, wqkv, bqkv, wso, bso, g2, be2, wcq, bcq,
             wck, bck, wcv, bcv, wco, bco, g3, be3, w1, b1, w2, b2, dtype):
        R, Tp, E = x3.shape
        H = num_heads
        scale = 1.0 / np.sqrt(E // H)
        mask4 = _mask4(H, E, jnp.float32)

        def dot3(a, w):
            """(R, N, K) @ (K, M) -> (R, N, M) fp32."""
            return jax.lax.dot_general(a, w, (((2,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def bdot(a, b, ca, cb):
            return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((0,), (0,))),
                                       preferred_element_type=jnp.float32)

        def head_stack(t3):
            """(R, Tp, E) -> (R, H*Tp, E): H stacked copies, each lane-masked
            to its head (Tp % 8 == 0 -> free rank-4 tile remaps)."""
            t4 = t3.reshape(R, 1, Tp, E) * mask4.astype(t3.dtype)
            return t4.reshape(R, H * Tp, E)

        def merge_heads(o3):
            """(R, H*Tp, E) -> (R, Tp, E): re-mask each head's row block to
            its own lanes and sum the blocks."""
            o4 = o3.reshape(R, H, Tp, E) * mask4.astype(o3.dtype)
            return jnp.sum(o4, axis=1)

        # additive key-column mask for self-attention: padded chunk rows
        # carry LN-bias garbage that real queries must never attend to
        if Tp > T_real:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Tp), 2)
            colmask = jnp.where(col < T_real, 0.0, -1e9).astype(jnp.float32)
        else:
            colmask = None

        def softmax(s):
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            return e / jnp.sum(e, axis=-1, keepdims=True)

        # ---- self-attention sublayer ----
        x32 = x3.astype(jnp.float32)
        n1_32, xh1, r1 = _ln_fwd(x32, g1, be1)
        n1 = n1_32.astype(dtype)
        qkv = (dot3(n1, wqkv) + bqkv).astype(dtype)  # (R, Tp, 3E)
        q = jax.lax.slice_in_dim(qkv, 0, E, axis=2)
        k = jax.lax.slice_in_dim(qkv, E, 2 * E, axis=2)
        v = jax.lax.slice_in_dim(qkv, 2 * E, 3 * E, axis=2)
        qs = head_stack(q)                       # (R, HTp, E) lane-masked
        s1 = bdot(qs, k, 2, 2) * scale           # (R, HTp, Tp) fp32
        if colmask is not None:
            s1 = s1 + colmask
        p1 = softmax(s1)
        o1 = bdot(p1.astype(dtype), v, 2, 1).astype(dtype)  # (R, HTp, E)
        om1 = merge_heads(o1)                    # (R, Tp, E)
        a1 = dot3(om1, wso) + bso                # fp32
        x2_32 = x32 + a1

        # ---- cross-attention sublayer (memory K/V projected in-kernel) ----
        n2_32, xh2, r2 = _ln_fwd(x2_32, g2, be2)
        n2 = n2_32.astype(dtype)
        q2 = (dot3(n2, wcq) + bcq).astype(dtype)   # (R, Tp, E)
        memc = mem.astype(dtype)
        k2 = (dot3(memc, wck) + bck).astype(dtype)  # (R, S, E)
        v2 = (dot3(memc, wcv) + bcv).astype(dtype)  # (R, S, E)
        q2s = head_stack(q2)                        # (R, HTp, E)
        s2 = bdot(q2s, k2, 2, 2) * scale            # (R, HTp, S) fp32
        p2 = softmax(s2)
        o2 = bdot(p2.astype(dtype), v2, 2, 1).astype(dtype)  # (R, HTp, E)
        om2 = merge_heads(o2)
        a2 = dot3(om2, wco) + bco
        x3_32 = x2_32 + a2

        # ---- MLP sublayer (exact GELU, torch default) ----
        n3_32, xh3, r3 = _ln_fwd(x3_32, g3, be3)
        n3 = n3_32.astype(dtype)
        z = dot3(n3, w1) + b1                    # (R, Tp, FF) fp32
        cdf = _gelu_cdf(z)                       # shared with the bwd grad
        hg = (z * cdf).astype(dtype)
        y32 = x3_32 + dot3(hg, w2) + b2

        return dict(dot3=dot3, bdot=bdot, head_stack=head_stack,
                    merge_heads=merge_heads, scale=scale,
                    x32=x32, xh1=xh1, r1=r1, n1=n1, qs=qs, k=k, v=v, p1=p1,
                    om1=om1, x2_32=x2_32, xh2=xh2, r2=r2, n2=n2,
                    memc=memc, q2s=q2s, k2=k2, v2=v2, p2=p2, om2=om2,
                    x3_32=x3_32, xh3=xh3, r3=r3, n3=n3,
                    z=z, cdf=cdf, hg=hg, y32=y32)

    return core


def _make_fwd_kernel(num_heads, T_real):
    core = _decoder_core(num_heads, T_real)

    def kernel(x_ref, mem_ref, *refs):
        w = [r[...] for r in refs[:-1]]
        y_ref = refs[-1]
        c = core(x_ref[...], mem_ref[...], *w, x_ref.dtype)
        y_ref[...] = c["y32"].astype(y_ref.dtype)

    return kernel


def _make_bwd_kernel(num_heads, T_real):
    core = _decoder_core(num_heads, T_real)

    def kernel(x_ref, mem_ref, dy_ref, *refs):
        w = [r[...] for r in refs[:22]]
        (dx_ref, dmem_ref, dg1_ref, dbe1_ref, dwqkv_ref, dbqkv_ref, dwso_ref,
         dbso_ref, dg2_ref, dbe2_ref, dwcq_ref, dbcq_ref, dwck_ref, dbck_ref,
         dwcv_ref, dbcv_ref, dwco_ref, dbco_ref, dg3_ref, dbe3_ref, dw1_ref,
         db1_ref, dw2_ref, db2_ref) = refs[22:]
        dtype = x_ref.dtype
        (g1, be1, wqkv, bqkv, wso, bso, g2, be2, wcq, bcq, wck, bck, wcv,
         bcv, wco, bco, g3, be3, w1, b1, w2, b2) = w
        c = core(x_ref[...], mem_ref[...], *w, dtype)
        dot3, bdot = c["dot3"], c["bdot"]
        head_stack, merge_heads = c["head_stack"], c["merge_heads"]
        R, Tp, E = x_ref.shape
        S = mem_ref.shape[1]

        def rows2d(t3):
            # Tp and S are sublane multiples in every shipped geometry, so
            # these reshapes are free tile remaps (misaligned S still
            # lowers, just with a relayout copy)
            return t3.reshape(t3.shape[0] * t3.shape[1], t3.shape[2])

        def tdot(a3, b3):
            """Full (R, N) contraction: (R, N, A) x (R, N, B) -> (A, B)."""
            return jax.lax.dot_general(
                rows2d(a3), rows2d(b3), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def rsum(t3):
            """(R, N, M) fp32 -> (1, M) row sum (sequential single-axis
            reductions — safer for Mosaic than one multi-axis reduce)."""
            return jnp.sum(jnp.sum(t3.astype(jnp.float32), axis=0),
                           axis=0).reshape(1, -1)

        def softmax_bwd(p, dp):
            return p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

        g = dy_ref[...].astype(jnp.float32)      # (R, Tp, E); pad rows 0

        # ---- MLP backward ----
        gc = g.astype(dtype)
        dhg = dot3(gc, jnp.transpose(w2))        # (R, Tp, FF) fp32
        dw2 = tdot(c["hg"], gc)
        db2 = rsum(g)
        dz = dhg * _gelu_grad(c["z"], c["cdf"])  # fp32
        dzc = dz.astype(dtype)
        dw1 = tdot(c["n3"], dzc)
        db1 = rsum(dz)
        dn3 = dot3(dzc, jnp.transpose(w1))       # (R, Tp, E) fp32
        dg3 = rsum(dn3 * c["xh3"])
        dbe3 = rsum(dn3)
        dx3 = g + _ln_bwd(dn3, c["xh3"], c["r3"], g3)

        # ---- cross-attention backward ----
        da2 = dx3.astype(dtype)
        dwco = tdot(c["om2"], da2)
        dbco = rsum(dx3)
        dom2 = dot3(da2, jnp.transpose(wco)).astype(dtype)
        do2 = head_stack(dom2)                   # (R, HTp, E) lane-masked
        dp2 = bdot(do2, c["v2"], 2, 2)           # (R, HTp, S) fp32
        # do2 is lane-masked -> each head's dv term lands in its own lanes;
        # the HTp contraction sums the heads
        dv2 = bdot(c["p2"].astype(dtype), do2, 1, 1)  # (R, S, E) fp32
        ds2 = (softmax_bwd(c["p2"], dp2) * c["scale"]).astype(dtype)
        dq2s = bdot(ds2, c["k2"], 2, 1)          # (R, HTp, E) fp32
        # q2s carries the lane mask -> dk2's per-head terms land directly
        dk2 = bdot(ds2, c["q2s"], 1, 1)          # (R, S, E) fp32
        dq2 = merge_heads(dq2s.astype(dtype))    # k2 was unmasked -> mask
        dq2c = dq2.astype(dtype)
        dwcq = tdot(c["n2"], dq2c)
        dbcq = rsum(dq2)
        dk2c = dk2.astype(dtype)
        dv2c = dv2.astype(dtype)
        dwck = tdot(c["memc"], dk2c)
        dbck = rsum(dk2)
        dwcv = tdot(c["memc"], dv2c)
        dbcv = rsum(dv2)
        dmem = dot3(dk2c, jnp.transpose(wck)) + dot3(dv2c, jnp.transpose(wcv))
        dn2 = dot3(dq2c, jnp.transpose(wcq))     # (R, Tp, E) fp32
        dg2 = rsum(dn2 * c["xh2"])
        dbe2 = rsum(dn2)
        dx2 = dx3 + _ln_bwd(dn2, c["xh2"], c["r2"], g2)

        # ---- self-attention backward ----
        da1 = dx2.astype(dtype)
        dwso = tdot(c["om1"], da1)
        dbso = rsum(dx2)
        dom1 = dot3(da1, jnp.transpose(wso)).astype(dtype)
        do1 = head_stack(dom1)
        dp1 = bdot(do1, c["v"], 2, 2)            # (R, HTp, Tp) fp32
        dv1 = bdot(c["p1"].astype(dtype), do1, 1, 1)  # (R, Tp, E) fp32
        # masked key columns have p1 = 0 -> ds1 is 0 there automatically
        ds1 = (softmax_bwd(c["p1"], dp1) * c["scale"]).astype(dtype)
        dq1s = bdot(ds1, c["k"], 2, 1)
        dk1 = bdot(ds1, c["qs"], 1, 1)           # (R, Tp, E) fp32
        dq1 = merge_heads(dq1s.astype(dtype))
        dqkv = jnp.concatenate(
            [dq1.astype(dtype), dk1.astype(dtype), dv1.astype(dtype)],
            axis=2)                              # (R, Tp, 3E)
        dwqkv = tdot(c["n1"], dqkv)
        dbqkv = rsum(dqkv)
        dn1 = dot3(dqkv, jnp.transpose(wqkv))    # fp32
        dg1 = rsum(dn1 * c["xh1"])
        dbe1 = rsum(dn1)
        dx = dx2 + _ln_bwd(dn1, c["xh1"], c["r1"], g1)

        dx_ref[...] = dx.astype(dtype)
        dmem_ref[...] = dmem.astype(dmem_ref.dtype)

        # ---- weight-grad accumulation across the sequential grid ----
        grad_refs = (dg1_ref, dbe1_ref, dwqkv_ref, dbqkv_ref, dwso_ref,
                     dbso_ref, dg2_ref, dbe2_ref, dwcq_ref, dbcq_ref,
                     dwck_ref, dbck_ref, dwcv_ref, dbcv_ref, dwco_ref,
                     dbco_ref, dg3_ref, dbe3_ref, dw1_ref, db1_ref,
                     dw2_ref, db2_ref)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for ref in grad_refs:
                ref[...] = jnp.zeros_like(ref)

        grads = (dg1, dbe1, dwqkv, dbqkv, dwso, dbso, dg2, dbe2, dwcq, dbcq,
                 dwck, dbck, dwcv, dbcv, dwco, dbco, dg3, dbe3, dw1, db1,
                 dw2, db2)
        for ref, val in zip(grad_refs, grads):
            ref[...] += val

    return kernel


def _pad_rows(t, rows):
    if rows == t.shape[1]:
        return t
    return jnp.pad(t, ((0, 0), (0, rows - t.shape[1]), (0, 0)))


@lru_cache(maxsize=None)
def make_decoder_layer_fn(num_heads: int, block_rows: int = 32,
                          interpret: bool | None = None):
    """Build the custom-VJP fused decoder layer for a head count / robot block.

    Returned fn: ``(x, mem, g1, be1, wqkv, bqkv, wso, bso, g2, be2, wcq, bcq,
    wck, bck, wcv, bcv, wco, bco, g3, be3, w1, b1, w2, b2) -> y`` with
    x (B, T, E) chunk tokens and mem (B, S, E) context tokens; every weight
    arg is differentiable, and mem's gradient flows back to the context
    encoders. B shrinks to the largest dividing block. ``interpret=None``
    resolves per call: Mosaic on TPU, interpret mode on CPU (tests /
    multichip dryrun)."""

    def _interp() -> bool:
        return (jax.default_backend() == "cpu") if interpret is None else interpret

    def _grid(n):
        r = min(block_rows, n)
        while n % r:
            r -= 1
        return r, n // r

    def _fwd_impl(x, mem, *w):
        n, T, E = x.shape
        S = mem.shape[1]
        Tp = -(-T // 8) * 8
        xp = _pad_rows(x, Tp)
        R, nb = _grid(n)
        y = pl.pallas_call(
            _make_fwd_kernel(num_heads, T),
            grid=(nb,),
            in_specs=[pl.BlockSpec((R, Tp, E), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, S, E), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 22,
            out_specs=pl.BlockSpec((R, Tp, E), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, Tp, E), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=_interp(),
        )(xp, mem, *w)
        return y[:, :T] if Tp != T else y

    def _bwd_impl(x, mem, dy, *w):
        n, T, E = x.shape
        S = mem.shape[1]
        FF = w[18].shape[-1]  # w1 (E, FF)
        Tp = -(-T // 8) * 8
        xp = _pad_rows(x, Tp)
        dyp = _pad_rows(dy, Tp)  # pad-row cotangents are zero -> exact grads
        R, nb = _grid(n)
        acc = lambda *shape: jax.ShapeDtypeStruct(shape, jnp.float32)
        gspec = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _make_bwd_kernel(num_heads, T),
            grid=(nb,),
            in_specs=[pl.BlockSpec((R, Tp, E), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, S, E), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, Tp, E), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 22,
            out_specs=[pl.BlockSpec((R, Tp, E), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((R, S, E), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)]
            + [gspec(1, E), gspec(1, E), gspec(E, 3 * E), gspec(1, 3 * E),
               gspec(E, E), gspec(1, E), gspec(1, E), gspec(1, E),
               gspec(E, E), gspec(1, E), gspec(E, E), gspec(1, E),
               gspec(E, E), gspec(1, E), gspec(E, E), gspec(1, E),
               gspec(1, E), gspec(1, E), gspec(E, FF), gspec(1, FF),
               gspec(FF, E), gspec(1, E)],
            out_shape=[jax.ShapeDtypeStruct((n, Tp, E), x.dtype),
                       jax.ShapeDtypeStruct((n, S, E), mem.dtype),
                       acc(1, E), acc(1, E), acc(E, 3 * E), acc(1, 3 * E),
                       acc(E, E), acc(1, E), acc(1, E), acc(1, E),
                       acc(E, E), acc(1, E), acc(E, E), acc(1, E),
                       acc(E, E), acc(1, E), acc(E, E), acc(1, E),
                       acc(1, E), acc(1, E), acc(E, FF), acc(1, FF),
                       acc(FF, E), acc(1, E)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=_interp(),
        )(xp, mem, dyp, *w)
        dx = out[0][:, :T] if Tp != T else out[0]
        return (dx, out[1]) + tuple(out[2:])

    @jax.custom_vjp
    def layer(x, mem, *w):
        return _fwd_impl(x, mem, *w)

    def fwd(x, mem, *w):
        return _fwd_impl(x, mem, *w), (x, mem, w)

    def bwd(res, dy):
        x, mem, w = res
        out = _bwd_impl(x, mem, dy, *w)
        dx, dmem = out[0], out[1]
        grads = out[2:]
        # 1-D params (LN scales/biases, dense biases) ride as (1, n) rows
        flat = tuple(t.reshape(t.shape[-1]) if t.shape[0] == 1 else t
                     for t in grads)
        return (dx, dmem) + flat

    layer.defvjp(fwd, bwd)
    return layer
