"""Fused ViT transformer block with a hand-derived backward kernel.

Why: the vit_flagship train step is HBM-bandwidth-bound (docs/perf_notes.md:
3.06 TFLOP over ~81 GB accessed -> ~16% MFU ceiling). Most of that traffic
is the image encoder's per-block activation stream — XLA stores every
intermediate (LN outputs, qkv, attention probabilities, the 4x-wide MLP
hidden) to HBM for the backward pass. This module runs one whole pre-norm
transformer block (reference layer semantics: ml/model/encoder/base.py:29-39
via models/transformer.py — LN1 -> MHA -> +res -> LN2 -> exact-GELU MLP ->
+res) as ONE Pallas program per frame block, with a ``jax.custom_vjp``
backward kernel that RECOMPUTES the block's internals in VMEM: the only
HBM traffic per block is x, y, dy, dx and the (tiny) weights/grads.

Numerics: dots in the input dtype with fp32 accumulation; LayerNorm,
softmax, and GELU in fp32 (flax LayerNorm eps 1e-6). Attention uses a
lane-masked (F, HT, T) score layout: only q is head-stacked+masked and it
contracts against single unmasked k/v copies, so scores/softmax/value
dots are H x smaller than the (F, HT, HT) block-diagonal formulation of
ops/fused_denoise.py and no -1e9 cross-head mask exists at all.

Used by the ViT image encoder when ``vit_fused_block: true``
(models/vision.py); parity + gradient tests: tests/test_fused_vit_block.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from soccerdiffusion_tpu.ops.fused_denoise import _erf

_EPS = 1e-6  # flax nn.LayerNorm default


def _gelu_cdf(z):
    """Phi(z) = 0.5*(1+erf(z/sqrt(2))) in fp32 (polynomial erf — Mosaic has
    no erf primitive). GELU(z) = z*Phi(z); shared between the forward
    recompute and the gradient so the (FT, FF)-wide erf runs ONCE in bwd."""
    z = z.astype(jnp.float32)
    return 0.5 * (1.0 + _erf(z * np.float32(1.0 / np.sqrt(2.0))))


def _gelu_grad(z, cdf):
    """d/dz of exact GELU given precomputed Phi(z): Phi(z) + z * phi(z)."""
    z = z.astype(jnp.float32)
    phi = jnp.exp(-0.5 * z * z) * np.float32(1.0 / np.sqrt(2.0 * np.pi))
    return cdf + z * phi


# Piecewise-polynomial exact-GELU approximation (microbenched: the
# erf/exp-based exact GELU costs ~12 ms of the flagship stack's 64 ms
# fwd+bwd; this runs as pure FMAs on the VPU). Minimax (Chebyshev) fits on
# |z| <= 3.75 with linear/zero tails: |poly - gelu| <= 3.4e-4,
# |poly' - gelu'| <= 1.8e-3 over all z — below bf16 activation rounding.
# Even/odd structure: gelu(z) = z/2 + G(z^2), gelu'(z) = 1/2 + z*H(z^2).
_GELU_R = 3.75
_GELU_G = (7.7387867635e-05, 3.9815118597e-01, -6.5148636098e-02,
           9.0873994758e-03, -8.8830326732e-04, 5.6548416021e-05,
           -2.0787433172e-06, 3.3143120958e-08)
_GELU_H = (7.9546119838e-01, -2.5856087522e-01, 5.3150608964e-02,
           -6.7156793228e-03, 5.1222947652e-04, -2.1502364740e-05,
           3.7926810910e-07)


def _horner(coeffs, u):
    acc = jnp.full_like(u, coeffs[-1])
    for c in coeffs[-2::-1]:
        acc = acc * u + jnp.asarray(c, u.dtype)
    return acc


def _gelu_poly(z):
    z = z.astype(jnp.float32)
    zc = jnp.clip(z, -_GELU_R, _GELU_R)
    core = 0.5 * zc + _horner(_GELU_G, zc * zc)
    return jnp.where(z > _GELU_R, z, jnp.where(z < -_GELU_R, 0.0, core))


def _gelu_poly_grad(z):
    z = z.astype(jnp.float32)
    zc = jnp.clip(z, -_GELU_R, _GELU_R)
    core = 0.5 + zc * _horner(_GELU_H, zc * zc)
    return jnp.where(z > _GELU_R, 1.0, jnp.where(z < -_GELU_R, 0.0, core))


# "quick"/"bf16" GELU variants: quick-GELU, z * sigmoid(1.702 z) — the
# activation CLIP trains with. Motivation: the exact/poly GELU chain was
# measured VPU-PASS-bound over the (FT, FF) tensor, not transcendental-
# bound (poly == erf == ~12 ms; relu -12 ms — docs/perf_notes.md), so
# the lever is FEWER materialized passes (quick-GELU is ~6 ops vs ~12+)
# and, for "bf16", HALF the bytes per pass (evaluated on storage-dtype
# arrays). Constraints that shaped this choice (benchmarks/
# probe_bf16_prims.py): v5e Mosaic has no bf16 comparisons, so
# clip/where-tail polynomial forms are out in bf16, and high-degree
# power-basis Horner is ill-conditioned in bf16 anyway (measured 0.88
# abs err near |z|=3.6). quick-GELU is compare-free, saturates
# gracefully at bf16 extremes, and differs from exact GELU by <= 2.1e-2
# (fwd) / 3.0e-2 (grad) in fp32 — an activation-function substitution
# (documented at the config), not a numerics bug. All scalar constants
# ride weak-typed so the chain stays in z's own dtype.
def _gelu_quick(z):
    """sigmoid(1.702 z); the forward is z * this, shared with the grad."""
    return 1.0 / (1.0 + jnp.exp(-1.702 * z))


def _gelu_quick_grad(z, s):
    """d/dz of z*sigmoid(1.702 z) given s = sigmoid(1.702 z)."""
    return s * (1.0 + 1.702 * z * (1.0 - s))


def _ln_fwd(x32, g, b):
    """fp32 LayerNorm; returns (out, xhat, rstd)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = xc * rstd
    return xhat * g.astype(jnp.float32) + b.astype(jnp.float32), xhat, rstd


def _ln_bwd(dn, xhat, rstd, g):
    """Input-gradient of LayerNorm (fp32); dn/(xhat) are (R, W)."""
    dxhat = dn * g.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return rstd * (dxhat - m1 - xhat * m2)


def _block_core(num_heads, ablate=frozenset(), gelu="exact"):
    """Shared forward recomputation used by both kernels (stacked layout).
    Returns a function computing every intermediate from (x2d, weights...).

    ``ablate`` is a microbench-only knob (benchmarks/microbench_vit_block.py)
    that disables pieces of the block to attribute kernel time; production
    callers never set it. Options: "no_attn" (attention sublayer = identity),
    "no_mlp" (MLP sublayer = identity), "relu_gelu" (ReLU instead of exact
    GELU — isolates the polynomial-erf VPU cost), "no_softmax" (scores used
    as probabilities — isolates exp/normalize VPU cost)."""

    def core(x2d, F, T, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1, b1, w2, b2,
             head_masks, dtype):
        W = x2d.shape[-1]
        H = num_heads
        HT = H * T
        scale = 1.0 / np.sqrt(W // H)

        def dot(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def bdot(a, b, ca, cb):
            return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((0,), (0,))),
                                       preferred_element_type=jnp.float32)

        # T a sublane-tile multiple -> the (F, HT, W) <-> (F, H, T, W)
        # reshapes are free tile remaps, so the stack/merge run as ONE
        # rank-4 broadcast-multiply (and a reduce) instead of H masked
        # copies + concat/slice relayouts. T=49 (patch-32 flagship) takes
        # the concat path; T=64 (patch-28) takes the rank-4 path.
        aligned = T % 8 == 0
        mask4 = _mask4(num_heads, W, jnp.float32) if aligned else None

        def head_stack(t2d):
            """(FT, W) -> (F, HT, W): H stacked copies, each lane-masked to
            its head (the mask makes a full-W contraction against a single
            unmasked operand read only this head's lanes)."""
            t3 = t2d.reshape(F, T, W)
            if aligned:
                t4 = t3.reshape(F, 1, T, W) * mask4.astype(t3.dtype)
                return t4.reshape(F, H * T, W)
            return jnp.concatenate([t3 * m for m in head_masks], axis=1)

        def merge_heads(o3):
            """(F, HT, W) -> (FT, W): re-mask each head's row block to its
            own lanes and sum the blocks."""
            if aligned:
                o4 = o3.reshape(F, num_heads, T, W) * mask4.astype(o3.dtype)
                return jnp.sum(o4, axis=1).reshape(F * T, W)
            total = None
            for hh in range(num_heads):
                part = jax.lax.slice_in_dim(o3, hh * T, (hh + 1) * T, axis=1)
                part = part * head_masks[hh].astype(part.dtype)
                total = part if total is None else total + part
            return total.reshape(F * T, W)

        x32 = x2d.astype(jnp.float32)
        n1_32, xh1, r1 = _ln_fwd(x32, g1, be1)
        n1 = n1_32.astype(dtype)
        if "no_attn" in ablate:
            qkv = qs = k3 = v3 = p = o3 = om = None
            x2_32 = x32
        else:
            qkv = (dot(n1, wqkv) + bqkv).astype(dtype)  # (FT, 3W)
            q = jax.lax.slice_in_dim(qkv, 0, W, axis=1)
            k = jax.lax.slice_in_dim(qkv, W, 2 * W, axis=1)
            v = jax.lax.slice_in_dim(qkv, 2 * W, 3 * W, axis=1)
            # (F, HT, T) score layout: ONLY q is head-stacked+lane-masked;
            # contracting it against the single unmasked k copy yields the
            # exact per-head scores (the masked operand zeroes every
            # cross-head lane), with H x fewer score entries than the old
            # (F, HT, HT) block-diagonal form — H x cheaper score/value
            # dots and softmax, and no -1e9 self-mask at all.
            qs = head_stack(q)  # (F, HT, W) lane-masked
            k3 = k.reshape(F, T, W)
            v3 = v.reshape(F, T, W)
            s = bdot(qs, k3, 2, 2) * scale  # (F, HT, T) fp32
            if "no_softmax" in ablate:
                p = s * np.float32(1e-2)
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                p = e / jnp.sum(e, axis=-1, keepdims=True)  # fp32
            # o3 rows mix ALL of v's lanes -> the merge must re-mask each
            # head block to its own lanes
            o3 = bdot(p.astype(dtype), v3, 2, 1).astype(dtype)  # (F, HT, W)
            om = merge_heads(o3)  # (FT, W)
            a = dot(om, wo) + bo  # fp32
            x2_32 = x32 + a
        x2 = x2_32.astype(dtype)
        n2_32, xh2, r2 = _ln_fwd(x2_32, g2, be2)
        n2 = n2_32.astype(dtype)
        if "no_mlp" in ablate:
            z = cdf = hg = None
            y32 = x2_32
        else:
            z = dot(n2, w1) + b1  # (FT, FF) fp32
            cdf = None
            if "relu_gelu" in ablate:
                hg = jnp.maximum(z, 0.0).astype(dtype)
            elif gelu == "poly":
                hg = _gelu_poly(z).astype(dtype)
            elif gelu in ("quick", "bf16"):
                if gelu == "bf16":
                    z = z.astype(dtype)  # chain rides storage-dtype arrays
                cdf = _gelu_quick(z)  # sigmoid, shared with the bwd grad
                hg = (z * cdf).astype(dtype)
            else:
                cdf = _gelu_cdf(z)  # fp32, shared with the bwd GELU grad
                hg = (z * cdf).astype(dtype)
            y32 = x2_32 + dot(hg, w2) + b2
        return dict(dot=dot, bdot=bdot, head_stack=head_stack,
                    merge_heads=merge_heads, scale=scale,
                    x32=x32, xh1=xh1, r1=r1, n1=n1, qkv=qkv,
                    qs=qs, k3=k3, v3=v3, p=p, o3=o3, om=om,
                    x2=x2, x2_32=x2_32, xh2=xh2, r2=r2, n2=n2,
                    z=z, cdf=cdf, hg=hg, y32=y32)

    return core


def _headloop_core(num_heads, ablate=frozenset(), gelu="exact"):
    """Rank-3 per-head-loop forward recomputation (``layout="headloop"``).

    Numerically identical to the stacked layout, but never materializes the
    (F, HT, W) head-stacked tensors: q/k/v stay (F, T, W); per head h the
    score dot contracts q against a lane-masked k copy (the mask zeroes the
    other heads' lanes, so the full-W contraction IS that head's score) and
    the per-head value outputs are lane-masked back and summed. This removes
    the stack/merge concat+slice copies AND every (FT, W) <-> (F, T, W)
    reshape — T=49 rows are sublane-misaligned, so those reshapes are
    relayout copies in Mosaic. Same FLOPs as the stacked layout (H smaller
    dots instead of one H-times-taller dot)."""

    def core(x3, F, T, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1, b1, w2, b2,
             head_masks, dtype):
        W = x3.shape[-1]
        H = num_heads
        scale = 1.0 / np.sqrt(W // H)

        def dot3(a, b):
            """(F, T, K) @ (K, M) -> (F, T, M), fp32 accumulation."""
            return jax.lax.dot_general(a, b, (((2,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def bdot(a, b, ca, cb):
            return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((0,), (0,))),
                                       preferred_element_type=jnp.float32)

        def cdot(a, b):
            """Full (F, T) contraction: (F, T, A) x (F, T, B) -> (A, B).

            Mosaic's tpu.matmul cannot lower a two-dim contraction (lhs
            contracting dims must be size 1), so unroll the F axis into
            accumulated per-frame (T, A)^T @ (T, B) dots — this also
            avoids the misaligned (F*T, A) reshape a 2D tdot would need."""
            acc = None
            for f in range(a.shape[0]):
                d = jax.lax.dot_general(a[f], b[f], (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            return acc

        x32 = x3.astype(jnp.float32)
        n1_32, xh1, r1 = _ln_fwd(x32, g1, be1)
        n1 = n1_32.astype(dtype)
        if "no_attn" in ablate:
            qkv = q3 = v3 = None
            khs = ps = None
            om32 = None
            x2_32 = x32
        else:
            qkv = (dot3(n1, wqkv) + bqkv).astype(dtype)  # (F, T, 3W)
            q3 = jax.lax.slice_in_dim(qkv, 0, W, axis=2)
            k3 = jax.lax.slice_in_dim(qkv, W, 2 * W, axis=2)
            v3 = jax.lax.slice_in_dim(qkv, 2 * W, 3 * W, axis=2)
            khs = [k3 * m.astype(dtype) for m in head_masks]
            ps = []
            om32 = None
            for h in range(H):
                s = bdot(q3, khs[h], 2, 2) * scale  # (F, T, T) fp32
                if "no_softmax" in ablate:
                    p = s * np.float32(1e-2)
                else:
                    m = jnp.max(s, axis=-1, keepdims=True)
                    e = jnp.exp(s - m)
                    p = e / jnp.sum(e, axis=-1, keepdims=True)
                ps.append(p)
                o = bdot(p.astype(dtype), v3, 2, 1)  # (F, T, W) fp32
                o = o * head_masks[h].astype(jnp.float32)
                om32 = o if om32 is None else om32 + o
            a = dot3(om32.astype(dtype), wo) + bo  # fp32
            x2_32 = x32 + a
        n2_32, xh2, r2 = _ln_fwd(x2_32, g2, be2)
        n2 = n2_32.astype(dtype)
        if "no_mlp" in ablate:
            z = cdf = hg = None
            y32 = x2_32
        else:
            z = dot3(n2, w1) + b1  # (F, T, FF) fp32
            cdf = None
            if "relu_gelu" in ablate:
                hg = jnp.maximum(z, 0.0).astype(dtype)
            elif gelu == "poly":
                hg = _gelu_poly(z).astype(dtype)
            elif gelu in ("quick", "bf16"):
                if gelu == "bf16":
                    z = z.astype(dtype)
                cdf = _gelu_quick(z)
                hg = (z * cdf).astype(dtype)
            else:
                cdf = _gelu_cdf(z)
                hg = (z * cdf).astype(dtype)
            y32 = x2_32 + dot3(hg, w2) + b2
        return dict(dot3=dot3, bdot=bdot, cdot=cdot, scale=scale,
                    x32=x32, xh1=xh1, r1=r1, n1=n1, qkv=qkv,
                    q3=q3, v3=v3, khs=khs, ps=ps, om32=om32,
                    x2_32=x2_32, xh2=xh2, r2=r2, n2=n2,
                    z=z, cdf=cdf, hg=hg, y32=y32)

    return core


def _make_headloop_fwd_kernel(num_heads, F, T, ablate=frozenset(),
                              gelu="exact"):
    core = _headloop_core(num_heads, ablate, gelu)

    def kernel(x_ref, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1, b1, w2, b2,
               y_ref):
        dtype = x_ref.dtype
        W = x_ref.shape[-1]
        head_masks = _masks(num_heads, T, W, jnp.float32)
        c = core(x_ref[...], F, T, g1[...], be1[...], wqkv[...], bqkv[...],
                 wo[...], bo[...], g2[...], be2[...], w1[...], b1[...],
                 w2[...], b2[...], head_masks, dtype)
        y_ref[...] = c["y32"].astype(dtype)

    return kernel


def _make_headloop_bwd_kernel(num_heads, F, T, ablate=frozenset(),
                              gelu="exact"):
    core = _headloop_core(num_heads, ablate, gelu)

    def kernel(x_ref, dy_ref, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1, b1,
               w2, b2, dx_ref, dg1_ref, dbe1_ref, dwqkv_ref, dbqkv_ref,
               dwo_ref, dbo_ref, dg2_ref, dbe2_ref, dw1_ref, db1_ref,
               dw2_ref, db2_ref):
        dtype = x_ref.dtype
        W = x_ref.shape[-1]
        H = num_heads
        head_masks = _masks(num_heads, T, W, jnp.float32)
        c = core(x_ref[...], F, T, g1[...], be1[...], wqkv[...], bqkv[...],
                 wo[...], bo[...], g2[...], be2[...], w1[...], b1[...],
                 w2[...], b2[...], head_masks, dtype)
        dot3, bdot, cdot = c["dot3"], c["bdot"], c["cdot"]

        def rsum(t32):
            """(F, T, M) fp32 -> (1, M) row-sum (sequential single-axis
            reductions — multi-axis reduce is safer split for Mosaic)."""
            return jnp.sum(jnp.sum(t32, axis=0), axis=0).reshape(1, -1)

        g = dy_ref[...].astype(jnp.float32)  # (F, T, W)
        zeros = lambda a, b: jnp.zeros((a, b), jnp.float32)
        FF = w1.shape[-1]

        if "no_mlp" in ablate:
            dw1, db1g = zeros(W, FF), zeros(1, FF)
            dw2, db2g = zeros(FF, W), zeros(1, W)
            dg2, dbe2 = zeros(1, W), zeros(1, W)
            dx2 = g
        else:
            dhg = dot3(g.astype(dtype), jnp.transpose(w2[...]))  # (F,T,FF) fp32
            dw2 = cdot(c["hg"], g.astype(dtype))
            db2g = rsum(g)
            if "relu_gelu" in ablate:
                dz = dhg * (c["z"] > 0.0).astype(jnp.float32)
            elif gelu == "poly":
                dz = dhg * _gelu_poly_grad(c["z"])
            elif gelu == "bf16":
                # storage-dtype passes (c["z"]/c["cdf"] are bf16 here);
                # the row-sum below still accumulates in fp32 via an
                # astype pass — unlike the stacked path's ones-row MXU
                # dot. Acceptable: headloop is a measured-refutation
                # layout kept for the record, not a perf path.
                dz = dhg.astype(dtype) * _gelu_quick_grad(c["z"], c["cdf"])
            elif gelu == "quick":
                dz = dhg * _gelu_quick_grad(c["z"], c["cdf"])
            else:
                dz = dhg * _gelu_grad(c["z"], c["cdf"])
            dzc = dz.astype(dtype)
            dw1 = cdot(c["n2"], dzc)
            db1g = rsum(dz.astype(jnp.float32))
            dn2 = dot3(dzc, jnp.transpose(w1[...]))  # (F,T,W) fp32
            dg2 = rsum(dn2 * c["xh2"])
            dbe2 = rsum(dn2)
            dx2 = g + _ln_bwd(dn2, c["xh2"], c["r2"], g2[...])

        if "no_attn" in ablate:
            dwqkv, dbqkv = zeros(W, 3 * W), zeros(1, 3 * W)
            dwo, dbo = zeros(W, W), zeros(1, W)
            dg1, dbe1 = zeros(1, W), zeros(1, W)
            dx = dx2
        else:
            da = dx2.astype(dtype)
            dwo = cdot(c["om32"].astype(dtype), da)
            dbo = rsum(dx2)
            dom = dot3(da, jnp.transpose(wo[...])).astype(dtype)  # (F,T,W)
            dq3 = dk3 = dv3 = None
            for h in range(H):
                p = c["ps"][h]
                doh = dom * head_masks[h].astype(dtype)  # (F,T,W)
                dp = bdot(doh, c["v3"], 2, 2)  # (F,T,T) fp32
                # doh is lane-masked, so dv's per-head terms land in their
                # own lanes; sum over heads accumulates the full dv
                dvh = bdot(p.astype(dtype), doh, 1, 1)  # (F,T,W) fp32
                if "no_softmax" in ablate:
                    ds = dp * np.float32(1e-2)
                else:
                    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                ds = (ds * c["scale"]).astype(dtype)
                # k was the masked operand -> dq lands in h's lanes directly
                dqh = bdot(ds, c["khs"][h], 2, 1)  # (F,T,W) fp32
                # q was unmasked -> mask dk back to h's lanes
                dkh = bdot(ds, c["q3"], 1, 1) * head_masks[h].astype(jnp.float32)
                dq3 = dqh if dq3 is None else dq3 + dqh
                dk3 = dkh if dk3 is None else dk3 + dkh
                dv3 = dvh if dv3 is None else dv3 + dvh
            dqkv = jnp.concatenate(
                [dq3.astype(dtype), dk3.astype(dtype), dv3.astype(dtype)],
                axis=2)  # (F, T, 3W)
            dwqkv = cdot(c["n1"], dqkv)
            dbqkv = rsum(dqkv.astype(jnp.float32))
            dn1 = dot3(dqkv, jnp.transpose(wqkv[...]))  # fp32
            dg1 = rsum(dn1 * c["xh1"])
            dbe1 = rsum(dn1)
            dx = dx2 + _ln_bwd(dn1, c["xh1"], c["r1"], g1[...])

        dx_ref[...] = dx.astype(dtype)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for ref in (dg1_ref, dbe1_ref, dwqkv_ref, dbqkv_ref, dwo_ref,
                        dbo_ref, dg2_ref, dbe2_ref, dw1_ref, db1_ref,
                        dw2_ref, db2_ref):
                ref[...] = jnp.zeros_like(ref)

        dg1_ref[...] += dg1
        dbe1_ref[...] += dbe1
        dwqkv_ref[...] += dwqkv
        dbqkv_ref[...] += dbqkv
        dwo_ref[...] += dwo
        dbo_ref[...] += dbo
        dg2_ref[...] += dg2
        dbe2_ref[...] += dbe2
        dw1_ref[...] += dw1
        db1_ref[...] += db1g
        dw2_ref[...] += dw2
        db2_ref[...] += db2g

    return kernel


def _masks(num_heads, T, W, dtype):
    """Per-head lane masks (1, 1, W). No score mask is needed: the
    (F, HT, T) layout never materializes cross-head score entries."""
    D = W // num_heads
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) // D
    return [(lane == h).astype(dtype).reshape(1, 1, W)
            for h in range(num_heads)]


def _mask4(num_heads, W, dtype):
    """All heads' lane masks as ONE (1, H, 1, W) tensor, for the aligned-T
    rank-4 stack/merge paths (used when T is a sublane-tile multiple, so
    the (F, HT, W) <-> (F, H, T, W) reshapes are free tile remaps)."""
    D = W // num_heads
    lane = jax.lax.broadcasted_iota(jnp.int32, (num_heads, W), 1) // D
    head = jax.lax.broadcasted_iota(jnp.int32, (num_heads, W), 0)
    return (lane == head).astype(dtype).reshape(1, num_heads, 1, W)


def _make_fwd_kernel(num_heads, F, T, ablate=frozenset(), gelu="exact"):
    core = _block_core(num_heads, ablate, gelu)

    def kernel(x_ref, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1, b1, w2, b2,
               y_ref):
        dtype = x_ref.dtype
        W = x_ref.shape[-1]
        head_masks = _masks(num_heads, T, W, dtype)
        x2d = x_ref[...].reshape(F * T, W)
        c = core(x2d, F, T, g1[...], be1[...], wqkv[...], bqkv[...], wo[...],
                 bo[...], g2[...], be2[...], w1[...], b1[...], w2[...],
                 b2[...], head_masks, dtype)
        y_ref[...] = c["y32"].astype(dtype).reshape(F, T, W)

    return kernel


def _make_bwd_kernel(num_heads, F, T, ablate=frozenset(), gelu="exact"):
    core = _block_core(num_heads, ablate, gelu)

    def kernel(x_ref, dy_ref, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1, b1,
               w2, b2, dx_ref, dg1_ref, dbe1_ref, dwqkv_ref, dbqkv_ref,
               dwo_ref, dbo_ref, dg2_ref, dbe2_ref, dw1_ref, db1_ref,
               dw2_ref, db2_ref):
        dtype = x_ref.dtype
        W = x_ref.shape[-1]
        head_masks = _masks(num_heads, T, W, dtype)
        x2d = x_ref[...].reshape(F * T, W)
        c = core(x2d, F, T, g1[...], be1[...], wqkv[...], bqkv[...], wo[...],
                 bo[...], g2[...], be2[...], w1[...], b1[...], w2[...],
                 b2[...], head_masks, dtype)
        dot, bdot = c["dot"], c["bdot"]
        head_stack, merge_heads = c["head_stack"], c["merge_heads"]

        def tdot(a, b):
            """a^T @ b with contraction over rows (fp32 result)."""
            return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        g = dy_ref[...].reshape(F * T, W).astype(jnp.float32)
        zeros = lambda a, b: jnp.zeros((a, b), jnp.float32)
        FF = w1.shape[-1]

        if "no_mlp" in ablate:
            dw1, db1 = zeros(W, FF), zeros(1, FF)
            dw2, db2 = zeros(FF, W), zeros(1, W)
            dg2, dbe2 = zeros(1, W), zeros(1, W)
            dx2 = g
        else:
            # ---- MLP backward ----
            dhg = dot(g.astype(dtype), jnp.transpose(w2[...]))  # (FT, FF) fp32
            dw2 = tdot(c["hg"], g.astype(dtype))
            db2 = jnp.sum(g, axis=0, keepdims=True)  # (1, W)
            if "relu_gelu" in ablate:
                dz = dhg * (c["z"] > 0.0).astype(jnp.float32)
            elif gelu == "poly":
                dz = dhg * _gelu_poly_grad(c["z"])  # fp32
            elif gelu == "bf16":
                # storage-dtype passes (c["z"]/c["cdf"] are bf16 here)
                dz = dhg.astype(dtype) * _gelu_quick_grad(c["z"], c["cdf"])
            elif gelu == "quick":
                dz = dhg * _gelu_quick_grad(c["z"], c["cdf"])
            else:
                dz = dhg * _gelu_grad(c["z"], c["cdf"])  # fp32
            dzc = dz.astype(dtype)
            dw1 = tdot(c["n2"], dzc)
            if gelu == "bf16":
                # bf16 row-accumulation over FT rows is lossy; a ones-row
                # MXU dot accumulates in fp32 without an fp32 VPU pass
                db1 = dot(jnp.ones((1, dzc.shape[0]), dtype), dzc)
            else:
                db1 = jnp.sum(dz, axis=0, keepdims=True)  # (1, FF)
            dn2 = dot(dzc, jnp.transpose(w1[...]))  # (FT, W) fp32

            # ---- LN2 backward (input x2) ----
            dg2 = jnp.sum(dn2 * c["xh2"], axis=0, keepdims=True)
            dbe2 = jnp.sum(dn2, axis=0, keepdims=True)
            dx2 = g + _ln_bwd(dn2, c["xh2"], c["r2"], g2[...])

        if "no_attn" in ablate:
            dwqkv, dbqkv = zeros(W, 3 * W), zeros(1, 3 * W)
            dwo, dbo = zeros(W, W), zeros(1, W)
            dg1, dbe1 = zeros(1, W), zeros(1, W)
            dx = dx2
        else:
            # ---- attention output projection ----
            da = dx2.astype(dtype)
            dwo = tdot(c["om"], da)
            dbo = jnp.sum(dx2, axis=0, keepdims=True)
            dom = dot(da, jnp.transpose(wo[...])).astype(dtype)  # (FT, W)

            # ---- attention core backward ((F, HT, T) score layout) ----
            # the merge masked each o3 head block, so its cotangent is the
            # lane-masked stack of dom
            do3 = head_stack(dom)  # (F, HT, W)
            dp = bdot(do3, c["v3"], 2, 2)  # (F, HT, T) fp32
            # dv comes out as a SINGLE copy: contracting p and do3 over the
            # stacked-row axis sums the per-head terms, each already in its
            # own lanes through do3's mask
            dv3 = bdot(c["p"].astype(dtype), do3, 1, 1)  # (F, T, W) fp32
            if "no_softmax" in ablate:
                ds = dp * np.float32(1e-2)
            else:
                ds = c["p"] * (dp - jnp.sum(dp * c["p"], axis=-1,
                                            keepdims=True))
            ds = (ds * c["scale"]).astype(dtype)
            dqs = bdot(ds, c["k3"], 2, 1)  # (F, HT, W) fp32
            # dk is likewise direct: qs carries the lane mask, so the
            # HT-contraction lands every head's term in its own lanes
            dk3 = bdot(ds, c["qs"], 1, 1)  # (F, T, W) fp32
            dq = merge_heads(dqs.astype(dtype))  # k3 was unmasked -> mask
            dk = dk3.astype(dtype).reshape(F * T, W)
            dv = dv3.astype(dtype).reshape(F * T, W)
            dqkv = jnp.concatenate([dq, dk, dv], axis=1)  # (FT, 3W)
            dwqkv = tdot(c["n1"], dqkv.astype(dtype))
            dbqkv = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
            dn1 = dot(dqkv.astype(dtype), jnp.transpose(wqkv[...]))  # fp32

            # ---- LN1 backward (input x) ----
            dg1 = jnp.sum(dn1 * c["xh1"], axis=0, keepdims=True)
            dbe1 = jnp.sum(dn1, axis=0, keepdims=True)
            dx = dx2 + _ln_bwd(dn1, c["xh1"], c["r1"], g1[...])

        dx_ref[...] = dx.astype(dtype).reshape(F, T, W)

        # ---- weight-grad accumulation across the sequential grid ----
        @pl.when(pl.program_id(0) == 0)
        def _init():
            for ref in (dg1_ref, dbe1_ref, dwqkv_ref, dbqkv_ref, dwo_ref,
                        dbo_ref, dg2_ref, dbe2_ref, dw1_ref, db1_ref,
                        dw2_ref, db2_ref):
                ref[...] = jnp.zeros_like(ref)

        dg1_ref[...] += dg1
        dbe1_ref[...] += dbe1
        dwqkv_ref[...] += dwqkv
        dbqkv_ref[...] += dbqkv
        dwo_ref[...] += dwo
        dbo_ref[...] += dbo
        dg2_ref[...] += dg2
        dbe2_ref[...] += dbe2
        dw1_ref[...] += dw1
        db1_ref[...] += db1
        dw2_ref[...] += dw2
        db2_ref[...] += db2

    return kernel


@lru_cache(maxsize=None)
def make_vit_block_fn(num_heads: int, block_frames: int = 8,
                      interpret: bool | None = None,
                      ablate: tuple = (), gelu: str = "exact",
                      layout: str = "stacked"):
    """Build the custom-VJP fused block fn for a head count / frame block.

    Returned fn: ``(x, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1, b1, w2, b2)
    -> y`` with x (N, T, W); N must be divisible by the (auto-shrunk) frame
    block. All weight args differentiable. ``interpret=None`` resolves per
    call: Mosaic on TPU, interpret mode on CPU (tests / dryrun).
    ``ablate`` is the microbench-only attribution knob (see _block_core);
    production callers leave it empty. ``layout`` selects the attention
    formulation — "stacked" ((F, HT, T) head-stacked scores) or
    "headloop" (rank-3 per-head dots, no stack/merge copies or (FT, W)
    reshapes); both are numerically identical.
    """
    ablate = frozenset(ablate)
    if layout not in ("stacked", "headloop"):
        raise ValueError(f"unknown fused-block layout {layout!r}")
    fwd_factory = (_make_headloop_fwd_kernel if layout == "headloop"
                   else _make_fwd_kernel)
    bwd_factory = (_make_headloop_bwd_kernel if layout == "headloop"
                   else _make_bwd_kernel)

    def _interp() -> bool:
        return (jax.default_backend() == "cpu") if interpret is None else interpret

    def _grid(n):
        f = min(block_frames, n)
        while n % f:
            f -= 1
        return f, n // f

    def _fwd_impl(x, *w):
        n, T, W = x.shape
        F, nb = _grid(n)
        return pl.pallas_call(
            fwd_factory(num_heads, F, T, ablate, gelu),
            grid=(nb,),
            in_specs=[pl.BlockSpec((F, T, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
            out_specs=pl.BlockSpec((F, T, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, T, W), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=_interp(),
        )(x, *w)

    def _bwd_impl(x, dy, *w):
        n, T, W = x.shape
        FF = w[8].shape[-1]  # w1 (W, FF)
        F, nb = _grid(n)
        acc = lambda *shape: jax.ShapeDtypeStruct(shape, jnp.float32)
        grads = pl.pallas_call(
            bwd_factory(num_heads, F, T, ablate, gelu),
            grid=(nb,),
            in_specs=[pl.BlockSpec((F, T, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
            out_specs=[pl.BlockSpec((F, T, W), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((a, b), lambda i: (0, 0), memory_space=pltpu.VMEM)
               for a, b in ((1, W), (1, W), (W, 3 * W), (1, 3 * W), (W, W),
                            (1, W), (1, W), (1, W), (W, FF), (1, FF),
                            (FF, W), (1, W))],
            out_shape=[jax.ShapeDtypeStruct((n, T, W), x.dtype),
                       acc(1, W), acc(1, W), acc(W, 3 * W), acc(1, 3 * W),
                       acc(W, W), acc(1, W), acc(1, W), acc(1, W),
                       acc(W, FF), acc(1, FF), acc(FF, W), acc(1, W)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=_interp(),
        )(x, dy, *w)
        return grads

    @jax.custom_vjp
    def block(x, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1, b1, w2, b2):
        return _fwd_impl(x, g1, be1, wqkv, bqkv, wo, bo, g2, be2,
                         w1, b1, w2, b2)

    def fwd(x, *w):
        return _fwd_impl(x, *w), (x, w)

    def bwd(res, dy):
        x, w = res
        out = _bwd_impl(x, dy, *w)
        dx = out[0]
        (dg1, dbe1, dwqkv, dbqkv, dwo, dbo, dg2, dbe2, dw1, db1, dw2,
         db2) = out[1:]
        squeeze = lambda t: t.reshape(t.shape[-1])
        return (dx, squeeze(dg1), squeeze(dbe1), dwqkv, squeeze(dbqkv), dwo,
                squeeze(dbo), squeeze(dg2), squeeze(dbe2), dw1, squeeze(db1),
                dw2, squeeze(db2))

    block.defvjp(fwd, bwd)
    return block
