"""Fused multi-head attention as a Pallas TPU kernel.

One program per (batch*head) computes softmax(q k^T / sqrt(d)) v entirely in
VMEM: the (T, T) score tile never round-trips through HBM and the softmax
fuses with both matmuls. For this model family's sequence lengths (10-token
chunks, ~100-token contexts, <=256 ViT patches) a single tile per program
covers the whole sequence; longer sequences stream over k-blocks with the
standard flash running-max/denominator recursion.

Numerical semantics are identical to ``models.attention.xla_attention``
(fp32 scores/softmax regardless of input dtype) — the parity test runs the
kernel in interpreter mode on CPU against the XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# A single fused tile handles sequences up to this length; beyond it the
# streaming variant kicks in.
_MAX_SINGLE_TILE_T = 1024
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, scale: float):
    """Whole-sequence fused attention for one (batch, head)."""
    q = q_ref[0].astype(jnp.float32)  # (Tq_pad, D_pad)
    k = k_ref[0].astype(jnp.float32)  # (Tk_pad, D_pad)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Tq_pad, Tk_pad)

    # Mask out the zero-padded kv columns before the softmax.
    col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col_ids < kv_len, s, -jnp.inf)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / denom
    o_ref[0] = o.astype(o_ref.dtype)


def _attn_kernel_streamed(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, scale: float,
                          block_k: int):
    """Flash-style streaming over k blocks (running max / denominator)."""
    q = q_ref[0].astype(jnp.float32)  # (Tq_pad, D_pad)
    tq, d = q.shape
    num_blocks = k_ref.shape[1] // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col_ids < kv_len, s, -jnp.inf)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc = jnp.zeros((tq, d), dtype=jnp.float32)
    m0 = jnp.full((tq, 1), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((tq, 1), dtype=jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_blocks, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                     kv_len: int, scale: float):
    """Backward for one (batch, head): recomputes the softmax in VMEM from
    (q, k, v) — no residuals beyond the forward inputs are saved — then the
    standard flash gradient: ds = p*(do v^T - rowsum(do*o))*scale."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    def dot(a, b, ca=1, cb=0):
        return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    s = dot(q, k, 1, 1) * scale
    col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col_ids < kv_len, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    pn = p / jnp.sum(p, axis=-1, keepdims=True)  # (Tq, Tk)
    o = dot(pn, v)  # (Tq, D)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (Tq, 1)
    dp = dot(do, v, 1, 1)  # (Tq, Tk)
    ds = pn * (dp - delta) * scale
    dq_ref[0] = dot(ds, k).astype(dq_ref.dtype)
    dk_ref[0] = dot(ds, q, 0, 0).astype(dk_ref.dtype)
    dv_ref[0] = dot(pn, do, 0, 0).astype(dv_ref.dtype)


def _attn_bwd_kernel_streamed(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                              dv_ref, *, kv_len: int, scale: float,
                              block_k: int):
    """Streaming backward: pass 1 recomputes (m, l, o) over kv blocks,
    pass 2 emits per-block dk/dv and accumulates dq."""
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    tq, d = q.shape
    num_blocks = k_ref.shape[1] // block_k

    def dot(a, b, ca=1, cb=0):
        return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def pass1(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = dot(q, k_blk, 1, 1) * scale
        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col_ids < kv_len, s, -jnp.inf)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + dot(p, v_blk)
        return acc, m_new, l_new

    acc0 = jnp.zeros((tq, d), jnp.float32)
    m0 = jnp.full((tq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_blocks, pass1, (acc0, m0, l0))
    o = acc / l
    delta = jnp.sum(do * o, axis=-1, keepdims=True)

    def pass2(i, dq_acc):
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = dot(q, k_blk, 1, 1) * scale
        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col_ids < kv_len, s, -jnp.inf)
        pn = jnp.exp(s - m) / l
        dp = dot(do, v_blk, 1, 1)
        ds = pn * (dp - delta) * scale
        dk_ref[0, pl.ds(i * block_k, block_k), :] = dot(ds, q, 0, 0).astype(dk_ref.dtype)
        dv_ref[0, pl.ds(i * block_k, block_k), :] = dot(pn, do, 0, 0).astype(dv_ref.dtype)
        return dq_acc + dot(ds, k_blk)

    dq = jax.lax.fori_loop(0, num_blocks, pass2, jnp.zeros((tq, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
    block_k: int = 512,
) -> jnp.ndarray:
    """Fused attention over (B, T, H, D) tensors (same contract as
    ``xla_attention``), differentiable: the custom-VJP backward is a
    second Pallas kernel that recomputes the softmax in VMEM (saving only
    q/k/v), so training never materializes (T, T) score tensors in HBM.
    Pads T and D to TPU tile boundaries outside the kernel; padded kv
    columns are masked inside."""
    return _flash_attention_fwd_impl(q, k, v, interpret, block_k)


@functools.partial(jax.jit, static_argnames=("interpret", "block_k"))
def _flash_attention_fwd_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
    block_k: int = 512,
) -> jnp.ndarray:
    b, tq, h, d = q.shape
    tk = k.shape[1]
    dtype = q.dtype
    scale = 1.0 / math.sqrt(d)

    # (B, T, H, D) -> (B*H, T, D)
    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf = fold(q), fold(k), fold(v)

    sub = 8 if dtype == jnp.float32 else 16
    tq_p = _round_up(max(tq, sub), sub)
    d_p = _round_up(d, _LANE)

    streaming = tk > _MAX_SINGLE_TILE_T
    if streaming:
        tk_p = _round_up(max(tk, sub), block_k)
    else:
        tk_p = _round_up(max(tk, sub), sub)

    qf = jnp.pad(qf, ((0, 0), (0, tq_p - tq), (0, d_p - d)))
    kf = jnp.pad(kf, ((0, 0), (0, tk_p - tk), (0, d_p - d)))
    vf = jnp.pad(vf, ((0, 0), (0, tk_p - tk), (0, d_p - d)))

    if streaming:
        kernel = functools.partial(
            _attn_kernel_streamed, kv_len=tk, scale=scale, block_k=block_k
        )
    else:
        kernel = functools.partial(_attn_kernel, kv_len=tk, scale=scale)

    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, tq_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d_p), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (b * h) * tq * tk * d,
            bytes_accessed=(b * h) * (tq + 2 * tk) * d * q.dtype.itemsize,
            transcendentals=(b * h) * tq * tk,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    # (B*H, Tq_pad, D_pad) -> (B, Tq, H, D)
    out = out[:, :tq, :d].reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    return out


@functools.partial(jax.jit, static_argnames=("interpret", "block_k"))
def _flash_attention_bwd_impl(q, k, v, do, interpret: bool = False,
                              block_k: int = 512):
    b, tq, h, d = q.shape
    tk = k.shape[1]
    dtype = q.dtype
    scale = 1.0 / math.sqrt(d)

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf, dof = fold(q), fold(k), fold(v), fold(do)
    sub = 8 if dtype == jnp.float32 else 16
    tq_p = _round_up(max(tq, sub), sub)
    d_p = _round_up(d, _LANE)
    streaming = tk > _MAX_SINGLE_TILE_T
    tk_p = _round_up(max(tk, sub), block_k if streaming else sub)

    qf = jnp.pad(qf, ((0, 0), (0, tq_p - tq), (0, d_p - d)))
    kf = jnp.pad(kf, ((0, 0), (0, tk_p - tk), (0, d_p - d)))
    vf = jnp.pad(vf, ((0, 0), (0, tk_p - tk), (0, d_p - d)))
    dof = jnp.pad(dof, ((0, 0), (0, tq_p - tq), (0, d_p - d)))

    if streaming:
        kernel = functools.partial(_attn_bwd_kernel_streamed, kv_len=tk,
                                   scale=scale, block_k=block_k)
    else:
        kernel = functools.partial(_attn_bwd_kernel, kv_len=tk, scale=scale)

    spec_q = pl.BlockSpec((1, tq_p, d_p), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, tk_p, d_p), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[spec_q, spec_k, spec_k, spec_q],
        out_specs=[spec_q, spec_k, spec_k],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tq_p, d_p), dtype),
            jax.ShapeDtypeStruct((b * h, tk_p, d_p), dtype),
            jax.ShapeDtypeStruct((b * h, tk_p, d_p), dtype),
        ],
        interpret=interpret,
    )(qf, kf, vf, dof)

    def unfold(x, t):
        return x[:, :t, :d].reshape(b, h, t, d).transpose(0, 2, 1, 3)

    return unfold(dq, tq), unfold(dk, tk), unfold(dv, tk)


def _flash_fwd(q, k, v, interpret, block_k):
    return _flash_attention_fwd_impl(q, k, v, interpret, block_k), (q, k, v)


def _flash_bwd(interpret, block_k, res, do):
    q, k, v = res
    return _flash_attention_bwd_impl(q, k, v, do, interpret, block_k)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_auto(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Shape-aware dispatch.

    The fused kernel pays off when each (batch, head) program has real work —
    long sequences whose (T, T) score tile would otherwise spill to HBM. For
    this model family's short contexts (~10-200 tokens, head_dim 32) XLA's
    batched-matmul attention is faster (measured 4x on v5e at batch 256), so
    short shapes route to XLA and long ones to Pallas.
    """
    long_seq = q.shape[1] * k.shape[1] >= 256 * 256
    if jax.default_backend() == "tpu" and long_seq:
        return flash_attention(q, k, v)
    from soccerdiffusion_tpu.models.attention import xla_attention

    return xla_attention(q, k, v)
