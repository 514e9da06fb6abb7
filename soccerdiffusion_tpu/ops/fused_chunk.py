"""Whole-action-chunk fused sampler: ALL DDIM steps of the 4-layer
cross-attending decoder as ONE Pallas program per robot block.

Why: the sampler's per-step tensors are small (10x301 attention rows,
E=128), so the XLA path spends its time moving weights and context through
HBM once per denoising step and leaving the MXU idle between many tiny
fusions. This kernel makes the WHOLE chunk one op: a ``fori_loop`` over
denoising steps runs inside the kernel, weights and context stay resident
in VMEM across all 30 steps, and per-step step-token K/V + DDIM
coefficients come from in-kernel tables. The win is fusion/VMEM-residency,
NOT op-dispatch elimination — a controlled chain test showed no measurable
per-op overhead inside a compiled program (docs/perf_notes.md "Consequence:
round 1's ~0.1-0.2 ms per-XLA-op note was a misattribution"); the kernel's
measured value stands on the carry-fed bench ladder (perf_notes round-2/3
chunk sweeps).

Design against the measured floors:
  * Per-robot attention matmuls (10x301, head_dim 32) are LATENCY-bound on
    the MXU (~50-60 cycles per batched sub-matmul), so all 4 heads ride in
    ONE batched dot per attention: queries/keys/values are lane-masked per
    head and row-stacked into (R, 4P, E) — contraction over the full E=128
    with zeroed other-head lanes computes exact per-head scores, 4x fewer
    sub-matmuls, no block-diagonal FLOP waste, exact-width softmax rows.
  * Context K/V are projected IN-KERNEL once per chunk into VMEM scratch,
    removing the per-chunk XLA packing/precompute passes over HBM.
  * The step-token column is folded into the cross softmax via joint
    normalization (sampling uses one timestep for the whole batch,
    reference ros.py:301-310).

Numerics match the XLA path (``DiffusionPolicy.denoise_with_kv`` iterated by
``ddim_sample``) to bf16 tolerance; see tests/test_fused_chunk.py.
Reference semantics: 30-step DDIM loop ros.py:301-310; eta=0 update and
leading-spacing timesteps as in diffusion/ddim.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from soccerdiffusion_tpu.ops.fused_denoise import FusedDenoiser, _gelu_exact, _layer_norm


def _make_chunk_kernel(num_layers: int, num_heads: int, head_dim: int,
                       pred_len: int, hidden: int, num_joints: int,
                       num_steps: int, block_robots: int, seq: int,
                       group_robots: int = 1, cross_orientation: str = "kstat",
                       kv_quant: str = "none",
                       ablate: frozenset = frozenset()):
    """Build the chunk kernel. ``ablate`` is a microbenchmark-only hook
    (benchmarks/microbench_chunk_ablate.py) that drops named sub-blocks
    ({"self", "cross", "mlp", "ln", "self_dots", "softmax", "headmask",
    "merge"}) to attribute kernel time; production callers leave it
    empty."""
    L, H, D, P, E, T, R, S = (num_layers, num_heads, head_dim, pred_len,
                              hidden, num_steps, block_robots, seq)
    HP = H * P
    G = group_robots  # robots packed into one flat block-diagonal attention
    NG = R // G
    QSTAT = G == 1 and cross_orientation == "qstat"
    # int8 context K/V: quantize the per-chunk context K/V scratch with one
    # fp32 scale per (layer, tensor) — scalar scales keep every broadcast
    # Mosaic-legal (no size-1 sublane broadcasts) and let the score/value
    # contractions run as int8 x int8 MXU dots, halving the per-robot
    # stationary-operand transit that the round-2 ablation identified as
    # the cross-attention floor (docs/perf_notes.md).
    QUANT = kv_quant == "int8"
    if QUANT and (QSTAT or G != 1):
        raise ValueError("kv_quant='int8' supports the default kstat, "
                         "group_robots=1 orientation only")
    # qstat scratch rows: S context rows + all T step-token rows (written
    # once at chunk init; a per-step mask selects row S+t)
    SK = S + T if QSTAT else S

    def kernel(
        noise_ref,     # (R, P, J)
        ctx_ref,       # (R, S, E) this block's context tokens
        stk_ref,       # (T, L, E) per-step step-token cross K rows
        stv_ref,       # (T, L, E) per-step step-token cross V rows
        coef_ref,      # (T, 5) SMEM fp32 solver coefficients [A,B,C,P,Q]
        pe_ref,        # (P, E)
        emb_w_ref, emb_b_ref,          # (J, E), (1, E)
        qkv_w_ref, qkv_b_ref,          # (L, E, 3E), (L, 3E)
        so_w_ref, so_b_ref,            # (L, E, E), (L, E)
        cq_w_ref, cq_b_ref,            # (L, E, E), (L, E)
        ck_w_ref, ck_b_ref,            # (L, E, E), (L, E)
        cv_w_ref, cv_b_ref,            # (L, E, E), (L, E)
        co_w_ref, co_b_ref,            # (L, E, E), (L, E)
        mlp1_w_ref, mlp1_b_ref,        # (L, E, E), (L, E)
        mlp2_w_ref, mlp2_b_ref,        # (L, E, E), (L, E)
        ln_s_ref, ln_b_ref,            # (L, 3, E)
        fc_w_ref, fc_b_ref,            # (E, J), (1, J)
        out_ref,       # (R, P, J)
        ctx_k_scr,     # scratch (L, R, S, E) context K
        ctx_v_scr,     # scratch (L, R, S, E) context V
    ):
        compute_dtype = ctx_ref.dtype

        def at(x, i):
            return jax.lax.index_in_dim(x, i, axis=0, keepdims=False)

        def dot(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def bdot(a, b, contract_a, contract_b):
            """Batched over the leading robot dim."""
            return jax.lax.dot_general(
                a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        def bdot_i32(a, b, contract_a, contract_b):
            """int8 x int8 -> int32 batched dot (MXU int8 path)."""
            return jax.lax.dot_general(
                a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )

        # ---- once per chunk: project context K/V into scratch ----
        ctx2d = ctx_ref[...].reshape(R * S, E)
        ck_w_all, ck_b_all = ck_w_ref[...], ck_b_ref[...]
        cv_w_all, cv_b_all = cv_w_ref[...], cv_b_ref[...]
        # per-(layer, tensor) fp32 quantization scales, captured as
        # loop-invariant values by the step body (L-loop is Python-unrolled)
        k_scales, v_scales = [], []
        for l in range(L):
            k_l = dot(ctx2d, at(ck_w_all, l)) + at(ck_b_all, l)
            v_l = dot(ctx2d, at(cv_w_all, l)) + at(cv_b_all, l)
            if QUANT:
                sk = jnp.maximum(jnp.max(jnp.abs(k_l)) / 127.0, 1e-8)
                sv = jnp.maximum(jnp.max(jnp.abs(v_l)) / 127.0, 1e-8)
                k_scales.append(sk)
                v_scales.append(sv)
                ctx_k_scr[l] = jnp.clip(jnp.round(k_l / sk), -127.0, 127.0
                                        ).astype(jnp.int8).reshape(R, S, E)
                ctx_v_scr[l] = jnp.clip(jnp.round(v_l / sv), -127.0, 127.0
                                        ).astype(jnp.int8).reshape(R, S, E)
                continue
            if QSTAT:
                ctx_k_scr[l, :, pl.ds(0, S), :] = (
                    k_l.reshape(R, S, E).astype(compute_dtype))
                ctx_v_scr[l, :, pl.ds(0, S), :] = (
                    v_l.reshape(R, S, E).astype(compute_dtype))
                # all T step-token K/V rows, shared across robots
                stk_l_rows = jax.lax.index_in_dim(
                    stk_ref[...], l, axis=1, keepdims=False)  # (T, E)
                stv_l_rows = jax.lax.index_in_dim(
                    stv_ref[...], l, axis=1, keepdims=False)
                ctx_k_scr[l, :, pl.ds(S, T), :] = jnp.broadcast_to(
                    stk_l_rows.astype(compute_dtype)[None], (R, T, E))
                ctx_v_scr[l, :, pl.ds(S, T), :] = jnp.broadcast_to(
                    stv_l_rows.astype(compute_dtype)[None], (R, T, E))
            else:
                ctx_k_scr[l] = k_l.reshape(R, S, E).astype(compute_dtype)
                ctx_v_scr[l] = v_l.reshape(R, S, E).astype(compute_dtype)

        # ---- per-head lane masks (1, 1, E) and the self-attn head-block mask
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, E), 1) // D  # (1, E)
        head_masks = [
            (lane == hh).astype(compute_dtype).reshape(1, 1, E) for hh in range(H)
        ]
        if G == 1:
            hrow = jax.lax.broadcasted_iota(jnp.int32, (HP, HP), 0) // P
            hcol = jax.lax.broadcasted_iota(jnp.int32, (HP, HP), 1) // P
            self_mask = jnp.where(hrow == hcol, 0.0, -1e9).astype(jnp.float32)[None]
        else:
            # Flat block-diagonal masks for the G-robot groups. Self scores
            # are (G*HP, G*HP): a row may attend a column only when it is the
            # same robot (idx // HP) AND the same head ((idx % HP) // P).
            srow = jax.lax.broadcasted_iota(jnp.int32, (G * HP, G * HP), 0)
            scol = jax.lax.broadcasted_iota(jnp.int32, (G * HP, G * HP), 1)
            same_robot = (srow // HP) == (scol // HP)
            same_head = ((srow % HP) // P) == ((scol % HP) // P)
            self_mask_g = jnp.where(same_robot & same_head, 0.0,
                                    -1e9).astype(jnp.float32)
            # Cross scores are (G*HP, G*S): rows grouped by robot blocks of
            # HP, columns by robot blocks of S.
            xrow = jax.lax.broadcasted_iota(jnp.int32, (G * HP, G * S), 0)
            xcol = jax.lax.broadcasted_iota(jnp.int32, (G * HP, G * S), 1)
            cross_mask_g = jnp.where((xrow // HP) == (xcol // S), 0.0,
                                     -1e9).astype(jnp.float32)

        def head_stack(x2d):
            """(R*P, E) -> (R, H*P, E): row block h holds head-h-masked rows."""
            x3 = x2d.reshape(R, P, E)
            if "headmask" in ablate:  # timing-only: copies without the masks
                return jnp.concatenate([x3] * H, axis=1)
            return jnp.concatenate([x3 * m for m in head_masks], axis=1)

        def merge_heads(o):
            """(R, H*P, E) per-head blocks (other-head lanes garbage) ->
            (R*P, E) by masked sum."""
            if "merge" in ablate:  # timing-only: one slice, no mask/sum
                return jax.lax.slice_in_dim(o, 0, P, axis=1).reshape(R * P, E)
            total = None
            for hh in range(H):
                part = jax.lax.slice_in_dim(o, hh * P, (hh + 1) * P, axis=1)
                part = part * head_masks[hh].astype(part.dtype)
                total = part if total is None else total + part
            return total.reshape(R * P, E)

        pe_rows = jnp.concatenate([pe_ref[...].astype(compute_dtype)] * R, axis=0)

        emb_w, emb_b = emb_w_ref[...], emb_b_ref[...]
        fc_w, fc_b = fc_w_ref[...], fc_b_ref[...]
        qkv_w_all, qkv_b_all = qkv_w_ref[...], qkv_b_ref[...]
        so_w_all, so_b_all = so_w_ref[...], so_b_ref[...]
        cq_w_all, cq_b_all = cq_w_ref[...], cq_b_ref[...]
        co_w_all, co_b_all = co_w_ref[...], co_b_ref[...]
        m1_w_all, m1_b_all = mlp1_w_ref[...], mlp1_b_ref[...]
        m2_w_all, m2_b_all = mlp2_w_ref[...], mlp2_b_ref[...]
        ln_s_all, ln_b_all = ln_s_ref[...], ln_b_ref[...]

        scale = 1.0 / np.sqrt(D)

        def softmax_rows(s):
            if "softmax" in ablate:  # timing-only: linear stand-in
                return s * 1e-3
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            return p / jnp.sum(p, axis=-1, keepdims=True)

        def self_attention(qs, ks, vs):
            """(R, HP, E) head-stacked q/k/v -> (R, HP, E) attention output.

            G == 1: one batched dot per block (R sub-matmuls, each tiny and
            MXU-issue-bound). G > 1: G robots are flattened into one
            (G*HP, ...) block-diagonal dot — G x the FLOPs (still far below
            the MXU roofline at these shapes) for G x fewer issued ops.
            """
            if G == 1:
                if "self_dots" in ablate:  # timing-only
                    return qs.astype(jnp.float32)
                s = bdot(qs, ks, 2, 2) * scale + self_mask  # (R, HP, HP)
                p = softmax_rows(s)
                return bdot(p.astype(compute_dtype), vs, 2, 1)
            outs = []
            for g in range(NG):
                qg = jax.lax.slice_in_dim(qs, g * G, (g + 1) * G, axis=0)
                kg = jax.lax.slice_in_dim(ks, g * G, (g + 1) * G, axis=0)
                vg = jax.lax.slice_in_dim(vs, g * G, (g + 1) * G, axis=0)
                qg = qg.reshape(G * HP, E)
                kg = kg.reshape(G * HP, E)
                vg = vg.reshape(G * HP, E)
                s = jax.lax.dot_general(
                    qg, kg, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale + self_mask_g
                p = softmax_rows(s)
                o_g = dot(p.astype(compute_dtype), vg)  # (G*HP, E) fp32
                outs.append(o_g.astype(compute_dtype).reshape(G, HP, E))
            return jnp.concatenate(outs, axis=0)

        def cross_attention(qs2, k_ctx, v_ctx, stk_l, stv_l, maskadd=None,
                            sk_l=None, sv_l=None):
            """Cross-attend head-stacked queries (R, HP, E) to per-robot
            context K/V (R, S, E) with the shared step-token column folded
            into a joint softmax. Returns (R, HP, E) compute_dtype.

            When ``sk_l``/``sv_l`` are given, k_ctx/v_ctx are int8 with
            those per-tensor scales: queries are symmetrically quantized per
            call, the score dot runs int8 x int8 -> int32, probabilities are
            quantized to 1/127 granularity for the int8 value dot, and the
            fp32 step-token column + final normalization keep the softmax
            exact in fp32."""
            if QSTAT:
                # Transposed scores: (R, SK, HP). The big context K (with
                # all T step-token rows pre-written at rows S..S+T-1 and the
                # current step's row selected by maskadd) rides the MXU as
                # the STREAMING operand against one small stationary Q^T
                # tile, instead of loading 3 K tiles as stationary weights
                # per robot per (step, layer) — the measured bottleneck
                # (docs/perf_notes.md round 2). k_ctx/v_ctx: (R, SK, E).
                sT = bdot(k_ctx, qs2, 2, 2) * scale + maskadd[None]
                m = jnp.max(sT, axis=1, keepdims=True)  # (R, 1, HP)
                p = jnp.exp(sT - m)
                denom = jnp.sum(p, axis=1)  # (R, HP) fp32
                # o[hp, e] = sum_s p[s, hp] * v[s, e]: contraction over the
                # streamed S dim on both operands. Normalization divides the
                # fp32 output (as the kstat path does) instead of rounding
                # normalized probabilities to bf16 pre-contraction — the
                # latter produced measurable multi-step drift.
                o = jax.lax.dot_general(
                    p.astype(compute_dtype), v_ctx,
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (R, HP, E)
                return (o / denom[..., None]).astype(compute_dtype)
            if G == 1:
                if sk_l is not None:
                    q32 = qs2.astype(jnp.float32)
                    sq = jnp.maximum(jnp.max(jnp.abs(q32)) / 127.0, 1e-8)
                    q_q = jnp.clip(jnp.round(q32 / sq), -127.0, 127.0
                                   ).astype(jnp.int8)
                    s = (bdot_i32(q_q, k_ctx, 2, 2).astype(jnp.float32)
                         * (sq * sk_l * scale))  # (R, HP, S) fp32
                else:
                    s = bdot(qs2, k_ctx, 2, 2) * scale  # (R, HP, S) fp32
                s_x = jnp.sum(
                    qs2.astype(jnp.float32) * stk_l.astype(jnp.float32)[None],
                    axis=-1, keepdims=True,
                ) * scale  # (R, HP, 1)
                if "softmax" in ablate:  # timing-only
                    p, p_x = s * 1e-3, s_x * 1e-3
                    denom = 1.0
                else:
                    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_x)
                    p = jnp.exp(s - m)
                    p_x = jnp.exp(s_x - m)
                    denom = jnp.sum(p, axis=-1, keepdims=True) + p_x
                if sv_l is not None:
                    # p is in [0, 1]: fixed-point quantize at 1/127
                    p_q = jnp.round(p * 127.0).astype(jnp.int8)
                    o = (bdot_i32(p_q, v_ctx, 2, 1).astype(jnp.float32)
                         * (sv_l * (1.0 / 127.0)))
                else:
                    o = bdot(p.astype(compute_dtype), v_ctx, 2, 1)  # fp32
                o = o + p_x * stv_l.astype(jnp.float32)[None]
                return (o / denom).astype(compute_dtype)
            kf = k_ctx.reshape(R * S, E)
            vf = v_ctx.reshape(R * S, E)
            outs = []
            for g in range(NG):
                qg = jax.lax.slice_in_dim(qs2, g * G, (g + 1) * G, axis=0)
                qg = qg.reshape(G * HP, E)
                kg = jax.lax.slice_in_dim(kf, g * G * S, (g + 1) * G * S, axis=0)
                vg = jax.lax.slice_in_dim(vf, g * G * S, (g + 1) * G * S, axis=0)
                s = jax.lax.dot_general(
                    qg, kg, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale + cross_mask_g
                s_x = jnp.sum(
                    qg.astype(jnp.float32) * stk_l.astype(jnp.float32),
                    axis=-1, keepdims=True,
                ) * scale  # (G*HP, 1)
                m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_x)
                p = jnp.exp(s - m)
                p_x = jnp.exp(s_x - m)
                denom = jnp.sum(p, axis=-1, keepdims=True) + p_x
                o = dot(p.astype(compute_dtype), vg)  # (G*HP, E) fp32
                o = o + p_x * stv_l.astype(jnp.float32)
                o = (o / denom).astype(compute_dtype)
                outs.append(o.reshape(G, HP, E))
            return jnp.concatenate(outs, axis=0)

        def step_body(t, carry):
            # carry: (x, x0cache), both (R*P, J) float32 — x is the current
            # noisy chunk; x0cache is the previous step's x0_hat (used only
            # by the second-order dpmpp coefficients, C != 0)
            x, x0cache = carry
            if QSTAT:
                stk_t = stv_t = None
                # select context rows + this step's token row (S + t)
                row = jax.lax.broadcasted_iota(jnp.int32, (SK, HP), 0)
                maskadd = jnp.where((row < S) | (row == S + t), 0.0,
                                    -1e9).astype(jnp.float32)
            else:
                maskadd = None
                stk_t = stk_ref[pl.ds(t, 1)][0].astype(compute_dtype)  # (L, E)
                stv_t = stv_ref[pl.ds(t, 1)][0].astype(compute_dtype)  # (L, E)

            h = dot(x.astype(compute_dtype), emb_w)
            h = (h + emb_b).astype(compute_dtype) + pe_rows  # (RP, E)

            def maybe_ln(x, l, which):
                if "ln" in ablate:
                    return x.astype(compute_dtype)
                return _layer_norm(x, at(at(ln_s_all, l), which),
                                   at(at(ln_b_all, l), which)).astype(compute_dtype)

            for l in range(L):
                # ---- self-attention: all heads in one batched dot ----
                if "self" not in ablate:
                    n1 = maybe_ln(h, l, 0)
                    qkv = dot(n1, at(qkv_w_all, l))
                    qkv = (qkv + at(qkv_b_all, l)).astype(compute_dtype)  # (RP, 3E)
                    q = jax.lax.slice_in_dim(qkv, 0, E, axis=1)
                    k = jax.lax.slice_in_dim(qkv, E, 2 * E, axis=1)
                    v = jax.lax.slice_in_dim(qkv, 2 * E, 3 * E, axis=1)
                    qs, ks, vs = head_stack(q), head_stack(k), head_stack(v)
                    o = self_attention(qs, ks, vs)  # (R, HP, E)
                    attn = dot(merge_heads(o.astype(compute_dtype)), at(so_w_all, l))
                    attn = attn + at(so_b_all, l)
                    h = h + attn.astype(compute_dtype)

                # ---- cross-attention: cached context K/V + shared step token
                if "cross" not in ablate:
                    n2 = maybe_ln(h, l, 1)
                    q2 = dot(n2, at(cq_w_all, l))
                    q2 = (q2 + at(cq_b_all, l)).astype(compute_dtype)
                    qs2 = head_stack(q2)  # (R, HP, E)
                    if QSTAT:
                        stk_l = stv_l = None
                    else:
                        # step-token K/V rows (shared across robots); queries
                        # are head-masked so the full-E product is the
                        # per-head score
                        stk_l = jax.lax.slice_in_dim(stk_t, l, l + 1, axis=0)
                        stv_l = jax.lax.slice_in_dim(stv_t, l, l + 1, axis=0)
                    o = cross_attention(
                        qs2, ctx_k_scr[l], ctx_v_scr[l], stk_l, stv_l, maskadd,
                        sk_l=k_scales[l] if QUANT else None,
                        sv_l=v_scales[l] if QUANT else None)
                    attn = dot(merge_heads(o), at(co_w_all, l)) + at(co_b_all, l)
                    h = h + attn.astype(compute_dtype)

                # ---- MLP ----
                if "mlp" not in ablate:
                    n3 = maybe_ln(h, l, 2)
                    m1 = dot(n3, at(m1_w_all, l))
                    m1 = _gelu_exact(m1 + at(m1_b_all, l)).astype(compute_dtype)
                    m2 = dot(m1, at(m2_w_all, l)) + at(m2_b_all, l)
                    h = h + m2.astype(compute_dtype)

            eps = dot(h, fc_w) + fc_b  # (RP, J) fp32

            # Linear solver update (diffusion/dpm_solver.py semantics):
            # DDIM (C=0) and DPM-Solver++(2M) share the same 5-coefficient
            # form, so the solver choice is purely a host-side table swap.
            A, B, C = coef_ref[t, 0], coef_ref[t, 1], coef_ref[t, 2]
            Pc, Qc = coef_ref[t, 3], coef_ref[t, 4]
            x_next = A * x + B * eps + C * x0cache
            return (x_next, Pc * x + Qc * eps)

        noise0 = noise_ref[...].astype(jnp.float32).reshape(R * P, num_joints)
        x0, _ = jax.lax.fori_loop(
            0, T, step_body, (noise0, jnp.zeros_like(noise0)),
        )
        out_ref[...] = x0.reshape(R, P, num_joints).astype(out_ref.dtype)

    return kernel


class FusedChunkSampler(FusedDenoiser):
    """One Pallas op for the entire multi-step DDIM chunk.

    Weight extraction is inherited from FusedDenoiser; context K/V are
    projected in-kernel (no packing/precompute ops on the XLA side — the
    sampler takes the raw encoded context).

    ``cross_orientation="qstat"`` is an EXPERIMENT-ONLY alternative cross
    orientation (streamed-K; measured slower than the default "kstat",
    docs/perf_notes.md round 2) and is not reachable from RolloutEngine.
    """

    def __init__(self, model, params, interpret: bool = False,
                 block_robots: int = 32, group_robots: int = 1,
                 cross_orientation: str = "kstat",
                 context_kv_quant: str = "none"):
        super().__init__(model, params, interpret=interpret, block_robots=block_robots)
        if block_robots % group_robots != 0:
            raise ValueError(
                f"block_robots {block_robots} not divisible by group_robots "
                f"{group_robots}")
        if cross_orientation not in ("kstat", "qstat"):
            raise ValueError(f"unknown cross_orientation {cross_orientation!r}")
        if cross_orientation == "qstat" and group_robots != 1:
            raise ValueError("cross_orientation='qstat' requires group_robots=1")
        if context_kv_quant not in ("none", "int8"):
            raise ValueError(f"unknown context_kv_quant {context_kv_quant!r}")
        self.group_robots = group_robots
        self.cross_orientation = cross_orientation
        # "int8": context K/V live in VMEM scratch as int8 with per-(layer,
        # tensor) scales; cross-attention dots run on the int8 MXU path
        self.context_kv_quant = context_kv_quant
        # microbenchmark-only component-ablation hook (see _make_chunk_kernel)
        self._ablate = frozenset()

    def step_tables(self, step_token_table: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(T, E) step tokens -> per-step per-layer cross K/V rows (T, L, E)."""
        stt = step_token_table.astype(self.dtype)
        k_tab = (jnp.einsum("te,lef->tlf", stt, self.ck_w,
                            preferred_element_type=jnp.float32) + self.ck_b[None])
        v_tab = (jnp.einsum("te,lef->tlf", stt, self.cv_w,
                            preferred_element_type=jnp.float32) + self.cv_b[None])
        return k_tab.astype(self.dtype), v_tab.astype(self.dtype)

    def sample(self, context: jnp.ndarray, noise: jnp.ndarray,
               step_token_table: jnp.ndarray, schedule,
               num_inference_steps: int, solver: str = "ddim") -> jnp.ndarray:
        """Full multi-step rollout as ONE kernel op for the whole chunk.

        ``solver``: "ddim" (first-order, the reference sampler) or "dpmpp"
        (DPM-Solver++(2M), diffusion/dpm_solver.py) — both are the same
        in-kernel linear update with different host-side (T, 5) tables.
        ``context``: (B, S, E) encoded context tokens (raw, pre-K/V)."""
        from soccerdiffusion_tpu.diffusion.dpm_solver import solver_coef_table

        cfg = self.cfg
        b, S, E_ = context.shape
        R = min(self.block_robots, b)
        assert b % R == 0, f"batch {b} not divisible by block_robots {R}"
        nb = b // R
        P, E, J = cfg.trajectory_prediction_length, cfg.hidden_dim, cfg.num_joints
        assert E_ == E, (E_, E)
        T = num_inference_steps

        stk_tab, stv_tab = self.step_tables(step_token_table)
        coefs = jnp.asarray(solver_coef_table(schedule, T, solver))

        G = self.group_robots if R % self.group_robots == 0 else 1
        kernel = _make_chunk_kernel(self.num_layers, self.num_heads, self.head_dim,
                                    P, E, J, T, R, S, group_robots=G,
                                    cross_orientation=self.cross_orientation,
                                    kv_quant=self.context_kv_quant,
                                    ablate=self._ablate)
        SK = S + T if (G == 1 and self.cross_orientation == "qstat") else S
        L = self.num_layers
        in_specs = [
            pl.BlockSpec((R, P, J), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, L, E), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, L, E), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 5), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 23

        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((R, P, J), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, P, J), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((L, R, SK, E),
                           jnp.int8 if self.context_kv_quant == "int8"
                           else self.dtype),
                pltpu.VMEM((L, R, SK, E),
                           jnp.int8 if self.context_kv_quant == "int8"
                           else self.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )(
            noise.astype(self.dtype), context.astype(self.dtype),
            stk_tab, stv_tab, coefs,
            self.pe, self.emb_w, self.emb_b, self.qkv_w, self.qkv_b,
            self.so_w, self.so_b, self.cq_w, self.cq_b,
            self.ck_w, self.ck_b, self.cv_w, self.cv_b,
            self.co_w, self.co_b,
            self.mlp1_w, self.mlp1_b, self.mlp2_w, self.mlp2_b,
            self.ln_s, self.ln_b, self.fc_w, self.fc_b,
        )
