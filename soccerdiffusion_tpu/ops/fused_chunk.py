"""Whole-action-chunk fused sampler: ALL DDIM steps of the 4-layer
cross-attending decoder as ONE Pallas program per robot block.

Why (docs/perf_notes.md round-2 measurements): on the serving runtime each
XLA op in a dependent chain costs ~0.2 ms regardless of size, so the 30-step
sampler (~34 ops/step) costs ~6 ms/step no matter how the loop is expressed
(scan / unroll / fori all measured equal). The round-1 fused kernel brought
that to one op per step; this kernel brings the WHOLE chunk to one op: a
``fori_loop`` over denoising steps runs inside the kernel, reading per-step
step-token K/V and DDIM coefficients from in-kernel tables, so weights and
context K/V are loaded into VMEM once per chunk instead of once per step.

Attention is restructured for the MXU (microbenchmarks,
benchmarks/microbench_tpu.py): per-robot attention matrices (10x112,
head_dim 32) are latency-bound as batched tiny dots (~60 cycles each), so R
robots are packed BLOCK-DIAGONALLY into one (R*P, R*S) score matrix per
(layer, head) — at R=8 the R-fold FLOP waste costs ~70 MXU cycles against
~480 for 8 tiny dots. The step-token column is folded into the same softmax
via joint normalization (sampling uses one timestep for the whole batch,
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
                       num_steps: int, block_robots: int, seq: int):
    L, H, D, P, E, T, R, S = (num_layers, num_heads, head_dim, pred_len,
                              hidden, num_steps, block_robots, seq)
    RP, RS = R * P, R * S

    def kernel(
        noise_ref,     # (R, P, J)
        ctx_k_ref,     # (L*H, 1, D, R*S)  block-diag-ready, this block's slab
        ctx_v_ref,     # (L*H, 1, R*S, D)
        stk_ref,       # (T, L, E) per-step step-token cross K rows
        stv_ref,       # (T, L, E) per-step step-token cross V rows
        coef_ref,      # (T, 4) SMEM fp32 DDIM coefficients
        pe_ref,        # (P, E)
        emb_w_ref, emb_b_ref,          # (J, E), (1, E)
        qkv_w_ref, qkv_b_ref,          # (L, E, 3E), (L, 3E)
        so_w_ref, so_b_ref,            # (L, E, E), (L, E)
        cq_w_ref, cq_b_ref,            # (L, E, E), (L, E)
        co_w_ref, co_b_ref,            # (L, E, E), (L, E)
        mlp1_w_ref, mlp1_b_ref,        # (L, E, E), (L, E)
        mlp2_w_ref, mlp2_b_ref,        # (L, E, E), (L, E)
        ln_s_ref, ln_b_ref,            # (L, 3, E)
        fc_w_ref, fc_b_ref,            # (E, J), (1, J)
        out_ref,       # (R, P, J)
    ):
        compute_dtype = ctx_k_ref.dtype

        # Block-diagonal masks, built once per program. Row r*P+p may only
        # see column r*S+s (cross) / r*P+p' (self) of its own robot r.
        row_block = jax.lax.broadcasted_iota(jnp.int32, (RP, RS), 0) // P
        col_block = jax.lax.broadcasted_iota(jnp.int32, (RP, RS), 1) // S
        cross_mask = jnp.where(row_block == col_block, 0.0, -1e9).astype(jnp.float32)
        srow = jax.lax.broadcasted_iota(jnp.int32, (RP, RP), 0) // P
        scol = jax.lax.broadcasted_iota(jnp.int32, (RP, RP), 1) // P
        self_mask = jnp.where(srow == scol, 0.0, -1e9).astype(jnp.float32)

        pe = pe_ref[...].astype(compute_dtype)  # (P, E)
        # Positional encoding tiled over robots: row r*P+p gets pe[p].
        pe_rows = jnp.concatenate([pe] * R, axis=0)  # (RP, E)

        emb_w = emb_w_ref[...]
        emb_b = emb_b_ref[...]
        fc_w = fc_w_ref[...]
        fc_b = fc_b_ref[...]

        qkv_w_all, qkv_b_all = qkv_w_ref[...], qkv_b_ref[...]
        so_w_all, so_b_all = so_w_ref[...], so_b_ref[...]
        cq_w_all, cq_b_all = cq_w_ref[...], cq_b_ref[...]
        co_w_all, co_b_all = co_w_ref[...], co_b_ref[...]
        m1_w_all, m1_b_all = mlp1_w_ref[...], mlp1_b_ref[...]
        m2_w_all, m2_b_all = mlp2_w_ref[...], mlp2_b_ref[...]
        ln_s_all, ln_b_all = ln_s_ref[...], ln_b_ref[...]
        ctx_k_all = ctx_k_ref[...]  # (L*H, 1, D, RS)
        ctx_v_all = ctx_v_ref[...]  # (L*H, 1, RS, D)

        def at(x, i):
            return jax.lax.index_in_dim(x, i, axis=0, keepdims=False)

        def dot(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def step_body(t, x):
            # x: (R*P, J) float32 current noisy chunk rows
            stk_t = stk_ref[pl.ds(t, 1)][0].astype(compute_dtype)  # (L, E)
            stv_t = stv_ref[pl.ds(t, 1)][0].astype(compute_dtype)  # (L, E)

            h = dot(x.astype(compute_dtype), emb_w)
            h = ((h + emb_b).astype(compute_dtype) + pe_rows)  # (RP, E)

            for l in range(L):
                # ---- self-attention (block-diag over robots) ----
                n1 = _layer_norm(h, at(at(ln_s_all, l), 0),
                                 at(at(ln_b_all, l), 0)).astype(compute_dtype)
                qkv = dot(n1, at(qkv_w_all, l))
                qkv = (qkv + at(qkv_b_all, l)).astype(compute_dtype)  # (RP, 3E)
                heads = []
                for hh in range(H):
                    qh = jax.lax.slice_in_dim(qkv, hh * D, (hh + 1) * D, axis=1)
                    kh = jax.lax.slice_in_dim(qkv, E + hh * D, E + (hh + 1) * D, axis=1)
                    vh = jax.lax.slice_in_dim(qkv, 2 * E + hh * D, 2 * E + (hh + 1) * D, axis=1)
                    s = jax.lax.dot_general(
                        qh, kh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * (1.0 / np.sqrt(D)) + self_mask  # (RP, RP)
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp(s - m)
                    p = p / jnp.sum(p, axis=-1, keepdims=True)
                    heads.append(dot(p.astype(compute_dtype), vh).astype(compute_dtype))
                attn = jnp.concatenate(heads, axis=-1)  # (RP, E)
                attn = dot(attn, at(so_w_all, l)) + at(so_b_all, l)
                h = h + attn.astype(compute_dtype)

                # ---- cross-attention: block-diag context + shared step token ----
                n2 = _layer_norm(h, at(at(ln_s_all, l), 1),
                                 at(at(ln_b_all, l), 1)).astype(compute_dtype)
                q2 = dot(n2, at(cq_w_all, l))
                q2 = (q2 + at(cq_b_all, l)).astype(compute_dtype)  # (RP, E)
                stk_l = jax.lax.slice_in_dim(stk_t, l, l + 1, axis=0)  # (1, E)
                stv_l = jax.lax.slice_in_dim(stv_t, l, l + 1, axis=0)  # (1, E)
                heads = []
                for hh in range(H):
                    qh = jax.lax.slice_in_dim(q2, hh * D, (hh + 1) * D, axis=1)  # (RP, D)
                    kh = at(ctx_k_all, l * H + hh)[0]  # (D, RS)
                    vh = at(ctx_v_all, l * H + hh)[0]  # (RS, D)
                    s = dot(qh, kh) * (1.0 / np.sqrt(D)) + cross_mask  # (RP, RS)
                    # step-token column, shared by every robot
                    stk_h = jax.lax.slice_in_dim(stk_l, hh * D, (hh + 1) * D, axis=1)  # (1, D)
                    stv_h = jax.lax.slice_in_dim(stv_l, hh * D, (hh + 1) * D, axis=1)  # (1, D)
                    s_x = jnp.sum(
                        qh.astype(jnp.float32) * stk_h.astype(jnp.float32),
                        axis=-1, keepdims=True,
                    ) * (1.0 / np.sqrt(D))  # (RP, 1)
                    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_x)
                    p = jnp.exp(s - m)
                    p_x = jnp.exp(s_x - m)
                    denom = jnp.sum(p, axis=-1, keepdims=True) + p_x
                    o = dot(p.astype(compute_dtype), vh)  # (RP, D) fp32
                    o = o + p_x * stv_h.astype(jnp.float32)
                    heads.append((o / denom).astype(compute_dtype))
                attn = jnp.concatenate(heads, axis=-1)
                attn = dot(attn, at(co_w_all, l)) + at(co_b_all, l)
                h = h + attn.astype(compute_dtype)

                # ---- MLP ----
                n3 = _layer_norm(h, at(at(ln_s_all, l), 2),
                                 at(at(ln_b_all, l), 2)).astype(compute_dtype)
                m1 = dot(n3, at(m1_w_all, l))
                m1 = _gelu_exact(m1 + at(m1_b_all, l)).astype(compute_dtype)
                m2 = dot(m1, at(m2_w_all, l)) + at(m2_b_all, l)
                h = h + m2.astype(compute_dtype)

            eps = dot(h, fc_w) + fc_b  # (RP, J) fp32

            # DDIM eta=0 update (diffusion/ddim.py semantics)
            inv_sq_abar = coef_ref[t, 0]
            sq_1m_abar = coef_ref[t, 1]
            sq_abar_prev = coef_ref[t, 2]
            sq_1m_abar_prev = coef_ref[t, 3]
            x0_hat = (x - sq_1m_abar * eps) * inv_sq_abar
            return sq_abar_prev * x0_hat + sq_1m_abar_prev * eps

        x0 = jax.lax.fori_loop(
            0, T, step_body,
            noise_ref[...].astype(jnp.float32).reshape(RP, num_joints),
        )
        out_ref[...] = x0.reshape(R, P, num_joints).astype(out_ref.dtype)

    return kernel


class FusedChunkSampler(FusedDenoiser):
    """One Pallas op for the entire multi-step DDIM chunk.

    Weight extraction/packing is inherited from FusedDenoiser; this class
    adds the block-diagonal context layout and the whole-chunk kernel.
    """

    def __init__(self, model, params, interpret: bool = False, block_robots: int = 8):
        super().__init__(model, params, interpret=interpret, block_robots=block_robots)

    def pack_context_bd(self, context_kv: list) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-layer [(k, v)] with (B, S, H, D) -> block-diagonal slabs:

        K: (L*H, nb, D, R*S)   (contraction dim D in sublanes)
        V: (L*H, nb, R*S, D)
        """
        R = self.block_robots
        ks, vs = [], []
        for k, v in context_kv:
            b, s, h, d = k.shape
            assert b % R == 0, f"batch {b} not divisible by block_robots {R}"
            nb = b // R
            # (B,S,H,D) -> (H, nb, D, R*S)
            k = k.reshape(nb, R, s, h, d).transpose(3, 0, 4, 1, 2).reshape(h, nb, d, R * s)
            # (B,S,H,D) -> (H, nb, R*S, D)
            v = v.reshape(nb, R, s, h, d).transpose(3, 0, 1, 2, 4).reshape(h, nb, R * s, d)
            ks.append(k)
            vs.append(v)
        return (jnp.concatenate(ks, axis=0).astype(self.dtype),
                jnp.concatenate(vs, axis=0).astype(self.dtype))

    def step_tables(self, step_token_table: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(T, E) step tokens -> per-step per-layer cross K/V rows (T, L, E)."""
        stt = step_token_table.astype(self.dtype)
        k_tab = (jnp.einsum("te,lef->tlf", stt, self.ck_w,
                            preferred_element_type=jnp.float32) + self.ck_b[None])
        v_tab = (jnp.einsum("te,lef->tlf", stt, self.cv_w,
                            preferred_element_type=jnp.float32) + self.cv_b[None])
        return k_tab.astype(self.dtype), v_tab.astype(self.dtype)

    def ddim_coef_table(self, schedule, num_inference_steps: int) -> jnp.ndarray:
        """(T, 4) fp32: [1/sqrt(abar_t), sqrt(1-abar_t), sqrt(abar_prev),
        sqrt(1-abar_prev)] per leading-spaced timestep."""
        from soccerdiffusion_tpu.diffusion.ddim import ddim_timesteps

        ts = np.asarray(ddim_timesteps(schedule.num_train_timesteps, num_inference_steps))
        acp = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
        prev = ts - schedule.num_train_timesteps // num_inference_steps
        abar_t = acp[ts]
        abar_prev = np.where(prev >= 0, acp[np.maximum(prev, 0)],
                             schedule.final_alpha_cumprod)
        return jnp.asarray(np.stack([
            1.0 / np.sqrt(abar_t), np.sqrt(1.0 - abar_t),
            np.sqrt(abar_prev), np.sqrt(1.0 - abar_prev),
        ], axis=1), dtype=jnp.float32)

    def sample(self, packed_bd, noise: jnp.ndarray, step_token_table: jnp.ndarray,
               schedule, num_inference_steps: int) -> jnp.ndarray:
        """Full DDIM rollout as ONE kernel op for the whole chunk."""
        cfg = self.cfg
        ctx_k, ctx_v = packed_bd
        b = noise.shape[0]
        R = self.block_robots
        assert b % R == 0, f"batch {b} not divisible by block_robots {R}"
        nb = b // R
        LH, _, D, RS = ctx_k.shape
        S = RS // R
        P, E, J = cfg.trajectory_prediction_length, cfg.hidden_dim, cfg.num_joints
        T = num_inference_steps

        stk_tab, stv_tab = self.step_tables(step_token_table)
        coefs = self.ddim_coef_table(schedule, T)

        kernel = _make_chunk_kernel(self.num_layers, self.num_heads, self.head_dim,
                                    P, E, J, T, R, S)
        L = self.num_layers
        in_specs = [
            pl.BlockSpec((R, P, J), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LH, 1, D, RS), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LH, 1, RS, D), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, L, E), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, L, E), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 19

        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((R, P, J), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, P, J), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )(
            noise.astype(self.dtype), ctx_k, ctx_v, stk_tab, stv_tab, coefs,
            self.pe, self.emb_w, self.emb_b, self.qkv_w, self.qkv_b,
            self.so_w, self.so_b, self.cq_w, self.cq_b, self.co_w, self.co_b,
            self.mlp1_w, self.mlp1_b, self.mlp2_w, self.mlp2_b,
            self.ln_s, self.ln_b, self.fc_w, self.fc_b,
        )
