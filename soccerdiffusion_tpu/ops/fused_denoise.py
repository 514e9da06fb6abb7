"""Fused serving-path denoiser: the ENTIRE 4-layer cross-attending decoder
as one Pallas program.

Motivation (docs/perf_notes.md): at this model family's sizes the denoise
step is op-count-bound — ~34 small XLA ops x fixed per-op overhead dwarf
both FLOPs and HBM time. This kernel runs embedding -> posenc -> N x
[pre-norm self-attention, cross-attention against cached context K/V plus
the per-step step-token K/V, MLP] -> output projection for a block of
robots entirely in VMEM, gridded over robot blocks.

Layout choices for Mosaic friendliness:
  * all refs are <=4-D; per-layer weights are stacked on a leading axis
  * per-(layer, head) context K/V are stacked as (L*H, B, S, D)
  * attention is computed per head with broadcast-multiply-reduce on the
    VPU (score tensors are tiny at 10x112); the dense projections are
    row-batched MXU matmuls

Numerics match the XLA path (``DiffusionPolicy.denoise_with_kv``) to bf16
tolerance; see tests/test_fused_denoise.py.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from soccerdiffusion_tpu.models.embeddings import sinusoidal_table


def _erf(x):
    """Abramowitz & Stegun 7.1.26 polynomial erf (max err 1.5e-7): Mosaic
    has no erf primitive."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """Exact-GELU via polynomial erf (matches torch's default activation)."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _layer_norm(x, scale, bias, eps=1e-6):
    # fp32 internally: Mosaic's bf16 rsqrt path is unsupported on v5e.
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _head_attention(qh, kh, vh, extra_kh=None, extra_vh=None):
    """qh (R, Q, D) vs kh/vh (R, S, D) [+ optional (R, 1, D) extra token]
    -> (R, Q, D). Batched dot_general attention with fp32 joint softmax —
    only Mosaic-lowerable forms (no middle-dim broadcasts, reshapes, or
    concats); the extra token folds in via joint normalization."""
    d = qh.shape[-1]
    scale = 1.0 / np.sqrt(d)
    s = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # (R, Q, S)
    if extra_kh is not None:
        # robot-shared extra token: extra_kh (D, 1), extra_vh (1, D)
        s_x = jax.lax.dot_general(
            qh, extra_kh, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (R, Q, 1)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_x)
        p = jnp.exp(s - m)
        p_x = jnp.exp(s_x - m)  # (R, Q, 1)
        denom = jnp.sum(p, axis=-1, keepdims=True) + p_x
        out = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out = out + jax.lax.dot_general(
            p_x.astype(vh.dtype), extra_vh, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (out / denom).astype(vh.dtype)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return (out / denom).astype(vh.dtype)


def _make_kernel(num_layers: int, num_heads: int, head_dim: int, pred_len: int,
                 hidden: int, num_joints: int):
    H, D, P, E = num_heads, head_dim, pred_len, hidden

    def kernel(
        noisy_ref,      # (R, P, J)
        st_k_ref,       # (L, E, 1) step-token cross K (shared across robots)
        st_v_ref,       # (L, 1, E)
        ctx_k_ref,      # (L, R, S, E) heads packed in lanes
        ctx_v_ref,      # (L, R, S, E)
        pe_ref,         # (P, E)
        emb_w_ref, emb_b_ref,          # (J, E), (1, E)
        qkv_w_ref, qkv_b_ref,          # (L, E, 3E), (L, E)  [b packed 3E->see below]
        so_w_ref, so_b_ref,            # (L, E, E), (L, E)
        cq_w_ref, cq_b_ref,            # (L, E, E), (L, E)
        co_w_ref, co_b_ref,            # (L, E, E), (L, E)
        mlp1_w_ref, mlp1_b_ref,        # (L, E, E), (L, E)
        mlp2_w_ref, mlp2_b_ref,        # (L, E, E), (L, E)
        ln_s_ref, ln_b_ref,            # (L, 3, E) scale / bias for norm1/2/3
        fc_w_ref, fc_b_ref,            # (E, J), (1, J)
        out_ref,        # (R, P, J)
        *,
        qkv_b3_ref=None,
        coef_ref=None,  # SMEM (1, 4) fp32 DDIM coefs; present => output x_prev
    ):
        r = noisy_ref.shape[0]
        compute_dtype = ctx_k_ref.dtype

        # Embedding + positional encoding.
        x = noisy_ref[...].astype(compute_dtype)  # (R, P, J)
        x2d = x.reshape(r * P, x.shape[-1])
        h = jax.lax.dot_general(x2d, emb_w_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = (h + emb_b_ref[...]).astype(compute_dtype)
        h = h.reshape(r, P, E) + pe_ref[...][None].astype(compute_dtype)

        st_k_all3 = st_k_ref[...].astype(compute_dtype)  # (L, E, 1)
        st_v_all3 = st_v_ref[...].astype(compute_dtype)  # (L, 1, E)
        # Load the stacked context K/V once as values; static per-(layer,
        # head) slices of a value are compile-time views (ref integer
        # indexing does not lower through Mosaic's gather path).
        ctx_k_all = ctx_k_ref[...]
        ctx_v_all = ctx_v_ref[...]

        qkv_w_all = qkv_w_ref[...]
        qkv_b_all = qkv_b3_ref[...]
        so_w_all, so_b_all = so_w_ref[...], so_b_ref[...]
        cq_w_all, cq_b_all = cq_w_ref[...], cq_b_ref[...]
        co_w_all, co_b_all = co_w_ref[...], co_b_ref[...]
        m1_w_all, m1_b_all = mlp1_w_ref[...], mlp1_b_ref[...]
        m2_w_all, m2_b_all = mlp2_w_ref[...], mlp2_b_ref[...]
        ln_s_all, ln_b_all = ln_s_ref[...], ln_b_ref[...]

        def at(x, i):
            return jax.lax.index_in_dim(x, i, axis=0, keepdims=False)

        for l in range(num_layers):
            # ---- self-attention ----
            n1 = _layer_norm(h, at(at(ln_s_all, l), 0), at(at(ln_b_all, l), 0)).astype(compute_dtype)
            n1_2d = n1.reshape(r * P, E)
            qkv = jax.lax.dot_general(n1_2d, at(qkv_w_all, l), (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            qkv = (qkv + at(qkv_b_all, l)).astype(compute_dtype)  # (R*P, 3E)
            heads_out = []
            for hh in range(H):
                qh = jax.lax.slice_in_dim(qkv, hh * D, (hh + 1) * D, axis=1).reshape(r, P, D)
                kh = jax.lax.slice_in_dim(qkv, E + hh * D, E + (hh + 1) * D, axis=1).reshape(r, P, D)
                vh = jax.lax.slice_in_dim(qkv, 2 * E + hh * D, 2 * E + (hh + 1) * D, axis=1).reshape(r, P, D)
                heads_out.append(_head_attention(qh, kh, vh))
            attn = jnp.concatenate(heads_out, axis=-1).reshape(r * P, E)
            attn = jax.lax.dot_general(attn, at(so_w_all, l), (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            attn = (attn + at(so_b_all, l)).astype(compute_dtype)
            h = h + attn.reshape(r, P, E)

            # ---- cross-attention (cached context K/V + fresh step token) ----
            n2 = _layer_norm(h, at(at(ln_s_all, l), 1), at(at(ln_b_all, l), 1)).astype(compute_dtype)
            n2_2d = n2.reshape(r * P, E)
            q2 = jax.lax.dot_general(n2_2d, at(cq_w_all, l), (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            q2 = (q2 + at(cq_b_all, l)).astype(compute_dtype)
            st_k2 = at(st_k_all3, l)  # (E, 1)
            st_v2 = at(st_v_all3, l)  # (1, E)
            ctx_k_l = at(ctx_k_all, l)  # (R, S, E)
            ctx_v_l = at(ctx_v_all, l)
            heads_out = []
            for hh in range(H):
                qh = jax.lax.slice_in_dim(q2, hh * D, (hh + 1) * D, axis=1).reshape(r, P, D)
                ctx_kh = jax.lax.slice_in_dim(ctx_k_l, hh * D, (hh + 1) * D, axis=2)
                ctx_vh = jax.lax.slice_in_dim(ctx_v_l, hh * D, (hh + 1) * D, axis=2)
                st_kh = jax.lax.slice_in_dim(st_k2, hh * D, (hh + 1) * D, axis=0)
                st_vh = jax.lax.slice_in_dim(st_v2, hh * D, (hh + 1) * D, axis=1)
                heads_out.append(
                    _head_attention(qh, ctx_kh, ctx_vh, extra_kh=st_kh, extra_vh=st_vh))
            attn = jnp.concatenate(heads_out, axis=-1).reshape(r * P, E)
            attn = jax.lax.dot_general(attn, at(co_w_all, l), (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            attn = (attn + at(co_b_all, l)).astype(compute_dtype)
            h = h + attn.reshape(r, P, E)

            # ---- MLP ----
            n3 = _layer_norm(h, at(at(ln_s_all, l), 2), at(at(ln_b_all, l), 2)).astype(compute_dtype)
            m1 = jax.lax.dot_general(n3.reshape(r * P, E), at(m1_w_all, l),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            m1 = _gelu_exact(m1 + at(m1_b_all, l)).astype(compute_dtype)
            m2 = jax.lax.dot_general(m1, at(m2_w_all, l), (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            m2 = (m2 + at(m2_b_all, l)).astype(compute_dtype)
            h = h + m2.reshape(r, P, E)

        out = jax.lax.dot_general(h.reshape(r * P, E), fc_w_ref[...],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        eps = (out + fc_b_ref[...]).reshape(r, P, -1)
        if coef_ref is None:
            out_ref[...] = eps.astype(out_ref.dtype)
        else:
            # In-kernel DDIM step (eta=0, eps prediction): coefs =
            # [1/sqrt(abar_t), sqrt(1-abar_t), sqrt(abar_prev), sqrt(1-abar_prev)]
            x_t = noisy_ref[...].astype(jnp.float32)
            inv_sq_abar = coef_ref[0, 0]
            sq_1m_abar = coef_ref[0, 1]
            sq_abar_prev = coef_ref[0, 2]
            sq_1m_abar_prev = coef_ref[0, 3]
            x0_hat = (x_t - sq_1m_abar * eps) * inv_sq_abar
            out_ref[...] = (sq_abar_prev * x0_hat + sq_1m_abar_prev * eps).astype(out_ref.dtype)

    return kernel


class FusedDenoiser:
    """Extracts DiffusionPolicy decoder weights once and serves
    ``denoise(noisy, step_token)`` as a single Pallas program.

    Construct per (params, batch_size); context K/V set per chunk via
    ``set_context`` (returns a new callable closure for jit friendliness:
    everything is functional — no hidden state).
    """

    def __init__(self, model, params, interpret: bool = False, block_robots: int = 32):
        cfg = model.config
        self.cfg = cfg
        self.interpret = interpret
        self.block_robots = block_robots
        gen = params["diffusion_action_generator"]
        dec = gen["decoder"]
        L = cfg.num_decoder_layers
        self.num_layers = L
        # Derived from the model config, with build-time validation so a
        # mismatched architecture fails here rather than producing garbage.
        self.num_heads = cfg.num_decoder_heads
        if cfg.hidden_dim % self.num_heads != 0:
            raise ValueError(
                f"hidden_dim {cfg.hidden_dim} not divisible by num_decoder_heads "
                f"{self.num_heads}; the fused kernel slices heads from the lane dim"
            )
        if not all(f"layer_{i}" in dec for i in range(L)):
            raise ValueError(
                f"decoder params hold {len(dec)} layers but config says {L}"
            )
        self.head_dim = cfg.hidden_dim // self.num_heads
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.dtype = dtype

        def stack(path_fn):
            return jnp.stack([jnp.asarray(path_fn(dec[f"layer_{i}"]), dtype=dtype)
                              for i in range(L)])

        sa = lambda lyr: lyr["self_attn"]
        ca = lambda lyr: lyr["cross_attn"]
        # fused qkv for self-attention
        self.qkv_w = jnp.concatenate(
            [stack(lambda l: sa(l)["q_proj"]["kernel"]),
             stack(lambda l: sa(l)["k_proj"]["kernel"]),
             stack(lambda l: sa(l)["v_proj"]["kernel"])], axis=2)  # (L, E, 3E)
        self.qkv_b = jnp.concatenate(
            [stack(lambda l: sa(l)["q_proj"]["bias"]),
             stack(lambda l: sa(l)["k_proj"]["bias"]),
             stack(lambda l: sa(l)["v_proj"]["bias"])], axis=1)  # (L, 3E)
        self.so_w = stack(lambda l: sa(l)["out_proj"]["kernel"])
        self.so_b = stack(lambda l: sa(l)["out_proj"]["bias"])
        self.cq_w = stack(lambda l: ca(l)["q_proj"]["kernel"])
        self.cq_b = stack(lambda l: ca(l)["q_proj"]["bias"])
        self.ck_w = stack(lambda l: ca(l)["k_proj"]["kernel"])
        self.ck_b = stack(lambda l: ca(l)["k_proj"]["bias"])
        self.cv_w = stack(lambda l: ca(l)["v_proj"]["kernel"])
        self.cv_b = stack(lambda l: ca(l)["v_proj"]["bias"])
        self.co_w = stack(lambda l: ca(l)["out_proj"]["kernel"])
        self.co_b = stack(lambda l: ca(l)["out_proj"]["bias"])
        self.mlp1_w = stack(lambda l: l["mlp"]["linear1"]["kernel"])
        self.mlp1_b = stack(lambda l: l["mlp"]["linear1"]["bias"])
        self.mlp2_w = stack(lambda l: l["mlp"]["linear2"]["kernel"])
        self.mlp2_b = stack(lambda l: l["mlp"]["linear2"]["bias"])
        self.ln_s = jnp.stack([
            jnp.stack([jnp.asarray(dec[f"layer_{i}"][f"norm{j}"]["scale"], dtype=jnp.float32)
                       for j in (1, 2, 3)]) for i in range(L)])
        self.ln_b = jnp.stack([
            jnp.stack([jnp.asarray(dec[f"layer_{i}"][f"norm{j}"]["bias"], dtype=jnp.float32)
                       for j in (1, 2, 3)]) for i in range(L)])
        self.emb_w = jnp.asarray(gen["embedding"]["kernel"], dtype=dtype)
        self.emb_b = jnp.asarray(gen["embedding"]["bias"], dtype=jnp.float32)[None]
        self.fc_w = jnp.asarray(gen["fc_out"]["kernel"], dtype=dtype)
        self.fc_b = jnp.asarray(gen["fc_out"]["bias"], dtype=jnp.float32)[None]
        self.pe = jnp.asarray(
            sinusoidal_table(cfg.trajectory_prediction_length, cfg.hidden_dim),
            dtype=dtype,
        )

    def pack_context_kv(self, context_kv: list) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-layer [(k, v)] with (B, S, H, D) -> stacked (L, B, S, H*D):
        heads live contiguously in the lane dimension, so VMEM blocks carry
        no 32-lane padding and the kernel lane-slices per head."""
        ks = jnp.stack([k.reshape(k.shape[0], k.shape[1], -1) for k, _ in context_kv])
        vs = jnp.stack([v.reshape(v.shape[0], v.shape[1], -1) for _, v in context_kv])
        return ks.astype(self.dtype), vs.astype(self.dtype)

    def step_token_kv(self, step_token: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(E,) shared step token -> per-layer cross K (L, E, 1) / V (L, 1, E).

        Sampling uses ONE timestep for the whole batch (reference
        ros.py:301-310), so the step token — and therefore its K/V — is
        robot-independent."""
        st = step_token.astype(self.dtype)
        k = (jnp.einsum("e,lef->lf", st, self.ck_w, preferred_element_type=jnp.float32)
             + self.ck_b)[:, :, None].astype(self.dtype)  # (L, E, 1)
        v = (jnp.einsum("e,lef->lf", st, self.cv_w, preferred_element_type=jnp.float32)
             + self.cv_b)[:, None, :].astype(self.dtype)  # (L, 1, E)
        return k, v

    def __call__(self, packed_kv, noisy: jnp.ndarray, step_token: jnp.ndarray,
                 ddim_coefs: jnp.ndarray | None = None) -> jnp.ndarray:
        """noisy (B, P, J); step_token (E,) shared across the batch; with
        ``ddim_coefs`` (1, 4) the kernel returns x_prev instead of epsilon."""
        cfg = self.cfg
        ctx_k, ctx_v = packed_kv
        b = noisy.shape[0]
        st_k_all, st_v_all = self.step_token_kv(step_token)
        R = min(self.block_robots, b)
        assert b % R == 0, f"batch {b} not divisible by robot block {R}"
        L_, _, S, E_ = ctx_k.shape
        P, E, J = cfg.trajectory_prediction_length, cfg.hidden_dim, cfg.num_joints

        kernel = _make_kernel(self.num_layers, self.num_heads, self.head_dim, P, E, J)
        kernel = functools.partial(kernel)

        def batch_spec(shape):
            # robot-blocked along the batch axis (position 0 or 1)
            return shape

        grid = (b // R,)
        L = self.num_layers
        with_coefs = ddim_coefs is not None
        in_specs = [
            pl.BlockSpec((R, P, J), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, E, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, E), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, R, S, E), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, R, S, E), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 19
        inputs = [
            noisy.astype(self.dtype), st_k_all, st_v_all, ctx_k, ctx_v,
            self.pe, self.emb_w, self.emb_b, self.qkv_w, self.qkv_b,
            self.so_w, self.so_b, self.cq_w, self.cq_b, self.co_w, self.co_b,
            self.mlp1_w, self.mlp1_b, self.mlp2_w, self.mlp2_b,
            self.ln_s, self.ln_b, self.fc_w, self.fc_b,
        ]
        if with_coefs:
            in_specs.append(pl.BlockSpec((1, 4), memory_space=pltpu.SMEM))
            inputs.append(ddim_coefs.astype(jnp.float32))

        def wrapped(noisy_r, stk_r, stv_r, ck_r, cv_r, pe_r, ew_r, eb_r, qw_r, qb_r,
                    sow_r, sob_r, cqw_r, cqb_r, cow_r, cob_r,
                    m1w_r, m1b_r, m2w_r, m2b_r, lns_r, lnb_r,
                    fw_r, fb_r, *rest):
            coef_r, out_r = (rest[0], rest[1]) if with_coefs else (None, rest[0])
            kernel(noisy_r, stk_r, stv_r, ck_r, cv_r, pe_r, ew_r, eb_r, qw_r, None,
                   sow_r, sob_r, cqw_r, cqb_r, cow_r, cob_r,
                   m1w_r, m1b_r, m2w_r, m2b_r, lns_r, lnb_r,
                   fw_r, fb_r, out_r, qkv_b3_ref=qb_r, coef_ref=coef_r)

        out = pl.pallas_call(
            wrapped,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((R, P, J), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, P, J), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )(*inputs)
        return out

    def sample(self, packed_kv, noise: jnp.ndarray, step_token_table: jnp.ndarray,
               schedule, num_inference_steps: int) -> jnp.ndarray:
        """Full DDIM rollout with ONE kernel op per step.

        step_token_table: (T, E) precomputed step tokens for the timestep
        sequence (shared across robots). All per-step glue — step-token K/V
        projection, DDIM coefficient lookup, and the x-update — happens once
        per chunk or inside the kernel, so the scan body is a single op.
        """
        from soccerdiffusion_tpu.diffusion.ddim import ddim_timesteps

        ts = np.asarray(ddim_timesteps(schedule.num_train_timesteps, num_inference_steps))
        acp = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
        prev = ts - schedule.num_train_timesteps // num_inference_steps
        abar_t = acp[ts]
        abar_prev = np.where(prev >= 0, acp[np.maximum(prev, 0)], schedule.final_alpha_cumprod)
        coefs = jnp.asarray(np.stack([
            1.0 / np.sqrt(abar_t), np.sqrt(1.0 - abar_t),
            np.sqrt(abar_prev), np.sqrt(1.0 - abar_prev),
        ], axis=1)[:, None, :], dtype=jnp.float32)  # (T, 1, 4)

        # Per-step K/V tables in two einsums (T, L, E, 1) / (T, L, 1, E).
        stt = step_token_table.astype(self.dtype)  # (T, E)
        k_tab = (jnp.einsum("te,lef->tlf", stt, self.ck_w,
                            preferred_element_type=jnp.float32)
                 + self.ck_b[None])[:, :, :, None].astype(self.dtype)
        v_tab = (jnp.einsum("te,lef->tlf", stt, self.cv_w,
                            preferred_element_type=jnp.float32)
                 + self.cv_b[None])[:, :, None, :].astype(self.dtype)

        def body(x, per_step):
            st_k, st_v, coef = per_step
            x = self._call_with_precomputed(packed_kv, x, st_k, st_v, coef)
            return x, None

        x0, _ = jax.lax.scan(body, noise, (k_tab, v_tab, coefs))
        return x0

    def _call_with_precomputed(self, packed_kv, noisy, st_k_all, st_v_all, ddim_coefs):
        """One kernel op given precomputed per-step tensors."""
        cfg = self.cfg
        ctx_k, ctx_v = packed_kv
        b = noisy.shape[0]
        R = min(self.block_robots, b)
        assert b % R == 0
        L_, _, S, E_ = ctx_k.shape
        P, E, J = cfg.trajectory_prediction_length, cfg.hidden_dim, cfg.num_joints
        kernel = _make_kernel(self.num_layers, self.num_heads, self.head_dim, P, E, J)
        grid = (b // R,)
        L = self.num_layers
        in_specs = [
            pl.BlockSpec((R, P, J), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, E, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, E), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, R, S, E), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, R, S, E), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 19 + [
            pl.BlockSpec((1, 4), memory_space=pltpu.SMEM)
        ]

        def wrapped(noisy_r, stk_r, stv_r, ck_r, cv_r, pe_r, ew_r, eb_r, qw_r, qb_r,
                    sow_r, sob_r, cqw_r, cqb_r, cow_r, cob_r,
                    m1w_r, m1b_r, m2w_r, m2b_r, lns_r, lnb_r,
                    fw_r, fb_r, coef_r, out_r):
            kernel(noisy_r, stk_r, stv_r, ck_r, cv_r, pe_r, ew_r, eb_r, qw_r, None,
                   sow_r, sob_r, cqw_r, cqb_r, cow_r, cob_r,
                   m1w_r, m1b_r, m2w_r, m2b_r, lns_r, lnb_r,
                   fw_r, fb_r, out_r, qkv_b3_ref=qb_r, coef_ref=coef_r)

        return pl.pallas_call(
            wrapped,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((R, P, J), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, P, J), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )(
            noisy.astype(self.dtype), st_k_all, st_v_all, ctx_k, ctx_v,
            self.pe, self.emb_w, self.emb_b, self.qkv_w, self.qkv_b,
            self.so_w, self.so_b, self.cq_w, self.cq_b, self.co_w, self.co_b,
            self.mlp1_w, self.mlp1_b, self.mlp2_w, self.mlp2_b,
            self.ln_s, self.ln_b, self.fc_w, self.fc_b, ddim_coefs,
        )
