"""Fused context encoder: ALL modality encoder stacks as ONE Pallas program.

Why: on the serving runtime the XLA ``encode_context`` costs ~17 ms at
B=1024 (benchmarks/microbench_residual.py) — ~170 tiny fusions repeatedly
streaming weights/activations through HBM for ~0.3 ms of actual matmul
work (the win is fusion/VMEM residency; perf_notes retracted the earlier
per-op-dispatch-floor explanation — no measurable per-op overhead exists
inside a compiled program).
This kernel runs the action-history, IMU and joint-state transformer
encoders plus the game-state embedding for a robot block in a single
program; the per-encoder outputs stitch together with one XLA concat.

Design notes (vs the decoder kernels in fused_denoise/fused_chunk):
  * Attention is PER-HEAD here, not head-stacked: at S~100 tokens a
    per-head masked-contraction score matmul already fills MXU rows, and
    head-stacking would 4x both the score tiles and the softmax width.
    Head h's lanes are selected by masking ONE operand; per-head value
    outputs land in disjoint lanes and sum to the concatenated layout.
  * Token counts are padded to a multiple of 8 (sublane tile) on the XLA
    side, so every in-kernel reshape between (R*T, E) and (R, T, E) is
    layout-preserving and all dense ops are plain 2D dots — the only
    constructs used are ones the proven decoder kernels already lower
    (2D dots, leading-batch 3D dots, (1, 1, E) lane masks, additive
    (1, T, T) score masks, full-block writes). Padded key columns are
    masked to -1e9 before the softmax; padded query rows are sliced away
    outside the kernel.

Semantics match ``DiffusionPolicy.encode_context`` (models/policy.py:88-109:
patch-conv embed -> sinusoidal posenc -> pre-norm exact-GELU transformer
encoder with ff_dim == hidden, reference ml/model/encoder/base.py:7-53) to
bf16 tolerance; see tests/test_fused_encoder.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from soccerdiffusion_tpu.models.embeddings import sinusoidal_table
from soccerdiffusion_tpu.ops.fused_denoise import _gelu_exact, _layer_norm

# Weight arrays carried per encoder stack, in kernel-operand order.
_PER_ENCODER_WEIGHTS = 13  # emb_w, emb_b, pos, qkv_w, qkv_b, o_w, o_b,
#                            ln_s, ln_b, m1_w, m1_b, m2_w, m2_b

_GS_ROWS = 8  # game-state token rows (one sublane tile; row 0 is the token)


def _pad8(n: int) -> int:
    return (n + 7) // 8 * 8


def _make_encoder_kernel(specs, num_heads: int, head_dim: int, hidden: int,
                         with_gamestate: bool, num_states: int):
    """specs: list of (tokens, padded_tokens, in_dim) per encoder stack;
    in_dim is the post-patch feature width, n_layers from weight shapes."""
    H, D, E = num_heads, head_dim, hidden
    n_enc = len(specs)

    def kernel(*refs):
        x_refs = refs[:n_enc]
        idx = n_enc
        gs_ref = None
        if with_gamestate:
            gs_ref = refs[idx]
            idx += 1
        w_refs = refs[idx:idx + n_enc * _PER_ENCODER_WEIGHTS]
        idx += n_enc * _PER_ENCODER_WEIGHTS
        gs_tab_ref = refs[idx] if with_gamestate else None
        idx += 1 if with_gamestate else 0
        out_refs = refs[idx:]

        compute_dtype = out_refs[0].dtype

        def at(x, i):
            return jax.lax.index_in_dim(x, i, axis=0, keepdims=False)

        def dot(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def bdot(a, b, ca, cb):
            return jax.lax.dot_general(
                a, b, (((ca,), (cb,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, E), 1) // D  # (1, E)
        head_masks = [
            (lane == hh).astype(compute_dtype).reshape(1, 1, E) for hh in range(H)
        ]
        scale = 1.0 / np.sqrt(D)

        for e, (tokens, tp, in_dim) in enumerate(specs):
            (emb_w_ref, emb_b_ref, pos_ref, qkv_w_ref, qkv_b_ref,
             o_w_ref, o_b_ref, ln_s_ref, ln_b_ref,
             m1_w_ref, m1_b_ref, m2_w_ref, m2_b_ref) = (
                w_refs[e * _PER_ENCODER_WEIGHTS:(e + 1) * _PER_ENCODER_WEIGHTS])
            n_layers = qkv_w_ref.shape[0]

            x = x_refs[e][...].astype(compute_dtype)  # (R, Tp, C)
            r = x.shape[0]
            x2 = x.reshape(r * tp, in_dim)  # Tp % 8 == 0: layout-preserving
            h = dot(x2, emb_w_ref[...]) + emb_b_ref[...]
            # padded pos rows tile along sublanes (aligned 8-row pieces)
            pos_rows = jnp.concatenate([pos_ref[...].astype(compute_dtype)] * r, axis=0)
            h = h.astype(compute_dtype) + pos_rows  # (R*Tp, E)

            if tokens < tp:
                col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
                key_mask = jnp.where(col < tokens, 0.0, -1e9).astype(jnp.float32)[None]
            else:
                key_mask = None

            qkv_w_all, qkv_b_all = qkv_w_ref[...], qkv_b_ref[...]
            o_w_all, o_b_all = o_w_ref[...], o_b_ref[...]
            ln_s_all, ln_b_all = ln_s_ref[...], ln_b_ref[...]
            m1_w_all, m1_b_all = m1_w_ref[...], m1_b_ref[...]
            m2_w_all, m2_b_all = m2_w_ref[...], m2_b_ref[...]

            for l in range(n_layers):
                ln_s_l, ln_b_l = at(ln_s_all, l), at(ln_b_all, l)
                n1 = _layer_norm(h, at(ln_s_l, 0), at(ln_b_l, 0)).astype(compute_dtype)
                qkv = dot(n1, at(qkv_w_all, l)) + at(qkv_b_all, l)
                qkv = qkv.astype(compute_dtype)  # (R*Tp, 3E)
                q = jax.lax.slice_in_dim(qkv, 0, E, axis=1).reshape(r, tp, E)
                k = jax.lax.slice_in_dim(qkv, E, 2 * E, axis=1).reshape(r, tp, E)
                v = jax.lax.slice_in_dim(qkv, 2 * E, 3 * E, axis=1).reshape(r, tp, E)
                o = None
                for hh in range(H):
                    qm = q * head_masks[hh]
                    s = bdot(qm, k, 2, 2) * scale  # (R, Tp, Tp) fp32, head hh
                    if key_mask is not None:
                        s = s + key_mask
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp(s - m)
                    p = p / jnp.sum(p, axis=-1, keepdims=True)
                    oh = bdot(p.astype(compute_dtype), v * head_masks[hh], 2, 1)
                    o = oh if o is None else o + oh  # disjoint head lanes
                o2 = o.astype(compute_dtype).reshape(r * tp, E)
                attn = dot(o2, at(o_w_all, l)) + at(o_b_all, l)
                h = h + attn.astype(compute_dtype)

                n2 = _layer_norm(h, at(ln_s_l, 1), at(ln_b_l, 1)).astype(compute_dtype)
                m1 = dot(n2, at(m1_w_all, l)) + at(m1_b_all, l)
                m1 = _gelu_exact(m1).astype(compute_dtype)
                m2 = dot(m1, at(m2_w_all, l)) + at(m2_b_all, l)
                h = h + m2.astype(compute_dtype)

            out_refs[e][...] = h.reshape(r, tp, E).astype(out_refs[e].dtype)

        if gs_ref is not None:
            oh = gs_ref[...].astype(compute_dtype)  # (R, GS_ROWS, NS) one-hot
            r = oh.shape[0]
            tok = dot(oh.reshape(r * _GS_ROWS, num_states),
                      gs_tab_ref[...].astype(compute_dtype))  # (R*GS_ROWS, E)
            out_refs[-1][...] = tok.reshape(r, _GS_ROWS, E).astype(out_refs[-1].dtype)

    return kernel


class FusedContextEncoder:
    """Extracts the policy's proprioceptive encoder weights once and serves
    ``encode(batch) -> (B, S_total, E)`` as a single Pallas program.

    Covers the canonical serving modalities (action history, IMU, joint
    states, game state); image configs keep the XLA path — camera frames
    arrive at 10 Hz off the 50 Hz hot loop (reference ros.py:177-203)."""

    def __init__(self, model, params, interpret: bool = False, block_robots: int = 16):
        cfg = model.config
        if cfg.use_images:
            raise ValueError(
                "FusedContextEncoder covers the proprioceptive serving path; "
                "image configs must use the XLA encode_context"
            )
        self.cfg = cfg
        self.interpret = interpret
        self.block_robots = block_robots
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.dtype = dtype
        E = cfg.hidden_dim
        # The policy builds its proprioceptive encoders without overriding
        # the head count (models/policy.py:50-70), so the class defaults ARE
        # the deployed values — read them from the module classes so a future
        # default change cannot silently desync the kernel's lane masks.
        from soccerdiffusion_tpu.models.encoders import IMUEncoder, JointEncoder

        self.num_heads = int(JointEncoder.num_heads)
        if int(IMUEncoder.num_heads) != self.num_heads:
            raise ValueError(
                f"JointEncoder ({JointEncoder.num_heads}) and IMUEncoder "
                f"({IMUEncoder.num_heads}) head counts diverge; the fused "
                "encoder assumes one head count for all modality stacks")
        if E % self.num_heads != 0:
            raise ValueError(f"hidden_dim {E} not divisible by {self.num_heads} heads")
        self.head_dim = E // self.num_heads
        ps = cfg.encoder_patch_size
        self.patch_size = ps

        # (param_key, batch_key, T, C, n_layers) in canonical context order
        # (models/policy.py:92-101)
        mods = []
        if cfg.use_action_history:
            mods.append(("action_history_encoder", "joint_command_history",
                         cfg.action_context_length, cfg.num_joints,
                         cfg.num_action_history_encoder_layers))
        if cfg.use_imu:
            mods.append(("imu_encoder", "rotation", cfg.imu_context_length,
                         cfg.imu_input_dim, cfg.num_imu_encoder_layers))
        if cfg.use_joint_states:
            mods.append(("joint_states_encoder", "joint_state",
                         cfg.joint_state_context_length, cfg.num_joints,
                         cfg.joint_state_encoder_layers))
        if not mods:
            raise ValueError("no sequence encoders enabled")
        self.batch_keys = [m[1] for m in mods]
        self.specs = []  # (tokens, padded_tokens, post_patch_dim)
        self.weights = []  # flat list, _PER_ENCODER_WEIGHTS per encoder
        for key, _, T, C, nl in mods:
            if T % ps != 0:
                raise ValueError(f"{key}: context length {T} not divisible by patch {ps}")
            tokens = T // ps
            tp = _pad8(tokens)
            seq = params[key]["seq"]
            proj = seq["embedding"]["proj"]
            emb_w = jnp.asarray(proj["kernel"], dtype).reshape(ps * C, E)
            emb_b = jnp.asarray(proj["bias"], dtype)  # rank-1: lane-aligned
            enc = seq["encoder"]
            if not all(f"layer_{i}" in enc for i in range(nl)):
                raise ValueError(f"{key}: params hold {len(enc)} layers, config says {nl}")

            def stack(fn):
                return jnp.stack([jnp.asarray(fn(enc[f"layer_{i}"]), dtype)
                                  for i in range(nl)])

            sa = lambda l: l["self_attn"]
            qkv_w = jnp.concatenate(
                [stack(lambda l: sa(l)["q_proj"]["kernel"]),
                 stack(lambda l: sa(l)["k_proj"]["kernel"]),
                 stack(lambda l: sa(l)["v_proj"]["kernel"])], axis=2)  # (nl, E, 3E)
            qkv_b = jnp.concatenate(
                [stack(lambda l: sa(l)["q_proj"]["bias"]),
                 stack(lambda l: sa(l)["k_proj"]["bias"]),
                 stack(lambda l: sa(l)["v_proj"]["bias"])], axis=1)  # (nl, 3E)
            o_w = stack(lambda l: sa(l)["out_proj"]["kernel"])
            o_b = stack(lambda l: sa(l)["out_proj"]["bias"])
            ln_s = jnp.stack([stack(lambda l: l["norm1"]["scale"]),
                              stack(lambda l: l["norm2"]["scale"])], axis=1)  # (nl, 2, E)
            ln_b = jnp.stack([stack(lambda l: l["norm1"]["bias"]),
                              stack(lambda l: l["norm2"]["bias"])], axis=1)
            m1_w = stack(lambda l: l["mlp"]["linear1"]["kernel"])
            m1_b = stack(lambda l: l["mlp"]["linear1"]["bias"])
            m2_w = stack(lambda l: l["mlp"]["linear2"]["kernel"])
            m2_b = stack(lambda l: l["mlp"]["linear2"]["bias"])
            pos = np.zeros((tp, E), np.float32)
            pos[:tokens] = sinusoidal_table(tokens, E)
            self.specs.append((tokens, tp, ps * C))
            self.weights += [emb_w, emb_b, jnp.asarray(pos, dtype), qkv_w, qkv_b,
                             o_w, o_b, ln_s, ln_b, m1_w, m1_b, m2_w, m2_b]

        self.gs_table = None
        self.num_states = 0
        if cfg.use_gamestate:
            self.gs_table = jnp.asarray(
                params["game_state_encoder"]["embedding"]["embedding"], dtype)
            self.num_states = self.gs_table.shape[0]

    def encode(self, batch: dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Same contract as ``DiffusionPolicy.encode_context`` for the
        proprioceptive modalities."""
        ps = self.patch_size
        b = batch[self.batch_keys[0]].shape[0]
        R = min(self.block_robots, b)
        if b % R != 0:
            raise ValueError(f"batch {b} not divisible by block_robots {R}")
        nb = b // R
        E = self.cfg.hidden_dim

        kernel = _make_encoder_kernel(self.specs, self.num_heads, self.head_dim,
                                      E, self.gs_table is not None, self.num_states)

        operands = []
        in_specs = []
        out_specs = []
        out_shapes = []
        for key, (tokens, tp, in_dim) in zip(self.batch_keys, self.specs):
            x = batch[key].astype(self.dtype)
            if ps > 1:  # fold non-overlapping patches into the feature dim
                x = x.reshape(b, tokens, in_dim)
            if tp > tokens:
                x = jnp.pad(x, ((0, 0), (0, tp - tokens), (0, 0)))
            operands.append(x)
            in_specs.append(pl.BlockSpec((R, tp, in_dim), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
            out_specs.append(pl.BlockSpec((R, tp, E), lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct((b, tp, E), self.dtype))
        if self.gs_table is not None:
            onehot = jax.nn.one_hot(batch["game_state"].astype(jnp.int32),
                                    self.num_states, dtype=self.dtype)
            operands.append(jnp.broadcast_to(onehot[:, None, :],
                                             (b, _GS_ROWS, self.num_states)))
            in_specs.append(pl.BlockSpec((R, _GS_ROWS, self.num_states),
                                         lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
            out_specs.append(pl.BlockSpec((R, _GS_ROWS, E), lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct((b, _GS_ROWS, E), self.dtype))
        operands += self.weights
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(self.weights)
        if self.gs_table is not None:
            operands.append(self.gs_table)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

        outs = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )(*operands)

        pieces = [o[:, :tokens] for o, (tokens, _, _) in zip(outs, self.specs)]
        if self.gs_table is not None:
            pieces.append(outs[-1][:, :1])
        return jnp.concatenate(pieces, axis=1)
