"""The flagship model: multimodal conditional diffusion policy.

Counterpart of the reference's ``End2EndDiffusionTransformer``
(reference ml/model/model.py:16-179), re-designed as a pure flax module:

  * ``encode_context(batch)`` returns the concatenated context tokens in the
    reference's canonical modality order — action history, IMU, joint
    states, images, game state (reference model.py:135-144) — so it can be
    computed once and reused across all denoising steps (the factorization
    that makes 30-step teacher supervision and real-time serving affordable;
    reference model.py:123-148, distill.py:177).
  * ``denoise(context, noisy_chunk, t)`` appends the diffusion step token
    and runs the cross-attending denoiser (reference model.py:159-179).
  * ``__call__(batch, noisy_chunk, t)`` = encode + denoise.

Batch dict contract (keys are behavioral API, reference dataset/pytorch.py:43-49):
  joint_command_history (B, A, J)  | rotation (B, I, 4|5)
  joint_state           (B, S, J)  | image_data (B, F, H, W, 3) channels-last
  game_state            (B,) int32

Note images are NHWC here (TPU-native layout) where the reference uses NCHW;
the fidelity tests transpose at the boundary.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.models.decoder import DiffusionActionGenerator
from soccerdiffusion_tpu.models.embeddings import StepToken
from soccerdiffusion_tpu.models.encoders import GameStateEncoder, IMUEncoder, JointEncoder
from soccerdiffusion_tpu.models.vision import ImageSequenceEncoder


class DiffusionPolicy(nn.Module):
    config: ModelConfig

    @property
    def dtype(self) -> Any:
        return jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32

    def setup(self) -> None:
        cfg = self.config
        common = dict(dtype=self.dtype, attention_impl=cfg.attention_impl)
        # fused Pallas blocks for the proprioceptive encoder stacks
        # (ops/fused_vit_block.py; encoder_fused_block config)
        prop = dict(fused_block=cfg.encoder_fused_block,
                    fused_block_rows=cfg.encoder_fused_block_rows,
                    fused_stack=cfg.encoder_fused_stack)
        self.step_encoding = StepToken(cfg.hidden_dim, dtype=self.dtype)
        if cfg.use_action_history:
            self.action_history_encoder = JointEncoder(
                num_joints=cfg.num_joints, hidden_dim=cfg.hidden_dim,
                patch_size=cfg.encoder_patch_size,
                num_layers=cfg.num_action_history_encoder_layers,
                max_seq_len=cfg.action_context_length, **common, **prop,
            )
        if cfg.use_imu:
            self.imu_encoder = IMUEncoder(
                input_dim=cfg.imu_input_dim, hidden_dim=cfg.hidden_dim,
                patch_size=cfg.encoder_patch_size,
                num_layers=cfg.num_imu_encoder_layers,
                max_seq_len=cfg.imu_context_length, **common, **prop,
            )
        if cfg.use_joint_states:
            self.joint_states_encoder = JointEncoder(
                num_joints=cfg.num_joints, hidden_dim=cfg.hidden_dim,
                patch_size=cfg.encoder_patch_size,
                num_layers=cfg.joint_state_encoder_layers,
                max_seq_len=cfg.joint_state_context_length, **common, **prop,
            )
        if cfg.use_images:
            self.image_sequence_encoder = ImageSequenceEncoder(
                hidden_dim=cfg.hidden_dim, encoder_type=cfg.image_encoder_type,
                sequence_encoder_type=cfg.image_sequence_encoder_type,
                num_layers=cfg.num_image_sequence_encoder_layers,
                max_seq_len=cfg.image_context_length,
                use_final_avgpool=cfg.image_use_final_avgpool,
                remat=cfg.remat_image_encoder,
                vit_geometry=(cfg.vit_patch_size, cfg.vit_width, cfg.vit_depth),
                vit_fused_block=cfg.vit_fused_block,
                vit_fused_block_frames=cfg.vit_fused_block_frames,
                vit_fused_gelu=cfg.vit_fused_gelu,
                vit_fused_layout=cfg.vit_fused_layout,
                seq_fused_stack=cfg.encoder_fused_stack,
                seq_fused_rows=cfg.encoder_fused_block_rows,
                **common,
            )
        if cfg.use_gamestate:
            self.game_state_encoder = GameStateEncoder(cfg.hidden_dim, dtype=self.dtype)
        if cfg.use_images and cfg.aux_cue_head:
            # auxiliary cue-regression head (see ModelConfig.aux_cue_head)
            self.cue_head = nn.Dense(1, name="cue_head")
        self.diffusion_action_generator = DiffusionActionGenerator(
            num_joints=cfg.num_joints, hidden_dim=cfg.hidden_dim,
            num_layers=cfg.num_decoder_layers,
            num_heads=cfg.num_decoder_heads,
            max_seq_len=cfg.trajectory_prediction_length,
            remat=cfg.remat_decoder,
            fused_block=cfg.decoder_fused_block,
            fused_block_rows=cfg.decoder_fused_block_rows, **common,
        )

    def encode_context(self, batch: dict[str, jnp.ndarray], train: bool = True) -> jnp.ndarray:
        """Concatenated (B, S, hidden) context tokens, canonical modality order."""
        return self._context_impl(batch, train, want_frame_tokens=False)[0]

    def _context_impl(self, batch, train: bool, want_frame_tokens: bool):
        """Shared body of encode_context; ``want_frame_tokens=True``
        additionally returns the PRE-sequence per-frame image tokens
        (B, F, hidden) — the aux-cue-head tap (frames |> sequence is
        numerically identical to the single full pass, models/vision.py
        mode contract)."""
        cfg = self.config
        context = []
        frame_tokens = None
        if cfg.use_action_history:
            context.append(self.action_history_encoder(batch["joint_command_history"].astype(self.dtype)))
        if cfg.use_imu:
            context.append(self.imu_encoder(batch["rotation"].astype(self.dtype)))
        if cfg.use_joint_states:
            context.append(self.joint_states_encoder(batch["joint_state"].astype(self.dtype)))
        if cfg.use_images:
            if "image_tokens" in batch:
                # serving-side token cache (inference/controller.py): the
                # per-frame encodings were computed as each frame ARRIVED;
                # only the frame-sequence encoder runs per replan.
                # Numerically identical to the image_data path.
                frame_tokens = batch["image_tokens"]
                context.append(self.image_sequence_encoder(
                    frame_tokens, train=train, mode="sequence"))
            elif want_frame_tokens:
                x, valid = ((batch["image_u8"], batch["image_valid"])
                            if "image_u8" in batch
                            else (batch["image_data"].astype(self.dtype), None))
                frame_tokens = self.image_sequence_encoder(
                    x, train=train, valid=valid, mode="frames")
                context.append(self.image_sequence_encoder(
                    frame_tokens, train=train, mode="sequence"))
            elif "image_u8" in batch:
                # raw packed uint8 path: normalization folded into the
                # encoder (vit) or applied in-jit (others); avoids
                # materializing full-image float tensors (perf_notes.md)
                context.append(self.image_sequence_encoder(
                    batch["image_u8"], train=train, valid=batch["image_valid"]))
            else:
                context.append(self.image_sequence_encoder(
                    batch["image_data"].astype(self.dtype), train=train))
        if cfg.use_gamestate:
            context.append(self.game_state_encoder(batch["game_state"].astype(jnp.int32)))
        if not context:
            # decoder_only tier: every encoder disabled — the denoiser
            # conditions on the step token alone (reference
            # config/decoder_only.yaml + model.py:173-176, where the context
            # list may be empty).
            bsz = batch["joint_command"].shape[0]
            return jnp.zeros((bsz, 0, cfg.hidden_dim), dtype=self.dtype), None
        return jnp.concatenate(context, axis=1), frame_tokens

    def forward_with_cue(self, batch: dict[str, jnp.ndarray],
                         noisy_chunk: jnp.ndarray, t: jnp.ndarray,
                         train: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
        """``(eps, cue)``: the standard forward plus the aux cue-head
        regression from the NEWEST per-frame image token — sharing the
        frame encoder compute with the main pathway. Training-only
        (TrainConfig.aux_cue_weight); requires ModelConfig.aux_cue_head."""
        context, frame_tokens = self._context_impl(batch, train,
                                                   want_frame_tokens=True)
        eps = self.denoise(context, noisy_chunk, t)
        cue = self.cue_head(frame_tokens[:, -1].astype(jnp.float32))[..., 0]
        return eps, cue

    def encode_image_frames(self, frames: jnp.ndarray,
                            valid: jnp.ndarray | None = None,
                            train: bool = False) -> jnp.ndarray:
        """Per-frame image tokens (B, K, hidden) WITHOUT the frame-sequence
        encoder — the cacheable half of the image pathway. Serving encodes
        each camera frame once on arrival (10 Hz) and replans against the
        cached token buffer via ``encode_context({"image_tokens": ...})``
        (the reference re-encodes the whole frame stack every 200 ms step,
        ml/inference/ros.py:177-203 + 287-313)."""
        return self.image_sequence_encoder(frames, train=train, valid=valid,
                                           mode="frames")

    def denoise(self, context: jnp.ndarray, noisy_chunk: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """Predict epsilon for the noisy action chunk given context tokens."""
        step_token = self.step_encoding(t)
        full_context = jnp.concatenate([context, step_token], axis=1)
        out = self.diffusion_action_generator(noisy_chunk.astype(self.dtype), full_context)
        return out.astype(jnp.float32)

    def precompute_context_kv(self, context: jnp.ndarray) -> list:
        """Per-layer cross-attention K/V of the static context tokens.

        Serving-path optimization with no reference counterpart: the
        context's K/V projections are identical across all denoising steps
        (only the step token changes), so they are projected once per chunk.
        """
        return self.diffusion_action_generator.compute_context_kv(context)

    def denoise_with_kv(self, context_kv: list, noisy_chunk: jnp.ndarray,
                        t: jnp.ndarray) -> jnp.ndarray:
        """``denoise`` against cached context K/V; only the per-step step
        token is projected fresh. Numerically identical to ``denoise``."""
        step_token = self.step_encoding(t)
        out = self.diffusion_action_generator(
            noisy_chunk.astype(self.dtype), step_token, context_kv
        )
        return out.astype(jnp.float32)

    def __call__(
        self,
        batch: dict[str, jnp.ndarray],
        noisy_chunk: jnp.ndarray,
        t: jnp.ndarray,
        train: bool = True,
    ) -> jnp.ndarray:
        return self.denoise(self.encode_context(batch, train=train), noisy_chunk, t)
