"""Typed configuration for soccerdiffusion_tpu.

The flat key names intentionally match the reference's YAML configs
(reference ml/training/config/default.yaml:1-29) so checkpoints embed an
identical hyperparameter dict and reference configs load unmodified.
Late-added reference keys keep the same `get(..., default)` back-compat
semantics (reference ml/training/train.py:133-134, ml/inference/ros.py:56-57).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

# Canonical 22-joint schema (reference dataset/models.py:222-247). The
# reference has a latent 20-vs-22 inconsistency between the schema and its
# configs (SURVEY.md §2.3); here the joint list is derived from num_joints so
# there is a single source of truth.
CANONICAL_JOINT_NAMES_22 = (
    "HeadPan",
    "HeadTilt",
    "LAnklePitch",
    "LAnkleRoll",
    "LElbow",
    "LElbowYaw",
    "LHipPitch",
    "LHipRoll",
    "LHipYaw",
    "LKnee",
    "LShoulderPitch",
    "LShoulderRoll",
    "RAnklePitch",
    "RAnkleRoll",
    "RElbow",
    "RElbowYaw",
    "RHipPitch",
    "RHipRoll",
    "RHipYaw",
    "RKnee",
    "RShoulderPitch",
    "RShoulderRoll",
)

# The 20-joint subset used by every shipped reference config (no elbow yaw;
# reference ml/training/config/default.yaml:12 `num_joints: 20`).
CANONICAL_JOINT_NAMES_20 = tuple(n for n in CANONICAL_JOINT_NAMES_22 if not n.endswith("ElbowYaw"))

VALID_IMAGE_ENCODERS = ("resnet18", "resnet50", "vit", "swin_transformer_tiny", "swin_transformer_small")
VALID_SEQUENCE_ENCODERS = ("transformer", "none")
VALID_IMU_METHODS = ("quaternion", "five_dim")


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (reference ml/model/model.py:17-121 ctor args)."""

    num_joints: int = 20
    hidden_dim: int = 128
    trajectory_prediction_length: int = 10
    encoder_patch_size: int = 1
    # Action history encoder
    use_action_history: bool = True
    num_action_history_encoder_layers: int = 2
    action_context_length: int = 100
    # IMU encoder
    use_imu: bool = True
    imu_orientation_embedding_method: str = "quaternion"
    num_imu_encoder_layers: int = 2
    imu_context_length: int = 100
    # Joint state encoder
    use_joint_states: bool = True
    joint_state_encoder_layers: int = 2
    joint_state_context_length: int = 100
    # Image encoder
    use_images: bool = True
    image_encoder_type: str = "resnet18"
    image_sequence_encoder_type: str = "transformer"
    num_image_sequence_encoder_layers: int = 1
    image_context_length: int = 10
    image_use_final_avgpool: bool = False
    image_resolution: int = 224
    # Game state encoder
    use_gamestate: bool = True
    # Denoising decoder
    num_decoder_layers: int = 4
    num_decoder_heads: int = 4  # every reference config uses 4 (model.py:115)
    # TPU-native knobs (no reference counterpart)
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    # Auxiliary cue-regression head on the newest per-frame image token
    # (models/policy.py predict-cue pathway): a Dense(1) trained against
    # the "vision" dummy task's latent (TrainConfig.aux_cue_weight) to
    # force the image encoder to learn cue extraction the diffusion loss
    # alone was measured not to teach at ledger budgets (round 4,
    # docs/quality_ledger_vision_r4a.md). Inference ignores it.
    aux_cue_head: bool = False
    # "auto" | "xla" | "pallas" | "ring" — "ring" enables sequence
    # parallelism over a mesh "seq" axis (parallel/ring_attention.py):
    # encoder self-attention rides the ring, the denoiser's cross-attention
    # uses the head-sharded form, anything unshardable falls back to XLA
    attention_impl: str = "auto"
    # remat the per-frame image-encoder blocks in backward (HBM-traffic
    # optimization for the bandwidth-bound image configs; perf_notes.md).
    # True = full recompute (store only frame inputs; one extra forward in
    # the backward). "conv_only" (conv encoders) = SELECTIVE: conv outputs
    # are saved (jax.checkpoint save_only_these_names) and only the cheap
    # BN/ReLU elementwise chain is recomputed — ~1/3 the stored
    # activations of no-remat at near-zero recompute FLOPs, the middle
    # point that lets the ResNet configs run B=128 without paying the
    # full-replay forward (round-5 conv-stack lever).
    remat_image_encoder: bool | str = False
    # ViT image-encoder geometry (TPU-native; no reference counterpart).
    # Defaults keep the round-1 geometry numbers; note round-2 renamed the
    # ViT patch-embed params (patch_embed conv -> patch_kernel/patch_bias
    # matmul, models/vision.py), a deliberate pre-release break — round-1
    # ViT checkpoints do NOT load without a manual rename/reshape. The
    # flagship yaml overrides to patch 28 / width 256 / depth 8 — at
    # patch 16 a 224px frame is 196 tokens whose f32 attention scores cost
    # ~50 GB/step of HBM traffic in training (docs/perf_notes.md), while
    # patch 28 (64 tokens, a sublane-tile multiple — the fused block's
    # head stack/merge become free tile remaps) keeps them negligible and
    # width 256 fills the 128-lane MXU tile (round-3 ladder: 43.9% vs
    # 34.7% MFU over patch 32). image_resolution must be divisible by
    # the patch.
    vit_patch_size: int = 16
    vit_width: int = 192
    vit_depth: int = 6
    # Run each ViT block as ONE fused Pallas program with a custom-VJP
    # backward that recomputes in VMEM (ops/fused_vit_block.py): the
    # activation stream never touches HBM, the structural fix for the
    # HBM-bound image-training roofline (docs/perf_notes.md).
    vit_fused_block: bool = False
    # frames per fused-block Pallas program (VMEM/grid trade-off)
    vit_fused_block_frames: int = 8
    # fused-kernel GELU numerics: "exact" (erf), "poly" (FMA-only
    # minimax, |err| <= 3.4e-4 fwd / 1.8e-3 grad; measured perf-NEUTRAL
    # on v5e — docs/perf_notes.md round 3), "quick" (quick-GELU
    # z*sigmoid(1.702z), the CLIP activation — ~6 elementwise passes vs
    # ~12+, differs from exact GELU by <=2.1e-2; an activation
    # SUBSTITUTION, train/serve with the same setting), or "bf16"
    # (quick-GELU evaluated on compute_dtype STORAGE arrays — i.e. bf16
    # under the standard compute_dtype: bfloat16; with float32 compute it
    # degenerates to "quick". Measured perf-identical to "quick" on
    # v5e — the chain is pass-count-bound, not byte-bound)
    vit_fused_gelu: str = "exact"
    # fused-kernel attention formulation: "stacked" ((F, HT, T) head-
    # stacked scores) or "headloop" (rank-3 per-head dots, no stack/merge
    # copies or misaligned (FT, W) reshapes) — numerically identical
    vit_fused_layout: str = "stacked"
    # Run the proprioceptive context encoders' transformer blocks (action
    # history / IMU / joint states) through the same fused Pallas fwd+bwd
    # program (ops/fused_vit_block.py). Their per-layer tensors are small,
    # so this mainly collapses the many small HBM-bound XLA fusions in the
    # non-ViT step remainder (docs/perf_notes.md round 3: the flat ~25 ms
    # depth-0 profile). Ignores attention_impl inside the fused blocks.
    encoder_fused_block: bool = False
    # batch rows per fused-encoder Pallas program
    encoder_fused_block_rows: int = 16
    # Run each proprioceptive encoder's WHOLE stack as one fused Pallas
    # fwd+bwd program with per-layer weights stacked on a leading axis
    # (ops/fused_encoder_stack.py) — 3 fwd + 3 bwd programs replace the
    # remainder's largest flat slice (benchmarks/mfu_remainder_ablate.sh),
    # where per-LAYER fused programs (encoder_fused_block) were a
    # measured refutation. Uses encoder_fused_block_rows as the block.
    encoder_fused_stack: bool = False
    # rematerialize denoising-decoder layers in backward (drops the stored
    # per-layer cross K/V over the (B, S, hidden) context from the HBM
    # activation stream; training-path knob)
    remat_decoder: bool = False
    # Run each denoising-decoder layer as ONE fused Pallas fwd+bwd program
    # with a custom-VJP backward that recomputes in VMEM
    # (ops/fused_decoder_layer.py): no decoder intermediate — the per-layer
    # cross K/V over the (B, S, hidden) context included — ever exists in
    # HBM. Training-path knob (takes precedence over remat_decoder);
    # serving with cached context K/V keeps the plain math on the same
    # params.
    decoder_fused_block: bool = False
    # batch rows per fused-decoder-layer Pallas program
    decoder_fused_block_rows: int = 32

    def __post_init__(self) -> None:
        if self.imu_orientation_embedding_method not in VALID_IMU_METHODS:
            raise ValueError(f"unknown imu_orientation_embedding_method: {self.imu_orientation_embedding_method}")
        if self.use_images and self.image_encoder_type not in VALID_IMAGE_ENCODERS:
            raise ValueError(f"unknown image_encoder_type: {self.image_encoder_type}")
        if self.use_images and self.image_sequence_encoder_type not in VALID_SEQUENCE_ENCODERS:
            raise ValueError(f"unknown image_sequence_encoder_type: {self.image_sequence_encoder_type}")
        if (self.use_images and self.image_encoder_type == "vit"
                and self.image_resolution % self.vit_patch_size != 0):
            raise ValueError(
                f"image_resolution {self.image_resolution} not divisible by "
                f"vit_patch_size {self.vit_patch_size} (the reshape-based "
                f"patch embed has no VALID-conv cropping)")
        if self.vit_fused_gelu not in ("exact", "poly", "quick", "bf16"):
            raise ValueError(f"unknown vit_fused_gelu: {self.vit_fused_gelu}")
        if self.vit_fused_layout not in ("stacked", "headloop"):
            raise ValueError(f"unknown vit_fused_layout: {self.vit_fused_layout}")
        if self.encoder_fused_block and self.attention_impl == "ring":
            raise ValueError(
                "encoder_fused_block runs attention inside the Pallas "
                "program and cannot be combined with attention_impl='ring'")
        if self.encoder_fused_stack and self.attention_impl == "ring":
            raise ValueError(
                "encoder_fused_stack runs attention inside the Pallas "
                "program and cannot be combined with attention_impl='ring'")
        if self.decoder_fused_block and self.attention_impl == "ring":
            raise ValueError(
                "decoder_fused_block runs attention inside the Pallas "
                "program and cannot be combined with attention_impl='ring'")

    @property
    def imu_input_dim(self) -> int:
        # quaternion: 4, five_dim (axis + sin/cos): 5 (reference encoder/imu.py:39-44)
        return 4 if self.imu_orientation_embedding_method == "quaternion" else 5

    @property
    def joint_names(self) -> tuple[str, ...]:
        if self.num_joints == len(CANONICAL_JOINT_NAMES_22):
            return CANONICAL_JOINT_NAMES_22
        if self.num_joints == len(CANONICAL_JOINT_NAMES_20):
            return CANONICAL_JOINT_NAMES_20
        return tuple(f"joint_{i}" for i in range(self.num_joints))


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference config/default.yaml + train.py)."""

    epochs: int = 10
    batch_size: int = 64
    lr: float = 1e-4
    train_denoising_timesteps: int = 1000
    num_normalization_samples: int = 1000
    distill_teacher_inference_steps: int = 30
    # TPU-native knobs
    seed: int = 0
    weight_decay: float = 1e-2  # torch AdamW default (reference train.py:162)
    log_every: int = 20  # reference train.py:231
    mesh_shape: dict[str, int] = field(default_factory=dict)  # {} = all devices on "data"
    # run the (elementwise) AdamW update on the raveled parameter vector:
    # identical numerics, ~8 large fusions instead of ~8 per param tensor
    # (training/flat_optim.py). Optimizer state becomes one flat mu/nu
    # pair — checkpoints do not interchange with flat_optimizer: false.
    flat_optimizer: bool = False
    # Exponential-moving-average of the params, maintained in the jitted
    # step (0 = off; 0.999-0.9999 typical). When a checkpoint carries an
    # EMA tree, inference/eval serve the EMA weights — the same policy the
    # reference applies to its ema_pytorch checkpoints (reference
    # utils/embed_parameters.py:50-62 extracts the EMA model for serving).
    ema_decay: float = 0.0
    # Synthetic-backend task for --dummy-data runs (data/dummy.py):
    # "decorative" (reference-style content) or "vision" (images preview
    # the target — the camera-conditioned quality-evidence task)
    dummy_task: str = "decorative"
    # CFG-style per-sample conditioning dropout: with this probability,
    # independently per modality, a training sample sees that modality's
    # "missing data" padding value instead of the real input
    # (data/pipeline.py dropout_modalities). 0 = off (reference behavior).
    modality_dropout: float = 0.0
    # Camera-credit levers (round-4: make the policy demonstrably USE its
    # camera on camera-cued data; docs/quality_ledger_vision_oracle.md
    # shows the learnable signal lives almost entirely in the ~10% of
    # windows whose stamp coincides with a frame arrival):
    # fraction of each training epoch drawn (with replacement) from the
    # image-BOUNDARY windows (data/dataset.py image_boundary_indices) —
    # 0 = uniform windows (reference behavior)
    boundary_oversample: float = 0.0
    # learning-rate multiplier for the image_sequence_encoder subtree
    # (per-module update scaling in training/trainer.py make_optimizer);
    # 1.0 = single LR (reference behavior)
    image_encoder_lr_mult: float = 1.0
    # global-norm gradient clipping before AdamW (0 = off, the reference
    # behavior). Observed need: the aux-cue-head vision run blew up at
    # OneCycle peak LR (healthy aux 1e-4 -> 0.4 at step ~2700, round 4).
    grad_clip_norm: float = 0.0
    # weight of the auxiliary cue-regression loss (needs
    # ModelConfig.aux_cue_head and a dataset exposing "vision_u" labels —
    # the camera-cued dummy task). Combines with modality_dropout:
    # dropout_modalities zeroes vision_u_valid for samples whose images
    # were nulled, so the cue head never regresses real labels against
    # blank frames. 0 = off.
    aux_cue_weight: float = 0.0

    def __post_init__(self) -> None:
        if not 0.0 <= self.modality_dropout < 1.0:
            raise ValueError(
                f"modality_dropout must be in [0, 1), got {self.modality_dropout}"
            )
        if not 0.0 <= self.boundary_oversample < 1.0:
            raise ValueError(
                f"boundary_oversample must be in [0, 1), got "
                f"{self.boundary_oversample}")
        if self.image_encoder_lr_mult <= 0.0:
            raise ValueError(
                f"image_encoder_lr_mult must be > 0, got "
                f"{self.image_encoder_lr_mult}")
        if self.grad_clip_norm < 0.0:
            raise ValueError(
                f"grad_clip_norm must be >= 0, got {self.grad_clip_norm}")


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    # ---- flat-dict round trip (checkpoint-embedded hyperparams contract) ----

    @classmethod
    def from_dict(cls, params: dict[str, Any]) -> "Config":
        """Build from a flat reference-style hyperparameter dict."""
        params = dict(params)
        model_kwargs: dict[str, Any] = {}
        train_kwargs: dict[str, Any] = {}
        model_fields = {f.name for f in dataclasses.fields(ModelConfig)}
        train_fields = {f.name for f in dataclasses.fields(TrainConfig)}
        for key, value in params.items():
            if key in model_fields:
                model_kwargs[key] = value
            elif key in train_fields:
                train_kwargs[key] = value
            # Unknown keys are tolerated, matching params.get(...) semantics in
            # the reference (train.py:90-92).
        return cls(model=ModelConfig(**model_kwargs), train=TrainConfig(**train_kwargs))

    def to_dict(self) -> dict[str, Any]:
        """Flat dict with reference-compatible key names, embedded in checkpoints."""
        flat = dataclasses.asdict(self.model)
        flat.update(dataclasses.asdict(self.train))
        return flat

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        import yaml

        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))
