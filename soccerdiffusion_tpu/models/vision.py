"""Image encoders: ResNet-18/50, ViT, and the image *sequence* encoder.

The ResNets mirror torchvision's architecture (the reference instantiates
torchvision resnet18/resnet50 and replaces the head; reference
ml/model/encoder/image.py:64-83) but are laid out channels-last (NHWC) —
the natural TPU layout — with BatchNorm running statistics in the
``batch_stats`` collection. Weights converted from torchvision checkpoints
can be loaded via ``soccerdiffusion_tpu.utils.torch_port``.

The ViT encoder is a TPU-native addition (BASELINE.json config[2]): a
patchified pre-norm transformer that maps far better onto the MXU than
ResNet's small convolutions while exposing the same (B, T, hidden) token
interface.

The sequence encoder folds (B, T, H, W, C) -> (B*T, H, W, C), encodes each
frame, and optionally runs a small transformer across time
(reference image.py:31-52, :103-121).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from soccerdiffusion_tpu.models.embeddings import PositionalEncoding
from soccerdiffusion_tpu.models.encoders import SequenceEncoder
from soccerdiffusion_tpu.models.transformer import TransformerEncoder


class SavedStatsBatchNorm(nn.BatchNorm):
    """``nn.BatchNorm`` whose batch statistics carry a ``checkpoint_name``.

    Math, parameter layout and ``batch_stats`` collection are identical to
    flax's BatchNorm (same scale/bias params, same mean/var running stats,
    same f32 fast-variance reduction) — this subclass only tags the
    computed per-batch mean/var as ``"bn_stats"``. Why: the measured
    default_tpu (ResNet18-224, B=128, full-remat) step spends ~44 ms of
    202.7 ms device time in ``convert_reduce_fusion`` BN-statistics
    reductions, and full remat computes them TWICE. Under
    ``remat_image_encoder="conv_only"`` the stats (tiny (C,) vectors) are
    saved alongside the conv outputs, so the backward's recompute is pure
    elementwise normalize/ReLU — no second pass over the (N,H,W,C)
    activations for reductions. Transparent everywhere else
    (``checkpoint_name`` is identity outside a remat policy).
    """

    @nn.compact
    def __call__(self, x, use_running_average=None, *, mask=None):
        from flax.linen.normalization import (
            _canonicalize_axes,
            _compute_stats,
            _normalize,
        )

        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feature_axes = _canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim)
                               if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]
        stats_dtype = (jnp.float32 if self.force_float32_reductions
                       else self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, stats_dtype),
                                feature_shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, stats_dtype),
                               feature_shape)
        if use_running_average:
            mean = (ra_mean.value if self.force_float32_reductions
                    else jnp.asarray(ra_mean.value, self.param_dtype))
            var = (ra_var.value if self.force_float32_reductions
                   else jnp.asarray(ra_var.value, self.param_dtype))
        else:
            mean, var = _compute_stats(
                x, reduction_axes, dtype=self.dtype,
                axis_name=self.axis_name if not self.is_initializing()
                else None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance, mask=mask,
                force_float32_reductions=self.force_float32_reductions)
            mean = checkpoint_name(mean, "bn_stats")
            var = checkpoint_name(var, "bn_stats")
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        return _normalize(
            self, x, mean, var, reduction_axes, feature_axes, self.dtype,
            self.param_dtype, self.epsilon, self.use_bias, self.use_scale,
            self.bias_init, self.scale_init, self.force_float32_reductions)


class BasicBlock(nn.Module):
    """ResNet-18/34 residual block: 3x3 conv, BN, relu, 3x3 conv, BN, +skip."""

    filters: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(SavedStatsBatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype)
        # "conv_out" names mark the expensive (MXU) outputs as the saveable
        # set for remat_image_encoder="conv_only" (jax.checkpoint
        # save_only_these_names): the backward keeps every conv output and
        # recomputes only the cheap BN/ReLU elementwise chain. Transparent
        # (identity) under any other remat setting.
        residual = x
        y = conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                 padding=[(1, 1), (1, 1)], name="conv1")(x)
        y = checkpoint_name(y, "conv_out")
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = checkpoint_name(y, "conv_out")
        y = norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = conv(self.filters, (1, 1), strides=(self.strides, self.strides),
                            name="downsample_conv")(residual)
            residual = checkpoint_name(residual, "conv_out")
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    """ResNet-50 bottleneck block: 1x1 -> 3x3 -> 1x1 (4x expansion)."""

    filters: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(SavedStatsBatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype)
        residual = x
        y = conv(self.filters, (1, 1), name="conv1")(x)
        y = nn.relu(norm(name="bn1")(checkpoint_name(y, "conv_out")))
        y = conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                 padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = nn.relu(norm(name="bn2")(checkpoint_name(y, "conv_out")))
        y = conv(self.filters * 4, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(checkpoint_name(y, "conv_out"))
        if residual.shape != y.shape:
            residual = conv(self.filters * 4, (1, 1), strides=(self.strides, self.strides),
                            name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(
                checkpoint_name(residual, "conv_out"))
        return nn.relu(y + residual)


class ResNetImageEncoder(nn.Module):
    """torchvision-compatible ResNet trunk with the reference's head variants.

    Head (reference image.py:69-83): if ``use_final_avgpool``, global average
    pool + Dense(hidden); else a 1x1 conv to 32 channels over the final
    spatial map, flattened, + Dense(hidden).
    Input: (N, H, W, 3) ImageNet-normalized float. Output: (N, hidden).
    """

    hidden_dim: int
    stage_sizes: Sequence[int] = (2, 2, 2, 2)  # resnet18; resnet50 = (3, 4, 6, 3)
    bottleneck: bool = False
    use_final_avgpool: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        block = BottleneckBlock if self.bottleneck else BasicBlock
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = checkpoint_name(x, "conv_out")
        x = SavedStatsBatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, num_blocks in enumerate(self.stage_sizes):
            for i in range(num_blocks):
                strides = 2 if stage > 0 and i == 0 else 1
                x = block(64 * 2**stage, strides=strides, dtype=self.dtype,
                          name=f"layer{stage + 1}_{i}")(x, train)
        if self.use_final_avgpool:
            x = jnp.mean(x, axis=(1, 2))
        else:
            x = nn.Conv(32, (1, 1), dtype=self.dtype, name="spatial_head_conv")(x)
            x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc")(x)


class ViTImageEncoder(nn.Module):
    """TPU-native patchified transformer image encoder (no reference
    counterpart; BASELINE.json config[2] 'camera-image ViT encoder').

    NOTE (round 2): the patch embed changed from an nn.Conv
    ("patch_embed", kernel (P, P, C, width)) to an explicit reshape+dot
    ("patch_kernel" (P*P*C, width) / "patch_bias") so raw-uint8 input can
    fold the normalization into the weights; pre-change ViT checkpoints
    need their conv kernel reshaped/renamed to load (pre-release break,
    no shim).

    16x16 patch conv -> +pos -> pre-norm blocks (ff = 4x width) -> mean pool
    -> LN -> Dense(hidden). Patch matmuls are large and MXU-friendly.
    """

    hidden_dim: int
    patch_size: int = 16
    width: int = 192
    depth: int = 6
    num_heads: int = 4
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    remat: bool = False
    # run blocks through the fused Pallas fwd+bwd program
    # (ops/fused_vit_block.py) — the HBM-traffic fix for training MFU
    fused_block: bool = False
    fused_block_frames: int = 8
    fused_gelu: str = "exact"
    fused_layout: str = "stacked"

    def _patchify(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W, C) -> (N, patches, P*P*C) via reshape/transpose — the
        conv-free patch extraction XLA lowers to one transpose instead of
        the conv path's repeated full-image relayouts (perf_notes.md).

        Runs in the INPUT dtype on purpose: for raw-uint8 frames the
        relayout then moves 1-byte elements and the bf16 convert fuses
        into the patch-embed GEMM, instead of materializing and
        transposing a 2x bigger bf16 image tensor (profiled: the
        cast-then-patchify order cost ~13 ms/step of pure copies at the
        flagship geometry — the largest single chunk of the non-ViT
        step remainder). u8 -> bf16 is exact (integers < 2^8), so the
        order change is bit-identical."""
        n, h, w, c = x.shape
        p = self.patch_size
        x = x.reshape(n, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(n, (h // p) * (w // p), p * p * c)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
        """Encode frames. ``x`` is either normalized float images
        (N, H, W, 3), or — when ``valid`` is given — RAW uint8 frames: the
        [0,1] scale + ImageNet normalization (data/pipeline.py
        device_normalize_images) is folded algebraically into the
        patch-embed weights, so no full-image float tensor is ever
        materialized, and ``valid`` (N,) zeroes padded frames by resetting
        their tokens to the patch-embed bias (the exact value a zero image
        produces)."""
        from soccerdiffusion_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

        p = self.patch_size
        if x.ndim == 3:
            # PRE-PATCHIFIED frames (N, patches, P*P*C) — the production
            # packed layout (data/pipeline.patchify_frames): the on-device
            # patchify transpose disappears and the uint8 -> bf16 convert
            # fuses into the patch-embed GEMM. Profiled: the device-side
            # relayouts of the (B, F, 224, 224, 3) tensor cost ~8-13 ms
            # per flagship step (benchmarks/profile_train_step.py).
            n, num_patches, pk = x.shape
            c = pk // (p * p)
        else:
            n, h, w, c = x.shape
            num_patches = (h // p) * (w // p)
        kernel = self.param("patch_kernel", nn.initializers.lecun_normal(),
                            (p * p * c, self.width), jnp.float32)
        bias = self.param("patch_bias", nn.initializers.zeros,
                          (self.width,), jnp.float32)
        if valid is not None:
            # fold (u8/255 - mean)/std into the weights: per input channel
            # scale 1/(255*std_c) on the kernel rows, and the constant
            # -mean_c/std_c term into the bias.
            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
            std = jnp.asarray(IMAGENET_STD, jnp.float32)
            row_scale = jnp.tile(1.0 / (255.0 * std), p * p)  # (p*p*c,)
            k_fold = (kernel * row_scale[:, None]).astype(self.dtype)
            b_fold = bias - jnp.tile(mean / std, p * p) @ kernel
            patches = x if x.ndim == 3 else self._patchify(x)
            tokens = patches.astype(self.dtype) @ k_fold
            tokens = tokens + b_fold.astype(jnp.float32)
            # invalid frames must equal the zero-image embedding (= bias)
            gate = valid.astype(jnp.float32)[:, None, None]
            x = (bias + gate * (tokens - bias)).astype(self.dtype)
        else:
            patches = x if x.ndim == 3 else self._patchify(x)
            tokens = patches.astype(self.dtype) @ kernel.astype(self.dtype)
            x = (tokens + bias).astype(self.dtype)
        x = PositionalEncoding(self.width, num_patches, dtype=self.dtype, name="pos")(x)
        x = TransformerEncoder(self.width, self.num_heads, self.depth,
                               ff_dim=4 * self.width, dtype=self.dtype,
                               attention_impl=self.attention_impl,
                               remat=self.remat,
                               fused_block=self.fused_block,
                               fused_block_frames=self.fused_block_frames,
                               fused_gelu=self.fused_gelu,
                               fused_layout=self.fused_layout,
                               name="blocks")(x)
        x = jnp.mean(x, axis=1)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc")(x)


def make_image_encoder(
    encoder_type: str,
    hidden_dim: int,
    use_final_avgpool: bool,
    dtype: Any = jnp.float32,
    attention_impl: str = "xla",
    remat: bool | str = False,
    vit_geometry: tuple = (16, 192, 6),
    vit_fused_block: bool = False,
    vit_fused_block_frames: int = 8,
    vit_fused_gelu: str = "exact",
    vit_fused_layout: str = "stacked",
) -> nn.Module:
    """Factory mirroring the reference's encoder enum (reference image.py:124-174)."""
    # ViT remats its own transformer blocks; the conv/swin encoders remat
    # the whole per-frame forward so the remat flag is never a silent no-op
    # (``train`` is static: BatchNorm branches on it in Python).
    # remat="conv_only" (conv encoders): selective — save every conv
    # output ("conv_out" checkpoint_name) and recompute only the BN/ReLU
    # elementwise chain in the backward.
    if remat == "conv_only":
        if encoder_type not in ("resnet18", "resnet50"):
            raise ValueError(
                f"remat_image_encoder='conv_only' names the conv outputs of "
                f"the ResNet encoders; {encoder_type!r} has none — use "
                f"remat_image_encoder: true")
        resnet_cls = nn.remat(
            ResNetImageEncoder, static_argnums=(2,),
            policy=jax.checkpoint_policies.save_only_these_names(
                "conv_out", "bn_stats"))
    elif remat:
        resnet_cls = nn.remat(ResNetImageEncoder, static_argnums=(2,))
    else:
        resnet_cls = ResNetImageEncoder
    if encoder_type == "resnet18":
        return resnet_cls(hidden_dim, (2, 2, 2, 2), bottleneck=False,
                          use_final_avgpool=use_final_avgpool, dtype=dtype,
                          name="image_encoder")
    if encoder_type == "resnet50":
        return resnet_cls(hidden_dim, (3, 4, 6, 3), bottleneck=True,
                          use_final_avgpool=use_final_avgpool, dtype=dtype,
                          name="image_encoder")
    if encoder_type == "vit":
        return ViTImageEncoder(hidden_dim, patch_size=vit_geometry[0],
                               width=vit_geometry[1], depth=vit_geometry[2],
                               dtype=dtype, attention_impl=attention_impl,
                               remat=remat, fused_block=vit_fused_block,
                               fused_block_frames=vit_fused_block_frames,
                               fused_gelu=vit_fused_gelu,
                               fused_layout=vit_fused_layout,
                               name="image_encoder")
    if encoder_type in ("swin_transformer_tiny", "swin_transformer_small"):
        from soccerdiffusion_tpu.models.swin import SwinImageEncoder

        swin_cls = nn.remat(SwinImageEncoder, static_argnums=(2,)) if remat \
            else SwinImageEncoder
        return swin_cls(
            hidden_dim,
            variant="tiny" if encoder_type.endswith("tiny") else "small",
            dtype=dtype,
            name="image_encoder",
        )
    raise ValueError(f"unknown image encoder type: {encoder_type}")


class ImageSequenceEncoder(nn.Module):
    """(B, T, H, W, 3) frames -> (B, T, hidden) context tokens.

    Folds time into batch for the per-frame encoder, then (optionally) runs a
    small transformer across the T frame tokens — patch size 1, 8 heads
    (reference image.py:103-121).
    """

    hidden_dim: int
    encoder_type: str
    sequence_encoder_type: str  # "transformer" | "none"
    num_layers: int
    max_seq_len: int
    use_final_avgpool: bool = True
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    remat: bool | str = False  # True | "conv_only" (conv encoders)
    vit_geometry: tuple = (16, 192, 6)
    vit_fused_block: bool = False
    vit_fused_block_frames: int = 8
    vit_fused_gelu: str = "exact"
    vit_fused_layout: str = "stacked"
    # run the frame-token sequence encoder as ONE fused Pallas fwd+bwd
    # stack program (ops/fused_encoder_stack.py)
    seq_fused_stack: bool = False
    seq_fused_rows: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 valid: jnp.ndarray | None = None,
                 mode: str = "full") -> jnp.ndarray:
        """``x``: normalized float frames, or raw uint8 frames when
        ``valid`` (B, T) is given. The ViT encoder consumes uint8 directly
        (normalization folded into its patch embed); other encoders
        normalize here in-jit.

        ``mode`` splits the pipeline for serving-side token caching
        (inference/realtime.py, rollout.py — frames arrive at 10 Hz but
        replans run more often, so per-frame encodings are computed once
        per FRAME, not once per replan):
          * ``"full"``     frames -> per-frame tokens -> sequence encoder
          * ``"frames"``   frames -> per-frame tokens (B, T, hidden) only
          * ``"sequence"`` ``x`` IS the (B, T, hidden) token buffer; run
            only the sequence encoder. ``frames(x) |> sequence`` is
            numerically identical to ``full(x)`` (the per-frame encoder
            depends on each frame alone).
        """
        if mode not in ("full", "frames", "sequence"):
            raise ValueError(f"unknown mode {mode!r}")
        if mode == "sequence":
            tokens = x.astype(self.dtype)
            b, t = tokens.shape[0], tokens.shape[1]
        else:
            b, t = x.shape[0], x.shape[1]
            if x.ndim == 4 and self.encoder_type != "vit":
                raise ValueError(
                    "pre-patchified frames (B, T, patches, P*P*C) are a ViT-only "
                    "input layout (data/pipeline.patchify_frames)")
            encoder = make_image_encoder(self.encoder_type, self.hidden_dim,
                                         self.use_final_avgpool, self.dtype,
                                         self.attention_impl, remat=self.remat,
                                         vit_geometry=self.vit_geometry,
                                         vit_fused_block=self.vit_fused_block,
                                         vit_fused_block_frames=self.vit_fused_block_frames,
                                         vit_fused_gelu=self.vit_fused_gelu,
                                         vit_fused_layout=self.vit_fused_layout)
            if valid is not None and self.encoder_type != "vit":
                from soccerdiffusion_tpu.data.pipeline import device_normalize_images

                x = device_normalize_images(x, valid)
                valid = None
            frames = x.reshape((b * t,) + x.shape[2:])
            if valid is not None:
                tokens = encoder(frames, train, valid=valid.reshape(b * t))
            else:
                # positional ``train`` so nn.remat's static_argnums covers it
                tokens = encoder(frames, train)
            tokens = tokens.reshape(b, t, self.hidden_dim)
            if mode == "frames":
                return tokens
        if self.sequence_encoder_type == "transformer":
            # The reference stacks a full BaseEncoder with patch_size=1 and
            # 8 heads over the frame tokens (reference image.py:112-118).
            tokens = SequenceEncoder(
                hidden_dim=self.hidden_dim, patch_size=1,
                num_layers=self.num_layers, num_heads=8,
                max_seq_len=self.max_seq_len, dtype=self.dtype,
                attention_impl=self.attention_impl,
                fused_stack=self.seq_fused_stack,
                fused_block_rows=self.seq_fused_rows, name="seq",
            )(tokens)
        return tokens
