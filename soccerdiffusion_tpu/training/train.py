"""End-to-end diffusion training script.

CLI mirrors the reference (reference ml/training/train.py:31-39):

  python -m soccerdiffusion_tpu.training.train -c config.yaml [-p ckpt_dir]
      [-o out_dir] [--decoder-pretraining] [--pretrained-decoder ckpt_dir]

plus TPU-native additions: ``--dummy-data`` (train on the synthetic backend,
no SQLite needed), ``--db path``, ``--epochs/--steps-per-epoch`` overrides
for smokes, ``--mesh data=8`` style mesh shapes.

Semantics preserved from the reference: config-or-checkpoint hyperparams
with key-by-key diff warnings (train.py:57-70), normalizer fitted on
``num_normalization_samples`` random target chunks (train.py:106-110),
per-epoch checkpoints embedding hyperparams (train.py:242-250), resume
restores model+optimizer but deliberately not the LR schedule
(train.py:177 ``and False``).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np
import yaml

from soccerdiffusion_tpu import logger
from soccerdiffusion_tpu.config import Config
from soccerdiffusion_tpu.data import Normalizer, WindowedDataset, generate_dummy_arrays
from soccerdiffusion_tpu.data.pipeline import prefetch_to_device
from soccerdiffusion_tpu.diffusion import make_schedule
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.parallel import make_mesh
from soccerdiffusion_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from soccerdiffusion_tpu.training.metrics import MetricsLogger
from soccerdiffusion_tpu.training.trainer import (
    create_train_state,
    lr_at_step,
    make_optimizer,
    make_train_step,
)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train the diffusion policy")
    parser.add_argument("--config", "-c", type=str, default=None)
    parser.add_argument("--checkpoint", "-p", type=str, default=None)
    parser.add_argument("--output", "-o", type=str, default="trajectory_transformer_model.ckpt")
    parser.add_argument("--decoder-pretraining", action="store_true")
    parser.add_argument("--pretrained-decoder", type=str, default=None)
    parser.add_argument("--pretrained-weights", type=str, default=None,
                        help="ImageNet init for the ResNet image encoder: a "
                             "torchvision state-dict .pth, or 'auto' (the "
                             "reference default; ml/model/encoder/image.py:64-66)")
    # TPU-native additions
    parser.add_argument("--dummy-data", action="store_true",
                        help="train on the synthetic array backend")
    parser.add_argument("--device-data", action="store_true",
                        help="upload the whole dataset to the device once "
                             "and gather batches on-device (single-device "
                             "runs; datasets that fit in HBM). Flat-RSS on "
                             "the tunneled runtime, which retains every "
                             "host->device upload (data/pipeline.py "
                             "DeviceResidentData)")
    parser.add_argument("--packed", action="store_true",
                        help="use the native packed-array batch assembler")
    parser.add_argument("--db", type=str, default=None, help="sqlite db path")
    parser.add_argument("--epochs", type=int, default=None, help="override epochs")
    parser.add_argument("--steps-per-epoch", type=int, default=None,
                        help="cap steps per epoch (smoke tests)")
    parser.add_argument("--mesh", type=str, default=None,
                        help='mesh shape, e.g. "data=8" or "data=4,model=2"')
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--metrics", type=str, default=None, help="metrics JSONL path")
    parser.add_argument("--wandb", action="store_true")
    return parser.parse_args(argv)


def resolve_params(args) -> dict:
    """Config-or-checkpoint resolution with diff warnings (reference train.py:44-70)."""
    assert args.config or args.checkpoint, "either a config file or a checkpoint is required"
    params: dict = {}
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint)["hyperparams"]
    if args.config:
        with open(args.config) as f:
            config_params = yaml.safe_load(f)
        if args.checkpoint:
            logger.warning("both config and checkpoint given; config wins")
            for key, value in config_params.items():
                if key not in params:
                    logger.warning(f"key '{key}' is not present in the checkpoint")
                elif value != params[key]:
                    logger.warning(
                        f"key '{key}' differs from checkpoint: {params[key]} != {value}"
                    )
        params = config_params
    return params


def build_dataset(args, config: Config):
    if args.dummy_data:
        n = max(
            600,
            config.model.action_context_length + config.model.trajectory_prediction_length + 200,
        )
        dummy = generate_dummy_arrays(
            num_recordings=2, num_samples=n, num_joints=config.model.num_joints,
            with_images=config.model.use_images, image_size=config.model.image_resolution,
            seed=args.seed, task=config.train.dummy_task,
        )
        dataset = WindowedDataset.from_dummy(dummy, config.model)
    else:
        from soccerdiffusion_tpu import DB_PATH

        dataset = WindowedDataset.from_sqlite(args.db or DB_PATH, config.model)
    if getattr(args, "packed", False):
        from soccerdiffusion_tpu.data.packed import PackedDataset

        dataset = PackedDataset.from_windowed(dataset)
        if config.model.use_images and config.model.image_encoder_type == "vit":
            # ViT batches ship frames in the patch layout: bit-identical,
            # and the device step loses its patchify relayouts
            # (docs/perf_notes.md round 3)
            dataset.prepatchify_images(config.model.vit_patch_size)
    return dataset


def parse_mesh(spec: str | None) -> dict[str, int]:
    if not spec:
        return {}
    return {k: int(v) for k, v in (kv.split("=") for kv in spec.split(","))}


def main(argv=None):
    args = parse_args(argv)
    params = resolve_params(args)
    config = Config.from_dict(params)
    if args.epochs is not None:
        params["epochs"] = args.epochs
    epochs = params.get("epochs", config.train.epochs)
    batch_size = config.train.batch_size

    logger.info(f"devices: {jax.devices()}")
    mesh = make_mesh(parse_mesh(args.mesh) or config.train.mesh_shape or None)

    dataset = build_dataset(args, config)
    logger.info(f"dataset: {len(dataset)} samples")
    steps_per_epoch = len(dataset) // batch_size
    if args.steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.steps_per_epoch)
    total_steps = max(1, epochs * steps_per_epoch)

    # Normalizer fitted on random target chunks (reference train.py:106-110).
    normalizer = Normalizer.fit(
        dataset.sample_targets(config.train.num_normalization_samples, seed=args.seed)
    )

    model = DiffusionPolicy(config.model)
    schedule = make_schedule(config.train.train_denoising_timesteps)
    lr_mults = None
    if config.model.use_images and config.train.image_encoder_lr_mult != 1.0:
        # camera-credit lever (round 4): faster learning for the image
        # pathway without touching the proprio/decoder LR
        lr_mults = {"image_sequence_encoder": config.train.image_encoder_lr_mult}
        logger.info(f"image_sequence_encoder LR x{config.train.image_encoder_lr_mult:g}")
    optimizer = make_optimizer(config.train.lr, total_steps, config.train.weight_decay,
                               flat=config.train.flat_optimizer,
                               module_lr_mults=lr_mults,
                               grad_clip_norm=config.train.grad_clip_norm)

    from soccerdiffusion_tpu.data.pipeline import prepare_batch

    sample_batch = next(dataset.batches(batch_size, shuffle=False))
    with mesh:
        state = create_train_state(
            model, prepare_batch(jax.device_put(sample_batch)), optimizer,
            jax.random.key(args.seed),
            config.model.trajectory_prediction_length, config.model.num_joints,
            ema=config.train.ema_decay > 0.0,
        )

    # The reference always starts the ResNet from ImageNet weights
    # (ml/model/encoder/image.py:64-66); do the same by default, degrading
    # to random init with a warning when no weights are reachable (offline).
    pretrained = args.pretrained_weights
    if (pretrained is None and config.model.use_images
            and config.model.image_encoder_type in ("resnet18", "resnet50")):
        pretrained = "auto"
    if pretrained and pretrained != "none":
        from soccerdiffusion_tpu.utils.torch_port import apply_pretrained_backbone

        try:
            state = apply_pretrained_backbone(state, config.model, pretrained)
            logger.info(f"image encoder backbone initialized from {pretrained}")
        except Exception as exc:
            if args.pretrained_weights:  # explicitly requested -> hard error
                raise
            logger.warning(
                f"could not load ImageNet weights ({exc}); image encoder "
                "starts from random init (pass --pretrained-weights to require them)"
            )

    start_epoch = 0
    if args.checkpoint:
        ckpt = load_checkpoint(args.checkpoint, state_template=state)
        state = ckpt["state"]
        normalizer = ckpt["norm"]
        start_epoch = ckpt["current_epoch"] + 1
        logger.info(f"resumed from {args.checkpoint} at epoch {start_epoch}")
    if args.pretrained_decoder:
        dec = load_checkpoint(args.pretrained_decoder)["state"]["params"]
        merged = dict(state.params)
        for key in ("diffusion_action_generator", "step_encoding"):
            if key in dec:
                merged[key] = jax.tree.map(jax.numpy.asarray, dec[key])
        state = state.replace(params=merged)
        logger.info("loaded pretrained decoder weights")

    aux_cue_weight = config.train.aux_cue_weight
    if aux_cue_weight > 0.0 and "vision_u" not in sample_batch:
        logger.warning("aux_cue_weight set but the dataset exposes no "
                       "vision_u labels (camera-cued dummy task only); "
                       "disabling the aux cue loss")
        aux_cue_weight = 0.0
    train_step = make_train_step(
        model, schedule, optimizer, normalizer,
        decoder_pretraining=args.decoder_pretraining,
        ema_decay=config.train.ema_decay,
        modality_dropout=config.train.modality_dropout,
        aux_cue_weight=aux_cue_weight,
    )
    metrics_logger = MetricsLogger(
        args.metrics, log_every=config.train.log_every,
        use_wandb=args.wandb, wandb_config=params,
    )

    # MFU accounting (north-star metric; BASELINE.md).
    from soccerdiffusion_tpu.utils.profiling import MFUMeter, estimate_flops

    flops_per_step = estimate_flops(
        train_step, state, jax.device_put(sample_batch), args.seed
    )
    mfu = MFUMeter(flops_per_step, num_devices=len(jax.devices()))
    logger.info(f"train step FLOPs (cost analysis): {flops_per_step:.3e}")

    device_data = None
    if args.device_data:
        from soccerdiffusion_tpu.data.pipeline import DeviceResidentData

        device_data = DeviceResidentData(dataset)
        logger.info(f"dataset resident on device ({len(device_data)} samples)")

    # MFU/steps-per-sec are measured over log_every-step windows with ONE
    # device sync per window: a per-step block_until_ready would serialize
    # async dispatch and systematically under-measure the pipeline the code
    # is capable of. The global step is tracked host-side so no per-step
    # state.step fetch forces a sync either.
    # Boundary-window oversampling (camera-credit lever, round 4): a
    # fraction of each epoch's slots re-drawn from the windows where a
    # camera frame just arrived — where the cued signal lives
    # (data/dataset.py oversampled_order docstring).
    boundary = None
    if (config.train.boundary_oversample > 0.0
            and hasattr(dataset, "image_boundary_indices")):
        boundary = dataset.image_boundary_indices()
        logger.info(
            f"boundary oversampling {config.train.boundary_oversample:g}: "
            f"{len(boundary)} boundary windows of {len(dataset)}")

    log_every = max(1, config.train.log_every)
    global_step = int(state.step)
    with mesh:
        for epoch in range(start_epoch, epochs):
            window_steps = 0
            mfu.start()
            order = None
            if boundary is not None and len(boundary):
                from soccerdiffusion_tpu.data.dataset import WindowedDataset

                order = WindowedDataset.oversampled_order(
                    len(dataset), boundary,
                    config.train.boundary_oversample,
                    np.random.default_rng(args.seed + epoch))
            batch_iter = (
                device_data.batches(batch_size, shuffle=True,
                                    seed=args.seed + epoch, order=order)
                if device_data is not None else
                prefetch_to_device(
                    dataset.batches(batch_size, shuffle=True,
                                    seed=args.seed + epoch, order=order),
                    mesh))
            for i, host_batch in enumerate(batch_iter):
                if i >= steps_per_epoch:
                    break
                state, metrics = train_step(state, host_batch, args.seed)
                global_step += 1
                window_steps += 1
                if global_step % log_every == 0:
                    jax.block_until_ready(metrics["loss"])
                    mfu.stop(steps=window_steps)
                    window_steps = 0
                    # force: the window cadence IS the gate; the logger's own
                    # step % log_every filter would drop these (step is
                    # global_step-1 here, ≡ -1 mod log_every)
                    metrics_logger.log(
                        global_step - 1,
                        {
                            "loss": metrics["loss"],
                            **({"aux_cue_loss": metrics["aux_cue_loss"]}
                               if "aux_cue_loss" in metrics else {}),
                            "grad_norm": metrics["grad_norm"],
                            "lr": lr_at_step(config.train.lr, total_steps, global_step - 1),
                            "epoch": epoch,
                            "mfu": mfu.mfu,
                            "steps_per_sec": mfu.steps_per_sec,
                        },
                        force=True,
                        grads=metrics.get("grad_norms_by_layer"),
                    )
                    mfu.start()
            if window_steps:
                jax.block_until_ready(state.step)
                mfu.stop(steps=window_steps)
            else:
                mfu.cancel()
            save_checkpoint(args.output, state, normalizer, params, epoch)
            logger.info(f"epoch {epoch} done; checkpoint -> {args.output}")
    metrics_logger.close()
    return state


if __name__ == "__main__":
    main()
