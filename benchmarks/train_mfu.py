"""Training MFU benchmark for the image-encoder configs on the real chip.

Measures steps/s and MFU of the jitted train step with DEVICE-RESIDENT
batches (the tunnel's 13 MB/s host->device link is an artifact of this dev
environment; production feeds overlap via data/pipeline.py). Images ride as
uint8 and are normalized in-jit (data/pipeline.prepare_batch), as in the
packed training path.

Configs: vit_flagship (BASELINE.json config[2]) at descending batch sizes
until one fits, plus the proprioceptive default for comparison.

Run: nohup python benchmarks/train_mfu.py > /tmp/train_mfu.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import yaml

from soccerdiffusion_tpu.config import Config
from soccerdiffusion_tpu.data import Normalizer
from soccerdiffusion_tpu.data.pipeline import prepare_batch
from soccerdiffusion_tpu.diffusion import make_schedule
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.training.trainer import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from soccerdiffusion_tpu.utils.profiling import device_peak_flops, estimate_flops

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def device_batch(cfg, b, rng):
    batch = {
        "joint_command": jnp.asarray(rng.random((b, cfg.trajectory_prediction_length,
                                                 cfg.num_joints), dtype=np.float32)),
    }
    if cfg.use_action_history:
        batch["joint_command_history"] = jnp.asarray(
            rng.random((b, cfg.action_context_length, cfg.num_joints), dtype=np.float32))
    if cfg.use_joint_states:
        batch["joint_state"] = jnp.asarray(
            rng.random((b, cfg.joint_state_context_length, cfg.num_joints), dtype=np.float32))
    if cfg.use_imu:
        batch["rotation"] = jnp.asarray(
            rng.random((b, cfg.imu_context_length, cfg.imu_input_dim), dtype=np.float32))
    if cfg.use_gamestate:
        batch["game_state"] = jnp.zeros((b,), jnp.int32)
    if cfg.use_images:
        if cfg.image_encoder_type == "vit" and os.environ.get("MFU_PREPATCH", "1") != "0":
            # production packed layout for ViT configs: frames stored
            # pre-patchified (data/pipeline.patchify_frames) so the step
            # has no device-side patchify relayouts
            p = cfg.vit_patch_size
            n_patch = (cfg.image_resolution // p) ** 2
            batch["image_u8"] = jnp.asarray(rng.integers(
                0, 255, (b, cfg.image_context_length, n_patch, p * p * 3),
                dtype=np.uint8))
        else:
            batch["image_u8"] = jnp.asarray(rng.integers(
                0, 255, (b, cfg.image_context_length, cfg.image_resolution,
                         cfg.image_resolution, 3), dtype=np.uint8))
        batch["image_valid"] = jnp.ones((b, cfg.image_context_length), jnp.float32)
    return jax.device_put(batch)


def bench_config(name: str, yaml_path: str, batch_sizes, steps=12,
                 overrides: dict | None = None):
    with open(yaml_path) as f:
        params = yaml.safe_load(f)
    if overrides:
        params.update(overrides)
    # ad-hoc sweep hook: MFU_OVERRIDES='{"vit_patch_size": 28}' applies on
    # top of every lane (geometry/knob experiments without editing lanes)
    extra = os.environ.get("MFU_OVERRIDES")
    if extra:
        params.update(json.loads(extra))
    config = Config.from_dict(params)
    cfg = config.model
    model = DiffusionPolicy(cfg)
    schedule = make_schedule(config.train.train_denoising_timesteps)
    rng = np.random.default_rng(0)

    for b in batch_sizes:
        try:
            batch = device_batch(cfg, b, rng)
            optimizer = make_optimizer(config.train.lr, 1000,
                                       flat=config.train.flat_optimizer)
            state = create_train_state(
                model, prepare_batch(batch), optimizer, jax.random.key(0),
                cfg.trajectory_prediction_length, cfg.num_joints,
                ema=config.train.ema_decay > 0.0,
            )
            train_step = make_train_step(model, schedule, optimizer,
                                         Normalizer.identity(cfg.num_joints),
                                         ema_decay=config.train.ema_decay)
            if (getattr(cfg, "vit_fused_block", False)
                    or getattr(cfg, "encoder_fused_block", False)
                    or getattr(cfg, "remat_image_encoder", False)):
                # XLA cost analysis cannot see FLOPs inside Pallas custom
                # calls; estimate from the mathematically identical
                # unfused model instead (same params/shapes). REMAT lanes
                # take the same twin with remat OFF: cost analysis of a
                # rematted program counts the recomputed forward as FLOPs,
                # inflating MFU by the recompute fraction (observed: the
                # round-4 default_tpu full-remat row carried 17.2 TFLOP vs
                # the honest 12.9 — its 42.5% was ~31.8% on useful FLOPs).
                # MFU is USEFUL model FLOPs / time, so recompute never
                # counts.
                import dataclasses as _dc

                plain_model = DiffusionPolicy(
                    _dc.replace(cfg, vit_fused_block=False,
                                encoder_fused_block=False,
                                remat_image_encoder=False))
                plain_step = make_train_step(
                    plain_model, schedule, optimizer,
                    Normalizer.identity(cfg.num_joints), donate=False)
                flops = estimate_flops(plain_step, state, batch, 0)
                if not flops:
                    # the plain model needs more HBM than the fused one
                    # (stored fp32 relayouts), so its cost-analysis compile
                    # can OOM at batches the fused step itself handles
                    # (observed at B=512). FLOPs are linear in batch:
                    # analyze a small batch and scale.
                    small = device_batch(cfg, 64, rng)
                    flops = estimate_flops(plain_step, state, small, 0) * (b / 64)
                    del small
                    if not flops:
                        # don't record mfu=0.0 as if it were a measurement
                        emit(config=name, batch=b,
                             error="FLOPs estimation failed at full AND "
                                   "small batch; timing not recorded")
                        return
            else:
                flops = estimate_flops(train_step, state, batch, 0)
            t0 = time.perf_counter()
            state, metrics = train_step(state, batch, 0)
            jax.block_until_ready(metrics["loss"])
            compile_s = time.perf_counter() - t0

            # MFU_STEPS extends the timed window (e.g. 300 for a
            # training-stability record); losses are sampled sparsely so
            # the fetches don't serialize the loop
            steps = int(os.environ.get("MFU_STEPS", steps))
            sampled = {}
            t0 = time.perf_counter()
            for i in range(steps):
                state, metrics = train_step(state, batch, 0)
                if steps > 50 and (i % 50 == 0 or i == steps - 1):
                    sampled[i] = metrics["loss"]
            jax.block_until_ready(metrics["loss"])
            dt = (time.perf_counter() - t0) / steps
            peak = device_peak_flops()
            extra_kw = {}
            if sampled:
                extra_kw["loss_curve"] = {
                    str(i): round(float(v), 4) for i, v in sampled.items()}
            emit(config=name, batch=b, steps_per_sec=round(1 / dt, 2),
                 samples_per_sec=round(b / dt, 1), step_ms=round(dt * 1e3, 1),
                 flops_per_step=flops, mfu=round(flops / dt / peak, 4),
                 compile_s=round(compile_s, 1),
                 loss=float(metrics["loss"]), **extra_kw)
            return  # largest fitting batch measured; done
        except Exception as exc:  # OOM etc. -> try smaller
            emit(config=name, batch=b, error=str(exc)[:200])
            # the exception traceback pins frames that reference the device
            # arrays; drop everything before retrying or the leaked buffers
            # poison every smaller batch too
            import gc
            batch = state = optimizer = train_step = None
            exc = None
            gc.collect()
            continue


def main():
    emit(bench="devices", devices=str(jax.devices()),
         peak_bf16_flops=device_peak_flops())
    cfgdir = os.path.join(REPO, "soccerdiffusion_tpu", "training", "configs")
    lanes = ("vit_flagship_fused", "vit_flagship", "default_resnet18",
             "larger_model")
    only = os.environ.get("MFU_ONLY", "")
    # MFU_ONLY=none runs no standard lane (useful with MFU_ABLATE, which
    # fires regardless of lane selection)
    if only and only != "none" and only not in lanes:
        raise SystemExit(f"MFU_ONLY={only!r} is not one of {lanes}")

    def want(name):
        return not only or only == name

    if want("vit_flagship_fused"):
        # fused Pallas fwd+bwd ViT blocks (ops/fused_vit_block.py): the
        # HBM-traffic cut measured against the plain baseline below
        frames = [int(f) for f in
                  os.environ.get("MFU_FUSED_FRAMES", "16").split(",")]
        # MFU_BATCH=512 pins the batch ladder (descending-until-fit stays
        # the default)
        fused_batches = tuple(
            int(b) for b in os.environ.get("MFU_BATCH", "256,128,64").split(","))
        for f in frames:
            bench_config(f"vit_flagship_fused_f{f}",
                         os.path.join(cfgdir, "vit_flagship.yaml"),
                         batch_sizes=fused_batches,
                         overrides={"vit_fused_block": True,
                                    "vit_fused_block_frames": f})
    if os.environ.get("MFU_ABLATE") == "depth0":
        # vit_depth 0: patch embed + posenc + pool only — measures the
        # NON-ViT-stack remainder of the flagship step (proprio encoders,
        # sequence encoder, denoiser, loss, AdamW). Difference against the
        # full step attributes the 8-block stack RTT-free.
        bench_config("vit_flagship_depth0",
                     os.path.join(cfgdir, "vit_flagship.yaml"),
                     batch_sizes=(256,),
                     overrides={"vit_depth": 0, "vit_fused_block": False})
    if want("vit_flagship"):
        # plain-XLA baseline: force the fused blocks OFF (the flagship yaml
        # enables them by default now)
        bench_config("vit_flagship", os.path.join(cfgdir, "vit_flagship.yaml"),
                     batch_sizes=(256, 128, 64, 32),
                     overrides={"vit_fused_block": False})
    # NB: a failed oversized device_put poisons the tunnel device for the
    # rest of the process (server-side allocations are not reclaimed), so
    # only attempt batches known to fit for the conv configs — unless
    # MFU_BATCH explicitly pins a ladder (the round-4 remat campaign runs
    # larger batches with remat_image_encoder=true via MFU_OVERRIDES).
    conv_batches = tuple(
        int(b) for b in os.environ.get("MFU_BATCH", "64,32").split(",")) \
        if only in ("default_resnet18", "larger_model") else (64, 32)
    if want("default_resnet18"):
        bench_config("default_resnet18", os.path.join(cfgdir, "default.yaml"),
                     batch_sizes=conv_batches)
    if want("larger_model"):
        bench_config("larger_model", os.path.join(cfgdir, "larger_model.yaml"),
                     batch_sizes=conv_batches)
    emit(bench="done")


if __name__ == "__main__":
    main()
