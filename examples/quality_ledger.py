"""One command: train teacher -> distill 4-step + 1-step students -> quality report.

Produces the recorded evidence behind the serving speed headlines
(VERDICT round-2: the distilled throughput numbers need a quality ledger):
a teacher trained on dummy data with the SAME proprioceptive h128
architecture bench.py measures, two distilled students (4-step
trajectory-matching, 1-step reference-style), and the evaluation report —
open-loop MSE vs ground truth, agreement vs teacher, closed-loop rollout
divergence — written as JSON + markdown.

  JAX_PLATFORMS=cpu python examples/quality_ledger.py --out docs/quality_ledger
  (add --fast for a seconds-scale smoke configuration)

Reference semantics being evidenced: ml/training/distill.py:172-198 (the
distillation objective IS teacher-trajectory MSE), ml/inference/plot.py
(open-loop overlay, here recorded as numbers).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# The TPU plugin re-asserts "axon,cpu" over the env var at import time
# (CLAUDE.md); honor an explicit JAX_PLATFORMS=cpu via jax.config, which wins.
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

# bench.py's headline architecture (proprioceptive default.yaml geometry)
BENCH_CONFIG = {
    "num_joints": 20,
    "hidden_dim": 128,
    "trajectory_prediction_length": 10,
    "action_context_length": 100,
    "joint_state_context_length": 100,
    "imu_context_length": 100,
    "use_action_history": True,
    "num_action_history_encoder_layers": 2,
    "use_imu": True,
    "num_imu_encoder_layers": 2,
    "use_joint_states": True,
    "joint_state_encoder_layers": 2,
    "use_images": False,
    "use_gamestate": True,
    "num_decoder_layers": 4,
    "encoder_patch_size": 1,
    "train_denoising_timesteps": 1000,
    "distill_teacher_inference_steps": 30,
    "batch_size": 64,
    # lr 1e-3, not the reference default 1e-4: measured on dummy data, the
    # 1e-4 teacher learns only UNCONDITIONAL denoising in 5000 steps
    # (shuffled-context eps-MSE == true-context; open-loop MSE above the
    # pure-noise floor). At 1e-3 the conditioning is learned (2x true-vs-
    # shuffled gap, open-loop MSE ~0.28 vs the 1.0 floor at small scale).
    "lr": 1.0e-3,
    "epochs": 10,
}

# --vision: the camera-conditioned evidence run. Same proprioceptive
# skeleton, plus a small ViT camera path, trained on the "vision" dummy
# task (data/dummy.py: each image PREVIEWS the next target interval, so
# the future chunk is unpredictable from proprioceptive history alone).
# The report then records image-only sensitivity probes (eps-level and
# trajectory-level image-shuffle ablations, evaluation/openloop.py) — the
# recorded evidence that the camera path LEARNS and is USED.
VISION_OVERRIDES = {
    "dummy_task": "vision",
    "use_images": True,
    "image_encoder_type": "vit",
    "image_sequence_encoder_type": "transformer",
    "num_image_sequence_encoder_layers": 1,
    "image_context_length": 5,
    "image_resolution": 96,
    "vit_patch_size": 16,
    "vit_width": 128,
    "vit_depth": 4,
}


def main(argv=None):
    parser = argparse.ArgumentParser(description="End-to-end quality ledger")
    parser.add_argument("--out", type=str, default="quality_ledger")
    parser.add_argument("--workdir", type=str, default=None,
                        help="where checkpoints land (default: temp dir)")
    parser.add_argument("--train-steps", type=int, default=2000)
    parser.add_argument("--distill-steps", type=int, default=400)
    parser.add_argument("--student-steps", type=int, nargs="*", default=[4, 1])
    parser.add_argument("--solver-rows", type=str, nargs="*", default=None,
                        help="training-free sampler rows on the teacher "
                             "(diffusion/dpm_solver.py), e.g. "
                             "dpmpp10@lambda (log-SNR-uniform steps) or "
                             "ddim10 (the same budget first-order baseline); "
                             "default dpmpp10@lambda+ddim10, none for "
                             "--vision (its evidence is the image probes)")
    parser.add_argument("--guidance-rows", type=str, nargs="*", default=[],
                        help="classifier-free-guidance rows on the teacher, "
                             "SCALE[@MODALITY,...] e.g. 2.0@image — pair "
                             "with --set modality_dropout=0.15 so the "
                             "unconditional branch is in-distribution")
    parser.add_argument("--posterior-mean", type=int, default=0,
                        help="K>1: posterior-mean boundary rows for the "
                             "teacher AND every student, each with its "
                             "NFE/replan cost (evaluation/report.py)")
    parser.add_argument("--student-guidance", type=str, default=None,
                        help="distill the students from a CFG-guided "
                             "teacher, SCALE[@MODALITY,...] (training/"
                             "distill.py --guidance)")
    parser.add_argument("--student-teacher-draws", type=int, default=1,
                        help="K>1: distill the students from the "
                             "POSTERIOR-MEAN teacher (average of K "
                             "rollouts; distill.py --teacher-draws)")
    parser.add_argument("--windows", type=int, default=256)
    parser.add_argument("--chunks", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--fast", action="store_true",
                        help="seconds-scale smoke: tiny model + few steps")
    parser.add_argument("--vision", action="store_true",
                        help="camera-conditioned evidence run: train on the "
                             "'vision' dummy task (images preview the "
                             "target) with a small ViT camera path and "
                             "record image-shuffle sensitivity probes")
    parser.add_argument("--set", action="append", default=[],
                        metavar="KEY=VALUE", dest="overrides",
                        help="override a training-config key (YAML-parsed "
                             "value), e.g. --set ema_decay=0.999")
    args = parser.parse_args(argv)
    if args.solver_rows is None:
        args.solver_rows = [] if args.vision else ["dpmpp10@lambda", "ddim10"]

    config = dict(BENCH_CONFIG)
    if args.vision:
        config.update(VISION_OVERRIDES)
    if args.fast:
        config.update(hidden_dim=32, action_context_length=20,
                      imu_context_length=20, joint_state_context_length=20,
                      num_action_history_encoder_layers=1,
                      num_imu_encoder_layers=1, joint_state_encoder_layers=1,
                      num_decoder_layers=1, train_denoising_timesteps=50,
                      distill_teacher_inference_steps=5, batch_size=16)
        if args.vision:
            config.update(image_resolution=32, vit_patch_size=8,
                          vit_width=32, vit_depth=1, image_context_length=2)
        args.train_steps = min(args.train_steps, 30)
        args.distill_steps = min(args.distill_steps, 10)
        args.windows = min(args.windows, 16)
        args.chunks = min(args.chunks, 3)
    # --set wins over every built-in block, including --fast's
    for kv in args.overrides:
        key, sep, value = kv.partition("=")
        if not sep:
            parser.error(f"--set expects KEY=VALUE, got {kv!r}")
        config[key] = yaml.safe_load(value)

    workdir = Path(args.workdir) if args.workdir else Path(tempfile.mkdtemp(prefix="ledger_"))
    workdir.mkdir(parents=True, exist_ok=True)
    cfg_path = workdir / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(config))

    from soccerdiffusion_tpu import logger
    from soccerdiffusion_tpu.evaluation import report as report_mod
    from soccerdiffusion_tpu.training import distill as distill_mod
    from soccerdiffusion_tpu.training import train as train_mod

    bs = config["batch_size"]
    # dummy dataset yields ~1k windows -> steps/epoch is small; spread the
    # requested optimizer steps over epochs
    from soccerdiffusion_tpu.config import Config

    dataset = train_mod.build_dataset(
        argparse.Namespace(dummy_data=True, db=None, seed=args.seed),
        Config.from_dict(config))
    steps_per_epoch = max(1, len(dataset) // bs)
    epochs = max(1, -(-args.train_steps // steps_per_epoch))

    # Single-device runs keep the (small) dummy dataset device-resident:
    # zero per-step upload, and flat RSS on the tunneled TPU runtime, whose
    # client retains every host->device upload for the life of the process
    # (measured ~35 MB/step for the camera batches -> a 5000-step vision
    # run OOMs a 128 GB host; docs/perf_notes.md).
    import jax

    device_flag = ["--device-data"] if len(jax.devices()) == 1 else []

    teacher = workdir / "teacher.ckpt"
    logger.info(f"[ledger] training teacher: {args.train_steps} steps "
                f"({epochs} epochs x {steps_per_epoch})")
    train_mod.main([
        "--config", str(cfg_path), "--dummy-data", "--epochs", str(epochs),
        "--output", str(teacher), "--seed", str(args.seed),
        "--metrics", str(workdir / "teacher_metrics.jsonl"),
    ] + device_flag)

    students = []
    for k in args.student_steps:
        out = workdir / f"student{k}.ckpt"
        d_epochs = max(1, -(-args.distill_steps // steps_per_epoch))
        logger.info(f"[ledger] distilling {k}-step student: "
                    f"{args.distill_steps} steps")
        distill_argv = [
            str(cfg_path), str(teacher), "--student-steps", str(k),
            "--dummy-data", "--epochs", str(d_epochs),
            "--steps-per-epoch", str(steps_per_epoch),
            "-o", str(out), "--seed", str(args.seed),
            "--metrics", str(workdir / f"student{k}_metrics.jsonl"),
        ]
        if args.student_guidance:
            distill_argv += ["--guidance", args.student_guidance]
        if args.student_teacher_draws > 1:
            distill_argv += ["--teacher-draws", str(args.student_teacher_draws)]
        distill_mod.main(distill_argv + device_flag)
        students.append(out)

    report_argv = ["--teacher", str(teacher), "--dummy-data",
                   "--windows", str(args.windows), "--chunks", str(args.chunks),
                   "--batch-size", str(min(64, bs)), "--seed", str(args.seed),
                   "--out", args.out]
    for s in students:
        report_argv += ["--student", str(s)]
    for row in args.solver_rows:
        report_argv += ["--solver-row", row]
    for row in args.guidance_rows:
        report_argv += ["--guidance-row", row]
    if args.posterior_mean > 1:
        report_argv += ["--posterior-mean", str(args.posterior_mean)]
    result = report_mod.main(report_argv)

    # fold the teacher's learning curve tail into the ledger
    curve_path = workdir / "teacher_metrics.jsonl"
    if curve_path.exists():
        records = [json.loads(l) for l in curve_path.read_text().splitlines()]
        losses = [(r["step"], r["loss"]) for r in records if "loss" in r]
        out = Path(args.out)
        ledger = json.loads(out.with_suffix(".json").read_text())
        ledger["teacher_loss_curve"] = losses
        ledger["train_steps"] = args.train_steps
        ledger["distill_steps"] = args.distill_steps
        out.with_suffix(".json").write_text(json.dumps(ledger, indent=2))
        if losses:
            first, last = losses[0][1], losses[-1][1]
            md = out.with_suffix(".md")
            md.write_text(md.read_text() + (
                f"\nTeacher training loss: {first:.4f} (step {losses[0][0]}) "
                f"-> {last:.4f} (step {losses[-1][0]}), "
                f"{len(losses)} recorded points.\n"))
    logger.info(f"[ledger] checkpoints in {workdir}; report at {args.out}.md")
    return result


if __name__ == "__main__":
    main()
