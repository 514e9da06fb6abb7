"""Top-level CLI.

Mirrors the reference console script (reference dataset/cli/run.py:38-138,
args.py:10-108):

  python -m soccerdiffusion_tpu.cli import bit-bots <file.mcap> <location>
  python -m soccerdiffusion_tpu.cli import b-human <file.log> <location> [--caching] [--video]
  python -m soccerdiffusion_tpu.cli db create-schema
  python -m soccerdiffusion_tpu.cli db dummy-data [-n N] [-s S] [-i I]
  python -m soccerdiffusion_tpu.cli db recording2mcap <recording_id> <output.mcap>

plus the training/inference entry points as subcommands:

  python -m soccerdiffusion_tpu.cli train ...      (= soccerdiffusion_tpu.training.train)
  python -m soccerdiffusion_tpu.cli distill ...    (= soccerdiffusion_tpu.training.distill)
  python -m soccerdiffusion_tpu.cli plot ...       (= soccerdiffusion_tpu.inference.plot)
  python -m soccerdiffusion_tpu.cli report ...     (= soccerdiffusion_tpu.evaluation.report)
  python -m soccerdiffusion_tpu.cli serve <ckpt> [--udp HOST:PORT]  (closed-loop deployment)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from soccerdiffusion_tpu import DB_PATH, IMAGE_MAX_RESAMPLE_RATE_HZ, DEFAULT_RESAMPLE_RATE_HZ, logger


def _add_import_source_args(p):
    p.add_argument("type", choices=["bit-bots", "b-human"])
    p.add_argument("file", type=str)
    p.add_argument("location", type=str)
    p.add_argument("--team-name", type=str, default=None)
    p.add_argument("--robot-type", type=str, default=None)
    p.add_argument("--public", action="store_true")
    p.add_argument("--simulated", action="store_true")
    p.add_argument("--caching", action="store_true", help="b-human: cache parsed frames")
    p.add_argument("--video", action="store_true", help="b-human: show live video")


def _build_import_parser(sub):
    p = sub.add_parser("import", help="import a recording into the dataset db")
    _add_import_source_args(p)
    p.add_argument("--db", type=str, default=None)
    p.add_argument("--flush-rows", type=int, default=50_000,
                   help="bounded-memory streaming insert interval; "
                        "0 = materialize the whole bag first "
                        "(reference behavior)")


def _build_pack_parser(sub):
    p = sub.add_parser(
        "pack",
        help="stream a recording straight into packed training shards "
             "(mcap -> mmap .npy, no SQLite hop)")
    _add_import_source_args(p)
    p.add_argument("out_dir", type=str)
    p.add_argument("--config", type=str, default=None,
                   help="training config yaml fixing joint count / image "
                        "resolution / IMU embedding (default: default.yaml "
                        "geometry)")
    p.add_argument("--flush-rows", type=int, default=50_000)
    p.add_argument("--sampling-rate", type=int,
                   default=DEFAULT_RESAMPLE_RATE_HZ,
                   help="rate the import resampler produced rows at "
                        "(drives the packed index's stamp grid)")


def _build_db_parser(sub):
    p = sub.add_parser("db", help="database utilities")
    db_sub = p.add_subparsers(dest="db_command", required=True)
    c = db_sub.add_parser("create-schema")
    d = db_sub.add_parser("dummy-data")
    d.add_argument("-n", "--num-recordings", type=int, default=10)
    d.add_argument("-s", "--num-samples", type=int, default=2000)
    d.add_argument("-i", "--image-step", type=int, default=10)
    r = db_sub.add_parser("recording2mcap")
    r.add_argument("recording_id", type=int)
    r.add_argument("output", type=str)
    m = db_sub.add_parser("migrate")
    w = db_sub.add_parser(
        "plot-window",
        help="render one training window (joints/rotation/images/game "
             "state) to a PNG — the reference's dataset inspection demo, "
             "headless (dataset/pytorch.py:418-497)")
    w.add_argument("index", type=int)
    w.add_argument("output", type=str)
    w.add_argument("--config", type=str, default=None,
                   help="training config yaml (default: default.yaml "
                        "geometry, no images)")
    w.add_argument("--dummy-data", action="store_true")
    w.add_argument("--seed", type=int, default=0)
    for leaf in (c, d, r, m, w):
        leaf.add_argument("--db", type=str, default=None)


def _validate_source(args) -> Path | None:
    file_path = Path(args.file)
    if not file_path.exists():
        logger.error(f"file not found: {file_path}")
        return None
    if args.type == "bit-bots" and file_path.suffix != ".mcap":
        logger.error("bit-bots imports expect an .mcap file")
        return None
    if args.type == "b-human" and file_path.suffix != ".log":
        logger.error("b-human imports expect a .log file")
        return None
    return file_path


def _build_strategy(args):
    from soccerdiffusion_tpu.ingest import (
        BHumanGameStateConverter,
        BHumanImageConverter,
        BitBotsGameStateConverter,
        BitbotsImageConverter,
        ImportMetadata,
        MaxRateResampler,
        OriginalRateResampler,
        PreviousInterpolationResampler,
        SyncedDataConverter,
    )

    metadata = ImportMetadata(
        allow_public=args.public,
        team_name=args.team_name or ("Bit-Bots" if args.type == "bit-bots" else "B-Human"),
        robot_type=args.robot_type or ("Wolfgang-OP" if args.type == "bit-bots" else "NAO6"),
        location=args.location,
        simulated=args.simulated,
    )
    synced = SyncedDataConverter(PreviousInterpolationResampler(DEFAULT_RESAMPLE_RATE_HZ))
    if args.type == "bit-bots":
        from soccerdiffusion_tpu.ingest.bitbots import BitBotsImportStrategy

        return BitBotsImportStrategy(
            metadata,
            BitbotsImageConverter(MaxRateResampler(IMAGE_MAX_RESAMPLE_RATE_HZ)),
            BitBotsGameStateConverter(OriginalRateResampler()),
            synced,
        )
    from soccerdiffusion_tpu.ingest.bhuman import BHumanImportStrategy

    return BHumanImportStrategy(
        metadata,
        BHumanImageConverter(MaxRateResampler(IMAGE_MAX_RESAMPLE_RATE_HZ)),
        BHumanGameStateConverter(OriginalRateResampler()),
        synced,
        caching=args.caching,
        video=args.video,
    )



def _build_serve_parser(sub):
    p = sub.add_parser(
        "serve",
        help="drive a robot with a trained checkpoint at the 50 Hz control "
             "rate (the reference's inference-node deployment, ros.py, "
             "without ROS: built-in simulated plant or a UDP robot bridge)")
    p.add_argument("checkpoint", type=str)
    p.add_argument("--udp", type=str, default=None, metavar="HOST:PORT",
                   help="drive a robot-side UdpRobotServer at this address "
                        "instead of the in-process simulated plant")
    p.add_argument("--duration", type=float, default=10.0,
                   help="seconds to run the control loop")
    p.add_argument("--control-rate", type=float,
                   default=DEFAULT_RESAMPLE_RATE_HZ)
    p.add_argument("--replan-ticks", type=int, default=None,
                   help="receding horizon: replan every N control ticks "
                        "(default: the checkpoint's pred_len = the "
                        "reference's 200 ms chunk boundary)")
    p.add_argument("--steps", type=int, default=None,
                   help="override the sampler step count")
    p.add_argument("--solver", type=str, default="ddim",
                   help="'ddim' (reference) or 'dpmpp'/'dpmpp@lambda' "
                        "(training-free few-step; diffusion/dpm_solver.py); "
                        "ignored for distilled checkpoints")
    p.add_argument("--guidance", type=str, default=None,
                   metavar="SCALE[@MODALITY,...]",
                   help="classifier-free guidance, e.g. '2.0@image': each "
                        "denoise step runs a null-modality unconditional "
                        "branch alongside the conditional one and "
                        "extrapolates by SCALE (meaningful on "
                        "modality_dropout-trained checkpoints; iterative "
                        "samplers only)")
    p.add_argument("--seed", type=int, default=0)


def cmd_import(args) -> int:
    from soccerdiffusion_tpu.data.schema import connect, create_schema
    from soccerdiffusion_tpu.ingest import ModelImporter

    file_path = _validate_source(args)
    if file_path is None:
        return 1
    strategy = _build_strategy(args)
    conn = connect(args.db or DB_PATH)
    try:
        create_schema(conn)
        try:
            rec_id = ModelImporter(conn, strategy).import_to_db(
                file_path, flush_rows=args.flush_rows or None)
        except (AssertionError, ImportError, ValueError) as exc:
            logger.error(f"import failed: {exc}")
            return 1
        logger.info(f"imported recording {rec_id}")
        return 0
    finally:
        conn.close()


def cmd_pack(args) -> int:
    from soccerdiffusion_tpu.config import Config, ModelConfig
    from soccerdiffusion_tpu.ingest.streaming import pack_from_stream

    file_path = _validate_source(args)
    if file_path is None:
        return 1
    config = (Config.from_yaml(args.config).model if args.config
              else ModelConfig())
    strategy = _build_strategy(args)
    try:
        stats = pack_from_stream(strategy, file_path, config, args.out_dir,
                                 flush_rows=args.flush_rows,
                                 sampling_rate=args.sampling_rate)
    except (AssertionError, ImportError, ValueError) as exc:
        logger.error(f"pack failed: {exc}")
        return 1
    logger.info(f"packed {stats['rows']} rows -> {stats['out_dir']}")
    return 0




def cmd_serve(args) -> int:
    """Closed-loop serving from a checkpoint (reference ml/inference/ros.py
    deployment semantics: 50 Hz actuation, chunk replans, [0,2pi) domain)."""
    from soccerdiffusion_tpu.config import Config
    from soccerdiffusion_tpu.diffusion import make_schedule, solver_label
    from soccerdiffusion_tpu.inference import make_chunk_sampler
    from soccerdiffusion_tpu.inference.realtime import (
        RealtimeController,
        SimulatedRobotIO,
    )
    from soccerdiffusion_tpu.models import DiffusionPolicy
    from soccerdiffusion_tpu.training.checkpoint import load_policy_checkpoint

    # Shared decoder: the step count a checkpoint is SERVED at is the one
    # `cli report` EVALUATES it at (training/checkpoint.py).
    params, variables, norm, ckpt_steps, distilled = load_policy_checkpoint(
        args.checkpoint)
    config = Config.from_dict(params)
    model = DiffusionPolicy(config.model)
    steps = args.steps or ckpt_steps
    schedule = make_schedule(config.train.train_denoising_timesteps)
    g_scale, g_null = 1.0, ("image",)
    if args.guidance:
        from soccerdiffusion_tpu.data.pipeline import parse_guidance_spec

        try:
            g_scale, g_null = parse_guidance_spec(args.guidance)
        except ValueError as e:
            raise SystemExit(f"--guidance: {e}") from None
    sampler = make_chunk_sampler(
        model, schedule, norm, num_inference_steps=steps,
        distilled=distilled, solver=args.solver,
        guidance_scale=g_scale, guidance_null=g_null)
    label = ("distilled1" if distilled
             else solver_label(args.solver, steps))
    if g_scale != 1.0:
        label += f"+cfg{g_scale:g}({','.join(g_null)})"
    logger.info(f"serving {args.checkpoint} [{label}] at "
                f"{args.control_rate:g} Hz for {args.duration:g}s")

    # Pre-warm the jit so the first in-loop replan is not a compile (the
    # plan thread runs concurrently with the 50 Hz actuation loop).
    import jax as _jax

    from soccerdiffusion_tpu.inference.controller import (
        init_controller_state, make_controller_batch)

    warm_state = init_controller_state(config.model, batch_size=1)
    _jax.block_until_ready(sampler(
        variables, make_controller_batch(config.model, warm_state),
        _jax.random.key(args.seed)))

    if args.udp:
        from soccerdiffusion_tpu.inference.transport import UdpRobotIO

        io = UdpRobotIO(args.udp)
    else:
        io = SimulatedRobotIO(num_joints=config.model.num_joints)
    ctrl = RealtimeController(
        config.model, sampler, variables, io,
        control_rate_hz=args.control_rate, seed=args.seed,
        replan_every_ticks=args.replan_ticks,
    )
    ctrl.run(duration_s=args.duration)
    lat = sorted(ctrl.plan_latencies_ms)
    p50 = lat[len(lat) // 2] if lat else float("nan")
    logger.info(f"served {len(lat)} replans; plan p50 {p50:.2f} ms; "
                f"commands delivered: {getattr(io, 'commands_received', 'n/a')}")
    return 0


def cmd_db(args) -> int:
    from soccerdiffusion_tpu.data.schema import connect, create_schema

    db = args.db or DB_PATH
    if args.db_command == "create-schema":
        conn = connect(db)
        try:
            create_schema(conn)
        finally:
            conn.close()  # checkpoint the WAL so read-only opens see the schema
        logger.info(f"schema created at {db}")
        return 0
    if args.db_command == "dummy-data":
        from soccerdiffusion_tpu.data.dummy import insert_dummy_data

        conn = connect(db)
        try:
            create_schema(conn)
            ids = insert_dummy_data(conn, args.num_recordings, args.num_samples, args.image_step)
        finally:
            conn.close()
        logger.info(f"inserted dummy recordings: {ids}")
        return 0
    if args.db_command == "migrate":
        from soccerdiffusion_tpu.data.migrations import migrate, schema_version

        conn = connect(db)
        try:
            before = schema_version(conn)
            after = migrate(conn)
        finally:
            conn.close()
        logger.info(f"schema migrated: v{before} -> v{after}")
        return 0
    if args.db_command == "plot-window":
        from soccerdiffusion_tpu.config import Config
        from soccerdiffusion_tpu.data.plot import plot_window
        from soccerdiffusion_tpu.training.train import build_dataset

        config = Config.from_yaml(args.config) if args.config else Config()
        dataset = build_dataset(
            argparse.Namespace(dummy_data=args.dummy_data, db=args.db,
                               seed=args.seed), config)
        if not 0 <= args.index < len(dataset):
            logger.error(f"window index {args.index} out of range "
                         f"(dataset has {len(dataset)})")
            return 1
        try:
            out = plot_window(dataset[args.index], config.model, args.output)
        except ImportError as exc:
            logger.error(str(exc))
            return 1
        logger.info(f"wrote {out}")
        return 0
    if args.db_command == "recording2mcap":
        from soccerdiffusion_tpu.ingest.recording2mcap import recording2mcap

        try:
            recording2mcap(db, args.recording_id, args.output)
        except (ImportError, ValueError) as exc:
            logger.error(str(exc))
            return 1
        return 0
    return 1


def main(argv=None) -> int:
    # Honor an explicit JAX_PLATFORMS=cpu: the tunneled-TPU plugin
    # re-asserts "axon,cpu" over the env var at import time (CLAUDE.md),
    # so the config update — which wins — is needed to actually stay off
    # the device (quality_ledger.py and tests/conftest.py do the same).
    import os

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    argv = list(sys.argv[1:] if argv is None else argv)
    # Pass-through subcommands reusing the dedicated entry points.
    if argv and argv[0] in ("train", "distill", "plot", "report"):
        name = argv[0]
        if name == "train":
            from soccerdiffusion_tpu.training.train import main as sub_main
        elif name == "distill":
            from soccerdiffusion_tpu.training.distill import main as sub_main
        elif name == "report":
            from soccerdiffusion_tpu.evaluation.report import main as sub_main
        else:
            from soccerdiffusion_tpu.inference.plot import main as sub_main
        sub_main(argv[1:])
        return 0

    parser = argparse.ArgumentParser(
        prog="soccerdiffusion-tpu",
        epilog="also: train / distill / plot subcommands, delegated to "
               "soccerdiffusion_tpu.training.train, .training.distill, "
               ".inference.plot (run e.g. %(prog)s train --help)")
    sub = parser.add_subparsers(dest="command", required=True)
    _build_import_parser(sub)
    _build_pack_parser(sub)
    _build_db_parser(sub)
    _build_serve_parser(sub)
    args = parser.parse_args(argv)
    if args.command == "import":
        return cmd_import(args)
    if args.command == "pack":
        return cmd_pack(args)
    if args.command == "db":
        return cmd_db(args)
    if args.command == "serve":
        return cmd_serve(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
