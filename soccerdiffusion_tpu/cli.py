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
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from soccerdiffusion_tpu import DB_PATH, IMAGE_MAX_RESAMPLE_RATE_HZ, DEFAULT_RESAMPLE_RATE_HZ, logger


def _build_import_parser(sub):
    p = sub.add_parser("import", help="import a recording into the dataset db")
    p.add_argument("type", choices=["bit-bots", "b-human"])
    p.add_argument("file", type=str)
    p.add_argument("location", type=str)
    p.add_argument("--db", type=str, default=None)
    p.add_argument("--team-name", type=str, default=None)
    p.add_argument("--robot-type", type=str, default=None)
    p.add_argument("--public", action="store_true")
    p.add_argument("--simulated", action="store_true")
    p.add_argument("--caching", action="store_true", help="b-human: cache parsed frames")
    p.add_argument("--video", action="store_true", help="b-human: show live video")


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
    for leaf in (c, d, r, m):
        leaf.add_argument("--db", type=str, default=None)


def cmd_import(args) -> int:
    from soccerdiffusion_tpu.data.schema import connect, create_schema
    from soccerdiffusion_tpu.ingest import (
        BHumanGameStateConverter,
        BHumanImageConverter,
        BitBotsGameStateConverter,
        BitbotsImageConverter,
        ImportMetadata,
        MaxRateResampler,
        ModelImporter,
        OriginalRateResampler,
        PreviousInterpolationResampler,
        SyncedDataConverter,
    )

    file_path = Path(args.file)
    if not file_path.exists():
        logger.error(f"file not found: {file_path}")
        return 1
    if args.type == "bit-bots" and file_path.suffix != ".mcap":
        logger.error("bit-bots imports expect an .mcap file")
        return 1
    if args.type == "b-human" and file_path.suffix != ".log":
        logger.error("b-human imports expect a .log file")
        return 1

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

        strategy = BitBotsImportStrategy(
            metadata,
            BitbotsImageConverter(MaxRateResampler(IMAGE_MAX_RESAMPLE_RATE_HZ)),
            BitBotsGameStateConverter(OriginalRateResampler()),
            synced,
        )
    else:
        from soccerdiffusion_tpu.ingest.bhuman import BHumanImportStrategy

        strategy = BHumanImportStrategy(
            metadata,
            BHumanImageConverter(MaxRateResampler(IMAGE_MAX_RESAMPLE_RATE_HZ)),
            BHumanGameStateConverter(OriginalRateResampler()),
            synced,
            caching=args.caching,
            video=args.video,
        )

    conn = connect(args.db or DB_PATH)
    try:
        create_schema(conn)
        try:
            rec_id = ModelImporter(conn, strategy).import_to_db(file_path)
        except (AssertionError, ImportError, ValueError) as exc:
            logger.error(f"import failed: {exc}")
            return 1
        logger.info(f"imported recording {rec_id}")
        return 0
    finally:
        conn.close()


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
    argv = list(sys.argv[1:] if argv is None else argv)
    # Pass-through subcommands reusing the dedicated entry points.
    if argv and argv[0] in ("train", "distill", "plot"):
        name = argv[0]
        if name == "train":
            from soccerdiffusion_tpu.training.train import main as sub_main
        elif name == "distill":
            from soccerdiffusion_tpu.training.distill import main as sub_main
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
    _build_db_parser(sub)
    args = parser.parse_args(argv)
    if args.command == "import":
        return cmd_import(args)
    if args.command == "db":
        return cmd_db(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
