"""Data layer: storage schema, ingest, windowed datasets, input pipeline.

The on-disk contract is the reference's SQLite schema (same tables, CamelCase
joint columns, CHECK constraints; reference dataset/models.py) read/written
through the stdlib ``sqlite3`` module — no ORM. The training path loads
per-recording time series into contiguous numpy arrays once and assembles
windowed batches with the reference's exact padding semantics
(reference dataset/pytorch.py:145-274), feeding devices through a
double-buffered host->HBM prefetcher.
"""

from soccerdiffusion_tpu.data.schema import (
    RobotState,
    TeamColor,
    connect,
    create_schema,
)
from soccerdiffusion_tpu.data.normalizer import Normalizer
from soccerdiffusion_tpu.data.dataset import WindowedDataset
from soccerdiffusion_tpu.data.dummy import generate_dummy_arrays, insert_dummy_data

__all__ = [
    "RobotState",
    "TeamColor",
    "connect",
    "create_schema",
    "Normalizer",
    "WindowedDataset",
    "generate_dummy_arrays",
    "insert_dummy_data",
]
