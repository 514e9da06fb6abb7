"""Bounded-memory streaming ingest: chunked SQLite import equals the bulk
path row-for-row; direct mcap -> packed shards round trip; peak-RSS bound
verified in a clean subprocess."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data.dataset import WindowedDataset
from soccerdiffusion_tpu.data.packed import PackedDataset
from soccerdiffusion_tpu.data.schema import connect, create_schema
from soccerdiffusion_tpu.ingest import ModelImporter
from soccerdiffusion_tpu.ingest.bitbots import BitBotsImportStrategy, RecordingInfo
from soccerdiffusion_tpu.ingest.streaming import NpyAppender, pack_from_stream
from tests.test_ingest import bitbots_stream, make_bitbots_strategy

REPO = Path(__file__).resolve().parent.parent


def chunked_strategy(n=240, with_images=True):
    strategy = make_bitbots_strategy()
    info = RecordingInfo(0, int(2e9), has_imu_data=True, available_topics=[])

    class ChunkedStrategy(BitBotsImportStrategy):
        def convert_to_model_data(self, file_path):
            return self.convert_stream(info, bitbots_stream(n, with_images),
                                       "test.mcap")

        def stream_model_data(self, file_path, flush_rows=50_000):
            yield from self.convert_stream_chunks(
                info, bitbots_stream(n, with_images), "test.mcap", flush_rows)

    strategy.__class__ = ChunkedStrategy
    return strategy


def _table_dump(conn, table):
    cols = [r[1] for r in conn.execute(f"PRAGMA table_info({table})")]
    cols = [c for c in cols if c != "_id"]
    return conn.execute(
        f"SELECT {', '.join(cols)} FROM {table} ORDER BY stamp"
        if "stamp" in cols else f"SELECT {', '.join(cols)} FROM {table}"
    ).fetchall()


class TestStreamingImport:
    def test_streaming_equals_bulk(self, tmp_path):
        dbs = {}
        for name, flush in (("bulk", None), ("stream", 37)):
            db = tmp_path / f"{name}.sqlite3"
            conn = connect(db)
            create_schema(conn)
            rec_id = ModelImporter(conn, chunked_strategy()).import_to_db(
                Path("test.mcap"), flush_rows=flush)
            assert rec_id == 1
            dbs[name] = conn
        for table in ("Recording", "JointStates", "JointCommands", "Rotation",
                      "GameState", "Image"):
            assert _table_dump(dbs["bulk"], table) == _table_dump(dbs["stream"], table), table

    def test_streaming_empty_rolls_back(self, tmp_path):
        conn = connect(tmp_path / "db.sqlite3")
        create_schema(conn)
        strategy = make_bitbots_strategy()
        info = RecordingInfo(0, int(1e9), has_imu_data=True, available_topics=[])

        class EmptyStrategy(BitBotsImportStrategy):
            def stream_model_data(self, file_path, flush_rows=50_000):
                yield from self.convert_stream_chunks(info, iter([]),
                                                      "empty.mcap", flush_rows)

        strategy.__class__ = EmptyStrategy
        with pytest.raises(AssertionError):
            ModelImporter(conn, strategy).import_to_db(Path("empty.mcap"),
                                                       flush_rows=10)
        # the failed import must leave nothing behind (single transaction)
        assert conn.execute("SELECT COUNT(*) FROM Recording").fetchone()[0] == 0


class TestNpyAppender:
    def test_round_trip(self, tmp_path):
        app = NpyAppender(tmp_path / "x.npy", np.float32, (3,))
        app.append(np.arange(6, dtype=np.float32).reshape(2, 3))
        app.append(np.arange(6, 12, dtype=np.float32).reshape(2, 3))
        app.finalize()
        got = np.load(tmp_path / "x.npy", mmap_mode="r")
        np.testing.assert_array_equal(
            np.asarray(got), np.arange(12, dtype=np.float32).reshape(4, 3))
        assert not (tmp_path / "x.bin").exists()


class TestPackFromStream:
    CFG = ModelConfig(num_joints=20, trajectory_prediction_length=10,
                      action_context_length=50, joint_state_context_length=50,
                      imu_context_length=50, use_images=True,
                      image_resolution=32, image_context_length=2)

    def test_matches_sqlite_route(self, tmp_path):
        # route A: stream -> sqlite -> WindowedDataset -> PackedDataset
        conn = connect(tmp_path / "db.sqlite3")
        create_schema(conn)
        ModelImporter(conn, chunked_strategy()).import_to_db(
            Path("test.mcap"), flush_rows=None)
        ds = WindowedDataset.from_sqlite(tmp_path / "db.sqlite3", self.CFG)
        via_sqlite = PackedDataset.from_windowed(ds)

        # route B: stream -> packed shards directly (no SQLite)
        stats = pack_from_stream(chunked_strategy(), "test.mcap", self.CFG,
                                 tmp_path / "packed", flush_rows=41)
        direct = PackedDataset.load(tmp_path / "packed", self.CFG)

        assert stats["rows"] == via_sqlite.cmds.shape[0]
        np.testing.assert_allclose(np.asarray(direct.cmds),
                                   np.asarray(via_sqlite.cmds), atol=1e-6)
        np.testing.assert_allclose(np.asarray(direct.states),
                                   np.asarray(via_sqlite.states), atol=1e-6)
        np.testing.assert_allclose(np.asarray(direct.rots),
                                   np.asarray(via_sqlite.rots), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(direct.gs),
                                      np.asarray(via_sqlite.gs))
        np.testing.assert_array_equal(np.asarray(direct.images),
                                      np.asarray(via_sqlite.images))
        # identical training batches end-to-end
        ba = next(via_sqlite.batches(8, shuffle=False))
        bb = next(direct.batches(8, shuffle=False))
        for k in ba:
            np.testing.assert_allclose(bb[k], ba[k], atol=1e-6, err_msg=k)


RSS_SCRIPT = r"""
import resource, sys
sys.path.insert(0, {repo!r})
import numpy as np
from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.ingest.streaming import pack_from_stream
sys.path.insert(0, {tests!r})
from test_ingest import bitbots_stream, make_bitbots_strategy
from soccerdiffusion_tpu.ingest.bitbots import BitBotsImportStrategy, RecordingInfo

N = 12000  # 100 Hz messages -> ~120 s bag, ~1200 images at 256px (~236 MB)
info = RecordingInfo(0, int(N * 1e7), has_imu_data=True, available_topics=[])
strategy = make_bitbots_strategy()

class S(BitBotsImportStrategy):
    def stream_model_data(self, file_path, flush_rows=50_000):
        yield from self.convert_stream_chunks(
            info, bitbots_stream(N, with_images=True, image_size=256),
            "big.mcap", flush_rows)

strategy.__class__ = S
base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
cfg = ModelConfig(num_joints=20, use_images=True, image_resolution=256)
stats = pack_from_stream(strategy, "big.mcap", cfg, {out!r}, flush_rows=500)
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print("ROWS", stats["rows"], "IMAGES", stats["images"],
      "PEAK_DELTA_KB", peak - base)
"""


class TestBoundedMemory:
    def test_rss_bounded_subprocess(self, tmp_path):
        """Pack a synthesized bag whose materialized row payload would be
        hundreds of MB; the streaming path must keep the RSS increment far
        below that (flush interval x row size, not bag size)."""
        script = RSS_SCRIPT.format(repo=str(REPO), tests=str(REPO / "tests"),
                                   out=str(tmp_path / "packed"))
        proc = subprocess.run([sys.executable, "-c", script],
                              capture_output=True, text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-2000:]
        out = proc.stdout.strip().splitlines()[-1].split()
        rows, images, delta_kb = int(out[1]), int(out[3]), int(out[5])
        assert rows > 5000 and images >= 1000
        # materializing this bag (reference behavior) holds ~236 MB of
        # image rows alone; with flush_rows=500 the increment must stay a
        # small fraction of that (flush interval x row size, not bag size)
        assert delta_kb < 100_000, f"RSS delta {delta_kb} KB"
