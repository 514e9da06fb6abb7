"""bench.py orchestration-layer tests (no device work).

Round-4 design (VERDICT r3 item 1): ONE --multi child measures every
operating point in-process, spooling each completed point to a results
file, under a total wall budget that SKIPS remaining sidecars instead of
dying; the parent assembles the spool into the single JSON line and falls
back to the Mosaic-free XLA path only if the headline itself never
completed. These tests stub measure()/subprocess and assert the plan each
point receives (solver pinning, steps, distilled flag), the budget-skip
behavior, and the parent's salvage/assembly logic.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402


def _run_multi(monkeypatch, tmp_path, cli):
    """Drive bench.main() in --multi mode with measure() stubbed; returns
    (list of per-point parsed args, list of spooled records)."""
    seen = []

    def fake_measure(args):
        seen.append(args)
        return {"metric": "stub", "value": 1000.0, "unit": "chunks/s/chip",
                "vs_baseline": 0.02, "p50_replan_period_ms": 1.0,
                "sampler_path": args.sampler, "batch_robots": args.batch}

    def fake_measure_mfu(args):
        seen.append(args)
        return {"mfu": 0.5, "mfu_config": "vit_flagship",
                "mfu_batch": args.mfu_batch, "mfu_step_ms": 80.0,
                "mfu_samples_per_sec": 3200.0,
                "mfu_flops_per_step": 1e12, "mfu_loss_finite": True}

    monkeypatch.setattr(bench, "measure", fake_measure)
    monkeypatch.setattr(bench, "measure_mfu", fake_measure_mfu)
    spool = tmp_path / "points.jsonl"
    monkeypatch.setattr(sys, "argv", ["bench.py", "--multi",
                                      "--results-file", str(spool)] + cli)
    bench.main()
    records = [json.loads(line) for line in spool.read_text().splitlines()]
    return seen, records


class TestMultiChild:
    def test_points_in_priority_order_with_pinned_solvers(self, monkeypatch,
                                                          tmp_path):
        seen, records = _run_multi(
            monkeypatch, tmp_path,
            ["--solver", "dpmpp", "--sidecars", "distilled1,ddim4,dpmpp10"])
        names = [r["point"] for r in records]
        assert names == ["headline", "distilled1", "ddim4", "dpmpp10"]
        headline, distilled1, ddim4, dpmpp10 = seen
        # headline honors the requested solver (review finding from r3:
        # --solver used to be dropped outside --inline)
        assert headline.solver == "dpmpp"
        assert headline.steps == 30
        # named few-step students are DDIM operating points regardless
        assert distilled1.solver == "ddim" and distilled1.distilled
        assert distilled1.steps == 1
        assert ddim4.solver == "ddim" and ddim4.steps == 4
        assert dpmpp10.solver == "dpmpp" and dpmpp10.steps == 10

    def test_headline_variant_sidecars_inherit_solver(self, monkeypatch,
                                                      tmp_path):
        seen, _ = _run_multi(
            monkeypatch, tmp_path,
            ["--solver", "dpmpp", "--sidecars", "patch5,int8kv,lat64"])
        for args in seen[1:]:
            assert args.solver == "dpmpp"
        assert seen[1].patch == 5
        assert seen[2].kv_quant == "int8"
        assert seen[3].batch == 64

    def test_default_sidecar_set_is_mfu_plus_north_star_pair(self,
                                                             monkeypatch,
                                                             tmp_path):
        _, records = _run_multi(monkeypatch, tmp_path, [])
        assert [r["point"] for r in records] == \
            ["headline", "mfu", "distilled1", "ddim4"]
        mfu = next(r for r in records if r["point"] == "mfu")
        assert mfu["mfu"] == 0.5

    def test_full_expands(self, monkeypatch, tmp_path):
        _, records = _run_multi(monkeypatch, tmp_path, ["--sidecars", "full"])
        assert [r["point"] for r in records] == \
            ["headline"] + bench.FULL_SIDECARS.split(",")

    def test_budget_skips_tail_never_headline(self, monkeypatch, tmp_path):
        # budget 1 s: the headline is still measured, every sidecar is
        # recorded as skipped (min per-point reservation is 120 s)
        _, records = _run_multi(
            monkeypatch, tmp_path,
            ["--budget", "1", "--sidecars", "distilled1,ddim4"])
        assert records[0]["point"] == "headline"
        assert "value" in records[0]
        assert [r.get("skipped") for r in records[1:]] == ["budget"] * 2

    def test_point_failure_is_recorded_not_fatal(self, monkeypatch, tmp_path):
        calls = []

        def flaky_measure(args):
            calls.append(args)
            if args.distilled:
                raise RuntimeError("boom")
            return {"metric": "stub", "value": 1.0, "unit": "x",
                    "vs_baseline": 0.0, "p50_replan_period_ms": 1.0,
                    "sampler_path": args.sampler, "batch_robots": args.batch}

        monkeypatch.setattr(bench, "measure", flaky_measure)
        spool = tmp_path / "points.jsonl"
        monkeypatch.setattr(sys, "argv", [
            "bench.py", "--multi", "--results-file", str(spool),
            "--sidecars", "distilled1,ddim4"])
        bench.main()
        records = {json.loads(r)["point"]: json.loads(r)
                   for r in spool.read_text().splitlines()}
        assert "failed" in records["distilled1"]
        assert "value" in records["ddim4"]  # later points still measured


def _fake_child(records):
    """subprocess.run stand-in: write `records` to the --results-file the
    parent passed, as the real --multi child would."""
    def fake_run(cmd, **kwargs):
        spool = cmd[cmd.index("--results-file") + 1]
        with open(spool, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")

        class P:
            returncode = 0
        return P()
    return fake_run


class TestParentAssembly:
    def test_assembles_headline_and_sidecars(self, monkeypatch, capsys):
        point = {"metric": "m", "value": 100.0, "unit": "chunks/s/chip",
                 "vs_baseline": 0.1, "p50_replan_period_ms": 2.0,
                 "sampler_path": "chunk", "batch_robots": 1024,
                 "point_wall_s": 3.0}
        monkeypatch.setattr(bench.subprocess, "run", _fake_child([
            dict(point, point="headline"),
            dict(point, point="distilled1", value=500.0),
            {"point": "ddim4", "skipped": "budget"},
        ]))
        monkeypatch.setattr(sys, "argv", ["bench.py"])
        bench.main()
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["value"] == 100.0
        assert out["distilled1_chunks_per_sec_per_chip"] == 500.0
        assert out["sidecars_skipped"] == "mfu,ddim4"
        assert "point_wall_s" not in out
        assert "bench_wall_s" in out

    def test_mfu_point_lifts_into_top_level(self, monkeypatch, capsys):
        """VERDICT r4 item 2: the driver-recorded JSON line must carry the
        training-MFU north star as `mfu` (plus its detail fields)."""
        point = {"metric": "m", "value": 100.0, "unit": "chunks/s/chip",
                 "vs_baseline": 0.1, "p50_replan_period_ms": 2.0,
                 "sampler_path": "chunk", "batch_robots": 1024}
        monkeypatch.setattr(bench.subprocess, "run", _fake_child([
            dict(point, point="headline"),
            {"point": "mfu", "mfu": 0.487, "mfu_config": "vit_flagship",
             "mfu_batch": 256, "mfu_step_ms": 81.2,
             "mfu_samples_per_sec": 3152.0, "mfu_flops_per_step": 1.25e13,
             "mfu_loss_finite": True, "point_wall_s": 60.0},
        ]))
        monkeypatch.setattr(sys, "argv", ["bench.py", "--sidecars", "mfu"])
        bench.main()
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["mfu"] == 0.487
        assert out["mfu_config"] == "vit_flagship"
        assert out["value"] == 100.0
        assert "point_wall_s" not in out
        assert "sidecars_skipped" not in out

    def test_deployment_headline_fields_from_ddim4(self, monkeypatch,
                                                   capsys):
        """docs/HEADLINE.md decision: when the quality-gated ddim4 point is
        measured, the JSON carries explicit deployment_* fields while
        `metric`/`value` stay the ddim30 fidelity reference."""
        point = {"metric": "m", "value": 19000.0, "unit": "chunks/s/chip",
                 "vs_baseline": 0.37, "p50_replan_period_ms": 53.0,
                 "sampler_path": "chunk", "batch_robots": 1024}
        monkeypatch.setattr(bench.subprocess, "run", _fake_child([
            dict(point, point="headline"),
            dict(point, point="ddim4", value=70000.0),
        ]))
        monkeypatch.setattr(sys, "argv", ["bench.py", "--sidecars", "ddim4"])
        bench.main()
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["value"] == 19000.0  # fidelity reference unchanged
        assert out["deployment_headline"] == "ddim4"
        assert out["deployment_chunks_per_sec_per_chip"] == 70000.0
        assert abs(out["deployment_vs_baseline"] - 70000.0 / 51200) < 1e-3
        assert out["deployment_quality_gate"]

    def test_falls_back_to_xla_when_headline_missing(self, monkeypatch,
                                                     capsys):
        monkeypatch.setattr(bench.subprocess, "run", _fake_child([]))
        calls = []

        def fake_run_child(extra, timeout):
            calls.append(list(extra))
            return {"metric": "xla", "value": 7.0, "unit": "chunks/s/chip",
                    "vs_baseline": 0.0, "p50_replan_period_ms": 9.0,
                    "sampler_path": "none", "batch_robots": 1024}

        monkeypatch.setattr(bench, "run_child", fake_run_child)
        monkeypatch.setattr(sys, "argv", ["bench.py"])
        bench.main()
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["value"] == 7.0
        assert len(calls) == 1
        assert "--xla-encoder" in calls[0] and "none" in calls[0]

    def test_timeout_salvages_completed_points(self, monkeypatch, capsys):
        point = {"metric": "m", "value": 42.0, "unit": "chunks/s/chip",
                 "vs_baseline": 0.1, "p50_replan_period_ms": 2.0,
                 "sampler_path": "chunk", "batch_robots": 1024}

        def hang_then_timeout(cmd, **kwargs):
            spool = cmd[cmd.index("--results-file") + 1]
            with open(spool, "a") as f:
                f.write(json.dumps(dict(point, point="headline")) + "\n")
            raise bench.subprocess.TimeoutExpired(cmd, kwargs.get("timeout"))

        monkeypatch.setattr(bench.subprocess, "run", hang_then_timeout)
        monkeypatch.setattr(sys, "argv", ["bench.py"])
        bench.main()
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["value"] == 42.0
        assert out["sidecars_skipped"] == "mfu,distilled1,ddim4"
