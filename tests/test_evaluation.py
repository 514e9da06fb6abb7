"""Quality-evaluation harness tests: open-loop metrics, sampler agreement,
closed-loop divergence, the few-step distillation path, and the report
round trip — all on a tiny proprioceptive config (CPU)."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data import WindowedDataset, generate_dummy_arrays
from soccerdiffusion_tpu.diffusion import make_schedule
from soccerdiffusion_tpu.evaluation import (
    closed_loop_divergence,
    held_out_indices,
    open_loop_metrics,
    sampler_agreement,
    self_consistency,
)
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.training import create_train_state, make_optimizer
from soccerdiffusion_tpu.training.distill import make_distill_step

CFG = ModelConfig(
    num_joints=6, hidden_dim=32, trajectory_prediction_length=5,
    action_context_length=20, joint_state_context_length=20, imu_context_length=20,
    use_images=False, use_imu=False, use_joint_states=False, use_gamestate=False,
    num_action_history_encoder_layers=1, num_decoder_layers=1,
)


def setup():
    dummy = generate_dummy_arrays(1, 200, num_joints=6)
    ds = WindowedDataset.from_dummy(dummy, CFG)
    model = DiffusionPolicy(CFG)
    sched = make_schedule(50)
    opt = make_optimizer(1e-3, total_steps=60, use_onecycle=False)
    batch = next(ds.batches(8, shuffle=False))
    state = create_train_state(model, jax.device_put(batch), opt, jax.random.key(0), 5, 6)
    from soccerdiffusion_tpu.data.normalizer import Normalizer

    norm = Normalizer.fit(ds.sample_targets(64))
    return ds, model, sched, opt, state, norm


class TestOpenLoop:
    def test_metrics_shape_and_determinism(self):
        ds, model, sched, _, state, norm = setup()
        variables = {"params": state.params}
        idx = held_out_indices(len(ds), 16, seed=3)
        m1 = open_loop_metrics(model, variables, norm, sched, ds, idx,
                               num_steps=4, distilled=False, batch_size=8)
        m2 = open_loop_metrics(model, variables, norm, sched, ds, idx,
                               num_steps=4, distilled=False, batch_size=8)
        assert m1["sampler"] == "ddim4"
        assert m1["mse"] == m2["mse"]  # seeded noise -> reproducible
        assert np.isfinite(m1["mse"]) and np.isfinite(m1["mae"])
        assert len(m1["per_joint_mse"]) == 6
        assert np.isfinite(m1["noise_floor_mse"])

    def test_agreement_identical_params_near_zero(self):
        ds, model, sched, _, state, norm = setup()
        variables = {"params": state.params}
        idx = held_out_indices(len(ds), 8, seed=0)
        # same params, same sampler -> agreement error is exactly 0
        a = sampler_agreement(model, variables, variables, norm, sched, ds,
                              idx, teacher_steps=4, student_steps=4,
                              student_distilled=False, batch_size=8)
        assert a["mse_vs_teacher"] == 0.0
        # distilled single forward differs from 4-step DDIM
        b = sampler_agreement(model, variables, variables, norm, sched, ds,
                              idx, teacher_steps=4, student_steps=1,
                              student_distilled=True, batch_size=8)
        assert b["mse_vs_teacher"] > 0.0
        assert b["student"] == "distilled1"


class TestClosedLoop:
    def test_divergence_zero_for_identical(self):
        ds, model, sched, _, state, norm = setup()
        variables = {"params": state.params}
        d = closed_loop_divergence(model, variables, variables, sched, norm,
                                   teacher_steps=3, student_steps=3,
                                   student_distilled=False, batch_size=4,
                                   num_chunks=3)
        assert d["final_divergence_rad"] == 0.0
        assert len(d["divergence_curve_rad"]) == 3

    def test_divergence_positive_for_different_sampler(self):
        ds, model, sched, _, state, norm = setup()
        variables = {"params": state.params}
        d = closed_loop_divergence(model, variables, variables, sched, norm,
                                   teacher_steps=3, student_steps=1,
                                   student_distilled=True, batch_size=4,
                                   num_chunks=3)
        assert d["mean_divergence_rad"] > 0.0

    def test_self_consistency_positive(self):
        ds, model, sched, _, state, norm = setup()
        variables = {"params": state.params}
        sc = self_consistency(model, variables, sched, norm, num_steps=3,
                              batch_size=4, num_chunks=2)
        assert sc["mean_divergence_rad"] > 0.0


class TestFewStepDistill:
    def test_4step_student_loss_decreases(self):
        ds, model, sched, opt, state, _ = setup()
        teacher_params = jax.tree.map(jnp.copy, state.params)
        step = make_distill_step(model, sched, opt, teacher_inference_steps=5,
                                 student_steps=4, donate=False)
        losses = []
        for i, batch in enumerate(ds.batches(8, shuffle=True, seed=1)):
            if i >= 20:
                break
            state, metrics = step(state, teacher_params, batch, 0)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert all(np.isfinite(l) for l in losses)

    def test_masked_optimizer_freezes_encoders(self):
        """Distillation must not touch encoder params (the reference's
        torch optimizer skips None-grad params; AdamW weight decay on the
        frozen encoder would otherwise erode it)."""
        import optax

        ds, model, sched, _, state, _ = setup()
        from soccerdiffusion_tpu.training import create_train_state, make_optimizer

        opt = optax.masked(
            make_optimizer(1e-2, total_steps=20, use_onecycle=False,
                           weight_decay=0.1),
            lambda params: {
                k: k in ("diffusion_action_generator", "step_encoding")
                for k in params
            },
        )
        batch = next(ds.batches(8, shuffle=False))
        state = create_train_state(model, batch, opt, jax.random.key(0), 5, 6)
        before = jax.tree.map(np.asarray, state.params)
        teacher_params = jax.tree.map(jnp.copy, state.params)
        step = make_distill_step(model, sched, opt, teacher_inference_steps=3,
                                 donate=False)
        for i, b in enumerate(ds.batches(8, shuffle=True, seed=2)):
            if i >= 3:
                break
            state, _ = step(state, teacher_params, b, 0)
        after = jax.tree.map(np.asarray, state.params)
        np.testing.assert_array_equal(
            after["action_history_encoder"]["seq"]["embedding"]["proj"]["kernel"],
            before["action_history_encoder"]["seq"]["embedding"]["proj"]["kernel"])
        assert not np.array_equal(
            after["diffusion_action_generator"]["embedding"]["kernel"],
            before["diffusion_action_generator"]["embedding"]["kernel"])

    def test_student_steps_validation(self):
        _, model, sched, opt, _, _ = setup()
        try:
            make_distill_step(model, sched, opt, student_steps=0)
            assert False, "expected ValueError"
        except ValueError:
            pass


class TestReport:
    def test_report_round_trip(self, tmp_path):
        """End-to-end: save teacher + 2-step student checkpoints, run the
        report CLI against dummy data, check the JSON/markdown outputs."""
        from soccerdiffusion_tpu.evaluation.report import main as report_main
        from soccerdiffusion_tpu.training.checkpoint import save_checkpoint

        ds, model, sched, opt, state, norm = setup()
        params = {
            "num_joints": 6, "hidden_dim": 32,
            "trajectory_prediction_length": 5,
            "action_context_length": 20, "joint_state_context_length": 20,
            "imu_context_length": 20, "use_images": False, "use_imu": False,
            "use_joint_states": False, "use_gamestate": False,
            "num_action_history_encoder_layers": 1, "num_decoder_layers": 1,
            "train_denoising_timesteps": 50,
        }
        teacher = tmp_path / "teacher.ckpt"
        save_checkpoint(str(teacher), state, norm, params, 0)
        s_params = dict(params, distilled_num_steps=2)
        student = tmp_path / "student2.ckpt"
        save_checkpoint(str(student), state, norm, s_params, 0)

        out = tmp_path / "report"
        result = report_main([
            "--teacher", str(teacher), "--student", str(student),
            "--dummy-data", "--windows", "8", "--chunks", "2",
            "--batch-size", "8", "--out", str(out),
        ])
        assert (out.with_suffix(".json")).exists()
        md = (out.with_suffix(".md")).read_text()
        assert "ddim2" in md and "ddim30" in md
        loaded = json.loads(out.with_suffix(".json").read_text())
        assert len(loaded["checkpoints"]) == 2
        assert loaded["checkpoints"][1]["divergence"]["num_chunks"] == 2
        assert result["teacher_self_consistency"]["mean_divergence_rad"] > 0


class TestContextSensitivity:
    def test_shuffled_context_ratio_shape_and_fields(self):
        from soccerdiffusion_tpu.evaluation import context_sensitivity

        ds, model, sched, _, state, norm = setup()
        variables = {"params": state.params}
        idx = held_out_indices(len(ds), 32, 0)
        out = context_sensitivity(model, variables, norm, sched, ds,
                                  idx, t_fracs=(0.1, 0.9), batch_size=16)
        assert set(out["per_t"]) == {"0.10", "0.90"}
        for v in out["per_t"].values():
            assert v["eps_mse_true"] > 0 and v["eps_mse_shuffled"] > 0
            assert v["ratio"] == v["eps_mse_shuffled"] / v["eps_mse_true"]
        assert out["min_ratio"] == min(v["ratio"] for v in out["per_t"].values())

    def test_identity_shuffle_gives_ratio_one(self):
        """With a single-sample batch the permutation is the identity, so
        true and shuffled context coincide exactly."""
        from soccerdiffusion_tpu.evaluation import context_sensitivity

        ds, model, sched, _, state, norm = setup()
        variables = {"params": state.params}
        idx = held_out_indices(len(ds), 4, 0)
        out = context_sensitivity(model, variables, norm, sched, ds,
                                  idx, t_fracs=(0.5,), batch_size=1)
        assert abs(out["min_ratio"] - 1.0) < 1e-6


class TestSolverRows:
    def test_dpmpp_open_loop_and_agreement(self):
        ds, model, sched, _, state, norm = setup()
        variables = {"params": state.params}
        idx = held_out_indices(len(ds), 16, seed=3)
        m = open_loop_metrics(model, variables, norm, sched, ds, idx,
                              num_steps=5, distilled=False, batch_size=8,
                              solver="dpmpp")
        assert m["sampler"] == "dpmpp5"
        assert np.isfinite(m["mse"])
        # dpmpp-at-many-steps must closely agree with the ddim teacher on
        # identical noise (both integrate the same ODE)
        a_hi = sampler_agreement(model, variables, variables, norm, sched,
                                 ds, idx, teacher_steps=25, student_steps=25,
                                 student_distilled=False, batch_size=8,
                                 student_solver="dpmpp")
        a_lo = sampler_agreement(model, variables, variables, norm, sched,
                                 ds, idx, teacher_steps=25, student_steps=3,
                                 student_distilled=False, batch_size=8,
                                 student_solver="dpmpp")
        assert a_hi["student"] == "dpmpp25"
        assert a_hi["mse_vs_teacher"] < a_lo["mse_vs_teacher"]

    def test_report_solver_rows(self, tmp_path):
        from soccerdiffusion_tpu.evaluation.report import run_report
        from soccerdiffusion_tpu.training.checkpoint import save_checkpoint

        ds, model, sched, _, state, norm = setup()
        params = {
            "num_joints": 6, "hidden_dim": 32,
            "trajectory_prediction_length": 5,
            "action_context_length": 20, "joint_state_context_length": 20,
            "imu_context_length": 20, "use_images": False, "use_imu": False,
            "use_joint_states": False, "use_gamestate": False,
            "num_action_history_encoder_layers": 1, "num_decoder_layers": 1,
            "train_denoising_timesteps": 50,
        }
        ckpt = tmp_path / "teacher.ckpt"
        save_checkpoint(str(ckpt), state, norm, params, 0)
        result = run_report(str(ckpt), [], ds, windows=8, chunks=2,
                            batch_size=8, solver_rows=[("dpmpp", 4)])
        names = [c["name"] for c in result["checkpoints"]]
        assert "teacher+dpmpp4" in names
        row = result["checkpoints"][names.index("teacher+dpmpp4")]
        assert row["open_loop"]["sampler"] == "dpmpp4"
        assert np.isfinite(row["agreement"]["mse_vs_teacher"])
        assert np.isfinite(row["divergence"]["mean_divergence_rad"])
        assert "teacher_self_consistency" in result


class TestGuidance:
    """Classifier-free guidance at sampling time (openloop.py
    sample_trajectories; unconditional branch from data/pipeline.py
    null_modalities)."""

    def _contexts(self):
        ds, model, sched, _, state, norm = setup()
        variables = {"params": state.params}
        from soccerdiffusion_tpu.data.pipeline import null_modalities
        from soccerdiffusion_tpu.evaluation.openloop import eval_batches

        idx = held_out_indices(len(ds), 8, 0)
        batch = next(eval_batches(ds, idx, 8))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        ctx = model.apply(variables, jb, False, method=model.encode_context)
        jb_u = null_modalities(jb, ("action_history",))
        ctx_u = model.apply(variables, jb_u, False, method=model.encode_context)
        noise = jax.random.normal(jax.random.key(0), (8, 5, 6), jnp.float32)
        return ds, model, sched, variables, norm, ctx, ctx_u, noise

    def test_w0_equals_unconditional_w2_differs(self):
        from soccerdiffusion_tpu.evaluation.openloop import sample_trajectories

        _, model, sched, variables, _, ctx, ctx_u, noise = self._contexts()
        # w=0: the guided score IS the unconditional score — the doubled-
        # batch CFG pass must reproduce plain sampling on the null context
        g0 = sample_trajectories(model, variables, sched, ctx, noise, 4,
                                 False, uncond_context=ctx_u,
                                 guidance_scale=0.0)
        uncond = sample_trajectories(model, variables, sched, ctx_u, noise,
                                     4, False)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(uncond),
                                   atol=1e-5)
        # w=1 short-circuits to the plain conditional path
        g1 = sample_trajectories(model, variables, sched, ctx, noise, 4,
                                 False, uncond_context=ctx_u,
                                 guidance_scale=1.0)
        plain = sample_trajectories(model, variables, sched, ctx, noise, 4,
                                    False)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(plain))
        # w=2 extrapolates beyond the conditional score
        g2 = sample_trajectories(model, variables, sched, ctx, noise, 4,
                                 False, uncond_context=ctx_u,
                                 guidance_scale=2.0)
        assert not np.allclose(np.asarray(g2), np.asarray(plain), atol=1e-5)

    def test_distilled_guidance_raises(self):
        import pytest

        from soccerdiffusion_tpu.evaluation.openloop import sample_trajectories

        _, model, sched, variables, _, ctx, ctx_u, noise = self._contexts()
        with pytest.raises(ValueError, match="iterative sampler"):
            sample_trajectories(model, variables, sched, ctx, noise, 1,
                                True, uncond_context=ctx_u,
                                guidance_scale=2.0)

    def test_open_loop_metrics_guided(self):
        ds, model, sched, variables, norm, *_ = self._contexts()
        idx = held_out_indices(len(ds), 8, 0)
        m = open_loop_metrics(model, variables, norm, sched, ds, idx,
                              num_steps=4, distilled=False, batch_size=8,
                              guidance_scale=1.5,
                              guidance_null=("action_history",))
        assert m["sampler"] == "ddim4+cfg1.5(action_history)"
        assert np.isfinite(m["mse"]) and np.isfinite(m["mae"])

    def test_report_guidance_rows(self, tmp_path):
        from soccerdiffusion_tpu.evaluation.report import (
            markdown_report,
            run_report,
        )
        from soccerdiffusion_tpu.training.checkpoint import save_checkpoint

        ds, model, sched, _, state, norm = setup()
        params = {
            "num_joints": 6, "hidden_dim": 32,
            "trajectory_prediction_length": 5,
            "action_context_length": 20, "joint_state_context_length": 20,
            "imu_context_length": 20, "use_images": False, "use_imu": False,
            "use_joint_states": False, "use_gamestate": False,
            "num_action_history_encoder_layers": 1, "num_decoder_layers": 1,
            "train_denoising_timesteps": 50,
        }
        ckpt = tmp_path / "teacher.ckpt"
        save_checkpoint(str(ckpt), state, norm, params, 0)
        result = run_report(str(ckpt), [], ds, windows=8, chunks=2,
                            batch_size=8,
                            guidance_rows=[(1.5, ("action_history",))])
        (row,) = result["guidance"]
        assert row["sampler"] == "ddim30+cfg1.5(action_history)"
        assert np.isfinite(row["mse"]) and row["true_mse"] > 0
        md = markdown_report(result)
        assert "cfg1.5" in md and "w=1 (unguided)" in md


class TestVisionOracle:
    """Bayes-oracle calibration for the vision task (evaluation/oracle.py)."""

    def _vision_ds(self, num_joints=8, n=400):
        cfg = ModelConfig(
            num_joints=num_joints, hidden_dim=32,
            trajectory_prediction_length=10,
            action_context_length=20, joint_state_context_length=20,
            imu_context_length=20, use_images=True, image_context_length=2,
            image_resolution=32, image_encoder_type="vit", vit_patch_size=8,
            vit_width=32, vit_depth=1, num_image_sequence_encoder_layers=1,
            use_imu=False, use_gamestate=False,
            num_action_history_encoder_layers=1, num_decoder_layers=1,
        )
        dummy = generate_dummy_arrays(
            2, n, num_joints=num_joints, image_size=32, task="vision", seed=3)
        return WindowedDataset.from_dummy(dummy, cfg), dummy

    def test_boundary_windows_show_large_achievable_gap(self):
        from soccerdiffusion_tpu.evaluation.oracle import vision_oracle_open_loop

        ds, dummy = self._vision_ds()
        b_idx = ds.image_boundary_indices()[:64]
        out = vision_oracle_open_loop(ds, b_idx, num_samples=8, seed=0)
        # at a boundary the whole 10-tick chunk is driven by the just-visible
        # cue: the cued oracle is process-noise-limited, the blind one must
        # guess u ~ U[-1,1]
        assert out["mse_cued"] < 0.02
        assert out["ratio_blind_over_cued"] > 3.0

    def test_midwindow_blind_recovers_cue_from_history(self):
        """The blind oracle is NOT naive: mid-interval it estimates the cue
        from proprioceptive history, so its error approaches the cued one."""
        from soccerdiffusion_tpu.evaluation.oracle import vision_oracle_open_loop

        ds, dummy = self._vision_ds()
        b = ds.image_boundary_indices()
        mid = (b[:48] + 5)  # 5 ticks into the interval
        mid = mid[mid < len(ds)]
        out = vision_oracle_open_loop(ds, mid, num_samples=8, seed=0)
        bound = vision_oracle_open_loop(ds, b[:48], num_samples=8, seed=0)
        assert out["ratio_blind_over_cued"] < 1.1
        assert out["ratio_blind_over_cued"] < bound["ratio_blind_over_cued"]

    def test_cue_estimator_accuracy(self):
        from soccerdiffusion_tpu.evaluation.oracle import (
            _estimate_cue_from_history,
        )

        ds, dummy = self._vision_ds()
        d = dummy[0]
        stamps = np.asarray(d.image_stamps, dtype=np.float64)
        step = int(round((stamps[1] - stamps[0]) * ds.sampling_rate))
        for k in (3, 7, 11):
            u_est = _estimate_cue_from_history(
                d.joint_commands[:, :8], d.vision_dirs[:8].astype(np.float64),
                k * step, k * step + 4)
            assert abs(u_est - float(d.vision_u[k])) < 0.1

    def test_raises_without_vision_latents(self):
        import pytest

        from soccerdiffusion_tpu.evaluation.oracle import vision_oracle_open_loop

        dummy = generate_dummy_arrays(1, 200, num_joints=6)
        ds = WindowedDataset.from_dummy(dummy, CFG)
        with pytest.raises(ValueError):
            vision_oracle_open_loop(ds, [0, 1])


class TestPosteriorMeanReport:
    """Posterior-mean boundary rows (report.py): every checkpoint —
    including distilled students — gets rows, each carrying its NFE/replan
    serving cost (VERDICT r4: the deployable point must be measurable with
    the estimator that met the camera-use bar)."""

    def test_rows_cover_students_with_nfe(self, tmp_path):
        from soccerdiffusion_tpu.evaluation.report import main as report_main
        from soccerdiffusion_tpu.training.checkpoint import save_checkpoint

        params = {
            "num_joints": 8, "hidden_dim": 32,
            "trajectory_prediction_length": 10,
            "action_context_length": 20, "joint_state_context_length": 20,
            "imu_context_length": 20, "use_images": True,
            "image_context_length": 2, "image_resolution": 32,
            "image_encoder_type": "vit", "vit_patch_size": 8,
            "vit_width": 32, "vit_depth": 1,
            "num_image_sequence_encoder_layers": 1,
            "use_imu": False, "use_gamestate": False,
            "num_action_history_encoder_layers": 1, "num_decoder_layers": 1,
            "train_denoising_timesteps": 50,
            "distill_teacher_inference_steps": 5,
            "dummy_task": "vision", "modality_dropout": 0.2,
        }
        from soccerdiffusion_tpu.config import Config
        from soccerdiffusion_tpu.data import WindowedDataset, generate_dummy_arrays
        from soccerdiffusion_tpu.data.normalizer import Normalizer

        cfg = Config.from_dict(params)
        model = DiffusionPolicy(cfg.model)
        dummy = generate_dummy_arrays(2, 300, num_joints=8, image_size=32,
                                      task="vision", seed=3)
        ds = WindowedDataset.from_dummy(dummy, cfg.model)
        opt = make_optimizer(1e-3, total_steps=10, use_onecycle=False)
        batch = next(ds.batches(4, shuffle=False))
        state = create_train_state(model, jax.device_put(batch), opt,
                                   jax.random.key(0), 10, 8)
        norm = Normalizer.identity(8)
        teacher = tmp_path / "teacher.ckpt"
        save_checkpoint(str(teacher), state, norm, params, 0)
        student = tmp_path / "student1.ckpt"
        save_checkpoint(str(student), state, norm,
                        dict(params, distilled_decoder=True,
                             distilled_teacher_draws=2), 0)

        out = tmp_path / "report"
        result = report_main([
            "--teacher", str(teacher), "--student", str(student),
            "--dummy-data", "--windows", "8", "--chunks", "2",
            "--batch-size", "8", "--out", str(out),
            "--guidance-row", "2.0@image", "--posterior-mean", "2",
        ])
        pm = result["posterior_mean_boundary"]
        rows = {(r["name"], r["k"], r["scale"]): r for r in pm["rows"]}
        # teacher: unguided + the image guidance row, both at K=2
        assert rows[("teacher", 2, 1.0)]["nfe"] == 5 * 2
        assert rows[("teacher", 2, 2.0)]["nfe"] == 5 * 2 * 2
        # student (distilled single-forward): K=1 single-draw (1 NFE,
        # the cheapest deployable point) and the xmeanK row (K NFEs)
        assert rows[("student1.ckpt", 1, 1.0)]["nfe"] == 1
        assert rows[("student1.ckpt", 2, 1.0)]["nfe"] == 2
        for r in pm["rows"]:
            assert np.isfinite(r["true_mse"]) and np.isfinite(r["shuffled_mse"])
        md = out.with_suffix(".md").read_text()
        assert "NFE/replan" in md and "distilled1" in md

    def test_distilled_teacher_gets_rows(self, tmp_path):
        """A distilled checkpoint passed as --teacher must still produce
        posterior-mean rows (the r4 gate excluded it); guidance rows are
        skipped for it (no score to guide) without error."""
        from soccerdiffusion_tpu.evaluation.report import main as report_main
        from soccerdiffusion_tpu.training.checkpoint import save_checkpoint

        params = {
            "num_joints": 8, "hidden_dim": 32,
            "trajectory_prediction_length": 10,
            "action_context_length": 20, "joint_state_context_length": 20,
            "imu_context_length": 20, "use_images": True,
            "image_context_length": 2, "image_resolution": 32,
            "image_encoder_type": "vit", "vit_patch_size": 8,
            "vit_width": 32, "vit_depth": 1,
            "num_image_sequence_encoder_layers": 1,
            "use_imu": False, "use_gamestate": False,
            "num_action_history_encoder_layers": 1, "num_decoder_layers": 1,
            "train_denoising_timesteps": 50,
            "distill_teacher_inference_steps": 5,
            "dummy_task": "vision", "distilled_decoder": True,
        }
        from soccerdiffusion_tpu.config import Config
        from soccerdiffusion_tpu.data import WindowedDataset, generate_dummy_arrays
        from soccerdiffusion_tpu.data.normalizer import Normalizer

        cfg = Config.from_dict(params)
        model = DiffusionPolicy(cfg.model)
        dummy = generate_dummy_arrays(2, 300, num_joints=8, image_size=32,
                                      task="vision", seed=3)
        ds = WindowedDataset.from_dummy(dummy, cfg.model)
        opt = make_optimizer(1e-3, total_steps=10, use_onecycle=False)
        batch = next(ds.batches(4, shuffle=False))
        state = create_train_state(model, jax.device_put(batch), opt,
                                   jax.random.key(0), 10, 8)
        ckpt = tmp_path / "student_as_teacher.ckpt"
        save_checkpoint(str(ckpt), state, Normalizer.identity(8), params, 0)
        out = tmp_path / "report_d"
        result = report_main([
            "--teacher", str(ckpt), "--dummy-data", "--windows", "8",
            "--chunks", "2", "--batch-size", "8", "--out", str(out),
            "--guidance-row", "2.0@image", "--posterior-mean", "2",
        ])
        pm = result["posterior_mean_boundary"]
        assert len(pm["rows"]) == 1  # unguided only; guided skipped
        assert pm["rows"][0]["nfe"] == 2  # distilled: 1 step x K=2
