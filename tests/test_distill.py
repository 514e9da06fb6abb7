"""Distillation tests: student converges toward the teacher's sampler output,
gradients don't touch the teacher, distilled checkpoint carries the flag."""

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data import Normalizer, WindowedDataset, generate_dummy_arrays
from soccerdiffusion_tpu.diffusion import make_schedule
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
    return ds, model, sched, opt, state


class TestDistill:
    def test_loss_decreases_and_teacher_frozen(self):
        ds, model, sched, opt, state = setup()
        teacher_params = jax.tree.map(jnp.copy, state.params)
        step = make_distill_step(model, sched, opt, teacher_inference_steps=5, donate=False)
        losses = []
        for epoch in range(4):
            for batch in ds.batches(8, shuffle=True, seed=epoch):
                state, m = step(state, teacher_params, jax.device_put(batch), 0)
                losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:3])
        # teacher params unchanged
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            teacher_params, jax.tree.map(jnp.copy, teacher_params),
        )

    def test_student_single_step_approaches_teacher_rollout(self):
        ds, model, sched, opt, state = setup()
        teacher_params = jax.tree.map(jnp.copy, state.params)
        step = make_distill_step(model, sched, opt, teacher_inference_steps=5, donate=False)
        batch = jax.device_put(next(ds.batches(8, shuffle=False)))
        first = float(step(state, teacher_params, batch, 0)[1]["loss"])
        for epoch in range(6):
            for b in ds.batches(8, shuffle=True, seed=epoch):
                state, m = step(state, teacher_params, jax.device_put(b), 0)
        last = float(step(state, teacher_params, batch, 0)[1]["loss"])
        assert last < first


class TestGuidanceDistill:
    """Guidance distillation (make_distill_step guidance_scale/guidance_null):
    the teacher rollout runs CFG-guided, the student bakes it in."""

    def test_w1_or_no_null_short_circuits_to_unguided(self):
        ds, model, sched, opt, state = setup()
        teacher_params = jax.tree.map(jnp.copy, state.params)
        batch = jax.device_put(next(ds.batches(8, shuffle=False)))
        plain = make_distill_step(model, sched, opt, teacher_inference_steps=5,
                                  donate=False)
        w1 = make_distill_step(model, sched, opt, teacher_inference_steps=5,
                               donate=False, guidance_scale=1.0,
                               guidance_null=("action_history",))
        nonull = make_distill_step(model, sched, opt, teacher_inference_steps=5,
                                   donate=False, guidance_scale=3.0)
        l0 = float(plain(state, teacher_params, batch, 0)[1]["loss"])
        assert float(w1(state, teacher_params, batch, 0)[1]["loss"]) == l0
        assert float(nonull(state, teacher_params, batch, 0)[1]["loss"]) == l0

    def test_guided_teacher_target_differs_and_trains(self):
        ds, model, sched, opt, state = setup()
        teacher_params = jax.tree.map(jnp.copy, state.params)
        batch = jax.device_put(next(ds.batches(8, shuffle=False)))
        plain = make_distill_step(model, sched, opt, teacher_inference_steps=5,
                                  donate=False)
        guided = make_distill_step(model, sched, opt, teacher_inference_steps=5,
                                   donate=False, guidance_scale=3.0,
                                   guidance_null=("action_history",))
        l_plain = float(plain(state, teacher_params, batch, 0)[1]["loss"])
        l_guided = float(guided(state, teacher_params, batch, 0)[1]["loss"])
        assert np.isfinite(l_guided) and l_guided != l_plain
        # and the guided objective is trainable
        losses = []
        for epoch in range(4):
            for b in ds.batches(8, shuffle=True, seed=epoch):
                state, m = guided(state, teacher_params, jax.device_put(b), 0)
                losses.append(float(m["loss"]))
        assert np.mean(losses[-5:]) < 0.6 * np.mean(losses[:3])

    def test_cli_guidance_records_provenance(self, tmp_path):
        """distill CLI --guidance: checkpoint hyperparams carry the scale and
        nulled modalities (teacher checkpoint crafted directly — only the
        distill main runs; slow tier, ~2 min of CPU compiles)."""
        import yaml

        from soccerdiffusion_tpu.data import Normalizer
        from soccerdiffusion_tpu.training import distill as distill_mod
        from soccerdiffusion_tpu.training.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )

        # flat reference-style hyperparameter dict (Config.from_dict)
        cfg = {
            "num_joints": 6, "hidden_dim": 32,
            "trajectory_prediction_length": 5,
            "action_context_length": 20,
            "joint_state_context_length": 20,
            "imu_context_length": 20,
            "use_images": False, "use_imu": False,
            "use_joint_states": False, "use_gamestate": False,
            "num_action_history_encoder_layers": 1,
            "num_decoder_layers": 1,
            "batch_size": 8, "epochs": 1, "lr": 1e-3,
            "train_denoising_timesteps": 50,
            "distill_teacher_inference_steps": 5,
        }
        cfg_path = tmp_path / "cfg.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        _, model, _, _, state = setup()
        teacher = tmp_path / "teacher.ckpt"
        save_checkpoint(str(teacher), state,
                        Normalizer.identity(6), cfg, 0)
        out = tmp_path / "student.ckpt"
        distill_mod.main([
            str(cfg_path), str(teacher), "-o", str(out), "--dummy-data",
            "--epochs", "1", "--steps-per-epoch", "2",
            "--guidance", "2.5@action_history", "--teacher-draws", "2"])
        hp = load_checkpoint(str(out))["hyperparams"]
        assert hp["distilled_decoder"] is True
        assert hp["distilled_guidance_scale"] == 2.5
        assert hp["distilled_guidance_null"] == ["action_history"]
        assert hp["distilled_teacher_draws"] == 2


class TestPosteriorMeanDistill:
    """Posterior-mean distillation (make_distill_step teacher_draws=K): the
    target is the average of K independent-noise teacher rollouts."""

    def test_draws1_matches_plain_and_validation(self):
        import pytest

        ds, model, sched, opt, state = setup()
        teacher_params = jax.tree.map(jnp.copy, state.params)
        batch = jax.device_put(next(ds.batches(8, shuffle=False)))
        plain = make_distill_step(model, sched, opt, teacher_inference_steps=5,
                                  donate=False)
        d1 = make_distill_step(model, sched, opt, teacher_inference_steps=5,
                               donate=False, teacher_draws=1)
        l_plain = float(plain(state, teacher_params, batch, 0)[1]["loss"])
        assert float(d1(state, teacher_params, batch, 0)[1]["loss"]) == l_plain
        with pytest.raises(ValueError):
            make_distill_step(model, sched, opt, teacher_draws=0)

    def test_mean_target_differs_and_trains(self):
        ds, model, sched, opt, state = setup()
        teacher_params = jax.tree.map(jnp.copy, state.params)
        batch = jax.device_put(next(ds.batches(8, shuffle=False)))
        plain = make_distill_step(model, sched, opt, teacher_inference_steps=5,
                                  donate=False)
        pm = make_distill_step(model, sched, opt, teacher_inference_steps=5,
                               donate=False, teacher_draws=4)
        l_plain = float(plain(state, teacher_params, batch, 0)[1]["loss"])
        l_pm = float(pm(state, teacher_params, batch, 0)[1]["loss"])
        assert np.isfinite(l_pm) and l_pm != l_plain
        losses = []
        for epoch in range(4):
            for b in ds.batches(8, shuffle=True, seed=epoch):
                state, m = pm(state, teacher_params, jax.device_put(b), 0)
                losses.append(float(m["loss"]))
        assert np.mean(losses[-5:]) < 0.6 * np.mean(losses[:3])

    def test_composes_with_guidance(self):
        """--guidance + --teacher-draws together: each draw's rollout runs
        CFG-guided; the averaged guided target is finite and trainable."""
        ds, model, sched, opt, state = setup()
        teacher_params = jax.tree.map(jnp.copy, state.params)
        batch = jax.device_put(next(ds.batches(8, shuffle=False)))
        both = make_distill_step(model, sched, opt, teacher_inference_steps=5,
                                 donate=False, guidance_scale=3.0,
                                 guidance_null=("action_history",),
                                 teacher_draws=3)
        state, m = both(state, teacher_params, batch, 0)
        assert np.isfinite(float(m["loss"]))
