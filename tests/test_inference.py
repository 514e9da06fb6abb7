"""Inference tests: chunk sampler, controller buffer semantics
(reference ros.py:264-318), chunk player, batched rollout engine."""

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data import Normalizer
from soccerdiffusion_tpu.diffusion import make_schedule
from soccerdiffusion_tpu.inference import (
    RolloutEngine,
    init_controller_state,
    make_chunk_sampler,
    make_controller_batch,
    observe,
    push_action_chunk,
    select_action,
)
from soccerdiffusion_tpu.models import DiffusionPolicy

CFG = ModelConfig(
    num_joints=8, hidden_dim=32, trajectory_prediction_length=5,
    action_context_length=20, joint_state_context_length=20, imu_context_length=20,
    use_images=False, use_gamestate=True,
    num_action_history_encoder_layers=1, num_imu_encoder_layers=1,
    joint_state_encoder_layers=1, num_decoder_layers=1,
)


def make_model():
    model = DiffusionPolicy(CFG)
    state = init_controller_state(CFG, batch_size=2)
    batch = make_controller_batch(CFG, state)
    noisy = jnp.zeros((2, 5, 8))
    variables = model.init(jax.random.key(0), batch, noisy, jnp.zeros((2,), jnp.int32))
    return model, variables


class TestController:
    def test_observe_rolls_buffers(self):
        state = init_controller_state(CFG, batch_size=2)
        js = jnp.ones((2, 8)) * 0.5
        state = observe(state, joint_state=js, imu=jnp.ones((2, 4)) * 0.1)
        assert state.joint_state_history.shape == (2, 20, 8)
        np.testing.assert_allclose(np.asarray(state.joint_state_history[:, -1]), 0.5)
        np.testing.assert_allclose(np.asarray(state.joint_state_history[:, 0]), 0.0)
        np.testing.assert_allclose(np.asarray(state.imu_history[:, -1]), 0.1)

    def test_batch_shift_to_positive_range(self):
        state = init_controller_state(CFG, batch_size=1)
        state = observe(state, joint_state=jnp.full((1, 8), -jnp.pi / 2))
        batch = make_controller_batch(CFG, state)
        # (x + 3*pi) % 2*pi is an x -> x + pi shift: -pi/2 -> pi/2
        # (reference ros.py:266-273, utils/utils.py:47-54)
        np.testing.assert_allclose(
            np.asarray(batch["joint_state"][0, -1]), np.pi / 2, rtol=1e-6
        )
        # zero-filled history maps to +pi
        np.testing.assert_allclose(np.asarray(batch["joint_state"][0, 0]), np.pi, rtol=1e-6)

    def test_push_action_chunk_applies_minus_pi(self):
        state = init_controller_state(CFG, batch_size=1)
        chunk = jnp.full((1, 5, 8), jnp.pi + 0.25)  # [0, 2pi) domain
        state = push_action_chunk(state, chunk)
        np.testing.assert_allclose(
            np.asarray(state.joint_command_history[0, -5:]), 0.25, rtol=1e-6
        )

    def test_default_game_state_is_stopped(self):
        state = init_controller_state(CFG, batch_size=3)
        np.testing.assert_array_equal(np.asarray(state.game_state), [2, 2, 2])


class TestSampler:
    def test_chunk_sampler_shapes_and_determinism(self):
        model, variables = make_model()
        sched = make_schedule(100)
        norm = Normalizer.identity(8)
        sampler = make_chunk_sampler(model, sched, norm, num_inference_steps=5)
        state = init_controller_state(CFG, batch_size=2)
        batch = make_controller_batch(CFG, state)
        a = sampler(variables, batch, jax.random.key(1))
        b = sampler(variables, batch, jax.random.key(1))
        assert a.shape == (2, 5, 8)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_distilled_single_step(self):
        model, variables = make_model()
        sched = make_schedule(100)
        norm = Normalizer.identity(8)
        sampler = make_chunk_sampler(model, sched, norm, distilled=True)
        state = init_controller_state(CFG, batch_size=2)
        batch = make_controller_batch(CFG, state)
        out = sampler(variables, batch, jax.random.key(0))
        assert out.shape == (2, 5, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_denormalization_applied(self):
        model, variables = make_model()
        sched = make_schedule(100)
        norm = Normalizer(mean=jnp.full((8,), 100.0), std=jnp.ones(8))
        sampler = make_chunk_sampler(model, sched, norm, num_inference_steps=2)
        state = init_controller_state(CFG, batch_size=1)
        out = sampler(variables, make_controller_batch(CFG, state), jax.random.key(0))
        assert float(np.asarray(out).mean()) > 50.0


class TestGuidedServing:
    """Classifier-free guidance on the serving paths (inference/sampler.py
    make_chunk_sampler, inference/rollout.py RolloutEngine)."""

    def test_guided_sampler_w0_equals_nulled_batch(self):
        from soccerdiffusion_tpu.data.pipeline import null_modalities

        model, variables = make_model()
        state = init_controller_state(CFG, batch_size=2)
        batch = make_controller_batch(CFG, state)
        sched = make_schedule(50)
        norm = Normalizer.identity(8)
        nulled = ("action_history", "imu")
        guided = make_chunk_sampler(model, sched, norm, num_inference_steps=4,
                                    guidance_scale=0.0, guidance_null=nulled)
        plain = make_chunk_sampler(model, sched, norm, num_inference_steps=4)
        # w=0: the guided score is exactly the unconditional branch, i.e.
        # plain sampling on the pre-nulled batch
        g = guided(variables, batch, jax.random.key(1))
        u = plain(variables, null_modalities(batch, nulled), jax.random.key(1))
        np.testing.assert_allclose(np.asarray(g), np.asarray(u), atol=1e-5)
        # w=2 extrapolates: differs from both the conditional and the
        # unconditional samples
        g2 = make_chunk_sampler(model, sched, norm, num_inference_steps=4,
                                guidance_scale=2.0, guidance_null=nulled)(
            variables, batch, jax.random.key(1))
        c = plain(variables, batch, jax.random.key(1))
        assert g2.shape == c.shape == (2, 5, 8)
        assert not np.allclose(np.asarray(g2), np.asarray(c), atol=1e-5)

    def test_guided_sampler_rejections(self):
        import pytest

        model, _ = make_model()
        sched = make_schedule(50)
        norm = Normalizer.identity(8)
        with pytest.raises(ValueError, match="iterative sampler"):
            make_chunk_sampler(model, sched, norm, distilled=True,
                               guidance_scale=2.0)
        with pytest.raises(ValueError, match="unknown modality"):
            make_chunk_sampler(model, sched, norm, guidance_scale=2.0,
                               guidance_null=("camera",))

    def test_guided_rollout_runs_and_differs(self):
        model, variables = make_model()
        sched = make_schedule(50)
        norm = Normalizer.identity(8)
        kw = dict(num_inference_steps=3)
        plain = RolloutEngine(model, sched, norm, **kw)
        guided = RolloutEngine(model, sched, norm, guidance_scale=3.0,
                               guidance_null=("imu",), **kw)
        c0 = plain.init(2, jax.random.key(2))
        c1 = guided.init(2, jax.random.key(2))
        _, traj_p = plain.make_rollout_fn(num_chunks=2, jit=False)(variables, c0)
        _, traj_g = guided.make_rollout_fn(num_chunks=2, jit=False)(variables, c1)
        assert np.isfinite(np.asarray(traj_g)).all()
        assert not np.allclose(np.asarray(traj_g), np.asarray(traj_p),
                               atol=1e-5)

    def test_guided_rollout_rejects_fused_and_distilled(self):
        import pytest

        model, _ = make_model()
        sched = make_schedule(50)
        norm = Normalizer.identity(8)
        for bad in (dict(fused="chunk"), dict(distilled=True)):
            with pytest.raises(ValueError, match="XLA iterative sampler"):
                RolloutEngine(model, sched, norm, guidance_scale=2.0, **bad)

    def test_parse_guidance_spec(self):
        """One shared SCALE[@MODALITY,...] parser for serve/plot/report
        (advisor r3: malformed --guidance used to traceback in serve/plot
        while report validated)."""
        import pytest

        from soccerdiffusion_tpu.data.pipeline import parse_guidance_spec

        assert parse_guidance_spec("2.0") == (2.0, ("image",))
        assert parse_guidance_spec("1.5@imu,game_state") == \
            (1.5, ("imu", "game_state"))
        assert parse_guidance_spec("3@all") == (3.0, ("all",))
        with pytest.raises(ValueError, match="not a number"):
            parse_guidance_spec("image")
        with pytest.raises(ValueError, match="not a number"):
            parse_guidance_spec("@image")
        with pytest.raises(ValueError, match="unknown modality"):
            parse_guidance_spec("2.0@camera")

    def test_inactive_modality_guidance_warns(self, caplog):
        """Guiding a modality the config never conditions on is a silent
        no-op (eps_u == eps_c); both serving constructors warn (advisor
        r3, inference/sampler.py + rollout.py)."""
        import logging

        model, _ = make_model()  # CFG: use_images=False
        sched = make_schedule(50)
        norm = Normalizer.identity(8)
        with caplog.at_level(logging.WARNING, logger="soccerdiffusion_tpu"):
            make_chunk_sampler(model, sched, norm, guidance_scale=2.0,
                               guidance_null=("image",))
        assert any("no-op" in r.message for r in caplog.records)
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger="soccerdiffusion_tpu"):
            RolloutEngine(model, sched, norm, guidance_scale=2.0,
                          guidance_null=("image",))
        assert any("no-op" in r.message for r in caplog.records)
        # an ACTIVE modality does not warn
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger="soccerdiffusion_tpu"):
            make_chunk_sampler(model, sched, norm, guidance_scale=2.0,
                               guidance_null=("imu",))
        assert not any("no-op" in r.message for r in caplog.records)


class TestPlayer:
    def test_select_action_by_wall_clock(self):
        chunk = jnp.arange(5 * 2, dtype=jnp.float32).reshape(5, 2)
        # at start -> first point
        np.testing.assert_array_equal(np.asarray(select_action(chunk, 0.0, 0.0)), [0, 1])
        # 60 ms in at 50 Hz -> index 3
        np.testing.assert_array_equal(np.asarray(select_action(chunk, 0.0, 0.061)), [6, 7])
        # past the end -> clamp to last
        np.testing.assert_array_equal(np.asarray(select_action(chunk, 0.0, 1.0)), [8, 9])


class TestRolloutEngine:
    def test_rollout_runs_and_updates_buffers(self):
        model, variables = make_model()
        engine = RolloutEngine(
            model, make_schedule(100), Normalizer.identity(8), num_inference_steps=3
        )
        carry = engine.init(batch_size=4, rng=jax.random.key(0))
        rollout = engine.make_rollout_fn(num_chunks=2, jit=True)
        carry, chunks = rollout(variables, carry)
        assert chunks.shape == (2, 4, 5, 8)
        assert np.isfinite(np.asarray(chunks)).all()
        # action history must now contain fed-back predictions (non-zero)
        hist = np.asarray(carry.controller.joint_command_history)
        assert np.any(hist != 0)

    def test_plant_closed_form_matches_iterated_ticks(self):
        # _plant_play_chunk is the linear recurrence in closed form; it must
        # match _plant_tick iterated over the chunk.
        model, variables = make_model()
        engine = RolloutEngine(
            model, make_schedule(100), Normalizer.identity(8), num_inference_steps=2
        )
        carry = engine.init(batch_size=3, rng=jax.random.key(0))
        chunk = jax.random.uniform(
            jax.random.key(7), (3, model.config.trajectory_prediction_length, 8),
            minval=0.0, maxval=2 * np.pi,
        )
        plant_cf, js_cf, imu_cf = engine._plant_play_chunk(carry.plant, chunk)
        plant_it = carry.plant
        js_it, imu_it = [], []
        for p in range(model.config.trajectory_prediction_length):
            plant_it, js, imu = engine._plant_tick(plant_it, chunk[:, p])
            js_it.append(js)
            imu_it.append(imu)
        np.testing.assert_allclose(np.asarray(js_cf), np.stack([np.asarray(x) for x in js_it], 1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(imu_cf), np.stack([np.asarray(x) for x in imu_it], 1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(plant_cf.positions),
                                   np.asarray(plant_it.positions), atol=1e-5)
        np.testing.assert_allclose(np.asarray(plant_cf.phase),
                                   np.asarray(plant_it.phase), atol=1e-5)

    def test_receding_horizon_executes_chunk_prefix(self):
        # replan_every=2: each period plays only the first 2 of the 5
        # predicted ticks. With identical rng the sampled chunk is identical
        # to the full-chunk engine's, so the executed prefix must equal the
        # full chunk's first 2 rows, and the buffers must advance 2 rows.
        model, variables = make_model()
        full = RolloutEngine(
            model, make_schedule(100), Normalizer.identity(8), num_inference_steps=2
        )
        rh = RolloutEngine(
            model, make_schedule(100), Normalizer.identity(8), num_inference_steps=2,
            replan_every=2,
        )
        c_full = full.init(batch_size=3, rng=jax.random.key(5))
        c_rh = rh.init(batch_size=3, rng=jax.random.key(5))
        c_full2, chunk_full = full.replan_period(variables, c_full)
        c_rh2, executed = rh.replan_period(variables, c_rh)
        assert executed.shape == (3, 2, 8)
        np.testing.assert_allclose(np.asarray(executed),
                                   np.asarray(chunk_full[:, :2]), atol=1e-6)
        # action history: last 2 rows are the executed commands (-pi shift),
        # and the row before them is still the zero prefill
        hist = np.asarray(c_rh2.controller.joint_command_history)
        np.testing.assert_allclose(hist[:, -2:],
                                   np.asarray(executed) - np.pi, atol=1e-6)
        np.testing.assert_allclose(hist[:, -3], 0.0, atol=1e-6)
        # plant advanced exactly 2 ticks (phase += 0.02 per tick)
        np.testing.assert_allclose(
            np.asarray(c_rh2.plant.phase) - np.asarray(c_rh.plant.phase),
            0.04, atol=1e-6)
        # scan over periods returns (num_chunks, B, replan_every, J)
        carry, chunks = rh.make_rollout_fn(num_chunks=3, jit=False)(
            variables, rh.init(batch_size=3, rng=jax.random.key(6)))
        assert chunks.shape == (3, 3, 2, 8)
        assert np.isfinite(np.asarray(chunks)).all()

    def test_replan_every_validation(self):
        import pytest

        model, _ = make_model()
        sched = make_schedule(100)
        with pytest.raises(ValueError, match="replan_every"):
            RolloutEngine(model, sched, Normalizer.identity(8), replan_every=0)
        with pytest.raises(ValueError, match="replan_every"):
            RolloutEngine(model, sched, Normalizer.identity(8), replan_every=6)

    def test_rollout_batch_members_differ(self):
        # different rng per robot phase => plant IMU differs across batch
        model, variables = make_model()
        engine = RolloutEngine(
            model, make_schedule(100), Normalizer.identity(8), num_inference_steps=2
        )
        carry = engine.init(batch_size=3, rng=jax.random.key(0))
        rollout = engine.make_rollout_fn(num_chunks=1, jit=False)
        carry, chunks = rollout(variables, carry)
        imu = np.asarray(carry.controller.imu_history[:, -1])
        assert not np.allclose(imu[0], imu[1])


class VirtualClock:
    """Deterministic clock: time advances only through sleep()."""

    def __init__(self):
        self.now = 0.0

    def __call__(self) -> float:
        return self.now

    def sleep(self, dt: float) -> None:
        self.now += dt


class TestRealtimeController:
    def test_closed_loop_run(self):
        """Deterministic closed loop on a virtual clock (no wall time)."""
        from soccerdiffusion_tpu.inference.realtime import (
            RealtimeController,
            SimulatedRobotIO,
        )

        model, variables = make_model()
        sampler = make_chunk_sampler(
            model, make_schedule(100), Normalizer.identity(8), num_inference_steps=2
        )
        io = SimulatedRobotIO(num_joints=8)
        clock = VirtualClock()
        ctrl = RealtimeController(
            CFG, sampler, variables, io, control_rate_hz=100,
            clock=clock, sleep_fn=clock.sleep, plan_in_thread=False,
        )
        ctrl.run(duration_s=1.0)
        # 100 ticks of virtual time: ~100 commands, pred_len/rate = 50 ms
        # replan period => ~20 replans — all deterministic.
        assert io.commands_received > 10
        assert len(ctrl.plan_latencies_ms) >= 1
        # untrained model -> arbitrary magnitudes, but the loop must stay finite
        assert np.isfinite(io.positions).all()

    def test_closed_loop_cached_image_tokens(self):
        """Camera config with encode_image_fn: frames are encoded on the
        10 Hz image tick into the token cache, and every replan samples
        against batch['image_tokens'] (no raw frames on the plan path)."""
        from functools import partial

        from soccerdiffusion_tpu.config import ModelConfig
        from soccerdiffusion_tpu.inference.realtime import (
            RealtimeController,
            SimulatedRobotIO,
        )
        from soccerdiffusion_tpu.models import DiffusionPolicy

        cfg = ModelConfig(
            num_joints=8, hidden_dim=32, trajectory_prediction_length=5,
            action_context_length=12, joint_state_context_length=12,
            imu_context_length=12, use_images=True, image_encoder_type="vit",
            image_sequence_encoder_type="none", image_context_length=3,
            image_resolution=32, vit_patch_size=16, vit_width=32, vit_depth=1,
            use_gamestate=False, num_action_history_encoder_layers=1,
            num_imu_encoder_layers=1, joint_state_encoder_layers=1,
            num_decoder_layers=1)
        model = DiffusionPolicy(cfg)
        state = init_controller_state(cfg, batch_size=1)
        batch = make_controller_batch(cfg, state)
        variables = model.init(jax.random.key(0), batch,
                               jnp.zeros((1, 5, 8)), jnp.zeros((1,), jnp.int32))

        base_sampler = make_chunk_sampler(
            model, make_schedule(100), Normalizer.identity(8),
            num_inference_steps=2)
        seen_keys = []

        def sampler(variables, batch, rng):
            seen_keys.append(sorted(batch))
            return base_sampler(variables, batch, rng)

        class CameraIO(SimulatedRobotIO):
            def read_image(self):
                return np.full((32, 32, 3), 0.25, dtype=np.float32)

        clock = VirtualClock()
        ctrl = RealtimeController(
            cfg, sampler, variables, CameraIO(num_joints=8),
            control_rate_hz=100, clock=clock, sleep_fn=clock.sleep,
            plan_in_thread=False,
            encode_image_fn=partial(model.apply,
                                    method=model.encode_image_frames),
        )
        # the cache prefills with the zero-frame encoding, not zeros
        assert ctrl._state.image_tokens is not None
        assert float(np.abs(np.asarray(ctrl._state.image_tokens)).max()) > 0
        ctrl.run(duration_s=0.5)
        assert seen_keys and all("image_tokens" in k and "image_data" not in k
                                 for k in seen_keys)
        assert np.isfinite(ctrl._state.image_tokens).all()

    def test_closed_loop_receding_horizon(self):
        """replan_every_ticks=2 doubles the replan rate (and pushes 2-row
        prefixes into the action history) vs the default pred_len=5."""
        from soccerdiffusion_tpu.inference.realtime import (
            RealtimeController,
            SimulatedRobotIO,
        )

        model, variables = make_model()
        sampler = make_chunk_sampler(
            model, make_schedule(100), Normalizer.identity(8), num_inference_steps=2
        )
        clock = VirtualClock()
        ctrl = RealtimeController(
            CFG, sampler, variables, SimulatedRobotIO(num_joints=8),
            control_rate_hz=100, clock=clock, sleep_fn=clock.sleep,
            plan_in_thread=False, replan_every_ticks=2,
        )
        assert ctrl.replan_period == 0.02  # 2 ticks @ 100 Hz
        ctrl.run(duration_s=1.0)
        # 1 s at a 20 ms replan period => ~50 replans (vs ~20 at pred_len=5)
        assert len(ctrl.plan_latencies_ms) >= 40
        import pytest

        with pytest.raises(ValueError, match="replan_every_ticks"):
            RealtimeController(
                CFG, sampler, variables, SimulatedRobotIO(num_joints=8),
                replan_every_ticks=6,
            )

    def test_closed_loop_threaded_overlap(self):
        """Plan-in-flight overlap: virtual control time, real plan thread."""
        import time

        from soccerdiffusion_tpu.inference.realtime import (
            RealtimeController,
            SimulatedRobotIO,
        )

        model, variables = make_model()
        sampler = make_chunk_sampler(
            model, make_schedule(100), Normalizer.identity(8), num_inference_steps=2
        )
        io = SimulatedRobotIO(num_joints=8)
        clock = VirtualClock()

        def sleep_both(dt):
            clock.now += dt
            time.sleep(0.001)  # give the plan thread real CPU time

        ctrl = RealtimeController(
            CFG, sampler, variables, io, control_rate_hz=100,
            clock=clock, sleep_fn=sleep_both, plan_in_thread=True,
        )
        # Pre-warm the jit so the first in-loop plan isn't a compile.
        state = init_controller_state(CFG, batch_size=1)
        jax.block_until_ready(
            sampler(variables, make_controller_batch(CFG, state), jax.random.key(9))
        )
        ctrl.run(duration_s=1.0)
        # run() joins the in-flight plan thread, so at least one plan landed;
        # the loop itself never blocked on it.
        assert len(ctrl.plan_latencies_ms) >= 1
        assert np.isfinite(io.positions).all()


class TestRolloutSolver:
    def test_dpmpp_solver_runs_and_differs_from_ddim(self):
        model, variables = make_model()
        kw = dict(num_inference_steps=6)
        e_ddim = RolloutEngine(model, make_schedule(100),
                               Normalizer.identity(8), **kw)
        e_dpm = RolloutEngine(model, make_schedule(100),
                              Normalizer.identity(8), solver="dpmpp", **kw)
        # fresh carry per engine: the rollout fn donates its carry buffers
        _, c_ddim = e_ddim.make_rollout_fn(num_chunks=1, jit=True)(
            variables, e_ddim.init(batch_size=2, rng=jax.random.key(3)))
        _, c_dpm = e_dpm.make_rollout_fn(num_chunks=1, jit=True)(
            variables, e_dpm.init(batch_size=2, rng=jax.random.key(3)))
        assert np.isfinite(np.asarray(c_dpm)).all()
        assert np.abs(np.asarray(c_dpm) - np.asarray(c_ddim)).max() > 1e-5

    def test_dpmpp_rejects_unsupported_paths(self):
        import pytest

        model, _ = make_model()
        sched = make_schedule(100)
        with pytest.raises(ValueError, match="DDIM"):
            RolloutEngine(model, sched, Normalizer.identity(8),
                          solver="dpmpp", distilled=True)
        with pytest.raises(ValueError, match="DDIM"):
            RolloutEngine(model, sched, Normalizer.identity(8),
                          solver="dpmpp", fused=True)
        with pytest.raises(ValueError, match="solver"):
            RolloutEngine(model, sched, Normalizer.identity(8), solver="heun")


class TestShardedRollout:
    def test_rollout_on_data_mesh(self):
        """Rollout engine with robots sharded over the 8-device data axis."""
        from soccerdiffusion_tpu.parallel import make_mesh, shard_batch

        mesh = make_mesh({"data": 8})
        model, variables = make_model()
        engine = RolloutEngine(
            model, make_schedule(100), Normalizer.identity(8), num_inference_steps=2
        )
        carry = engine.init(batch_size=16, rng=jax.random.key(0))
        with mesh:
            # shard every controller/plant buffer over the robot axis
            sharded_controller = shard_batch(
                mesh,
                {
                    "joint_command_history": carry.controller.joint_command_history,
                    "joint_state_history": carry.controller.joint_state_history,
                    "imu_history": carry.controller.imu_history,
                },
            )
            carry = carry.replace(
                controller=carry.controller.replace(**sharded_controller)
            )
            rollout = engine.make_rollout_fn(num_chunks=2, jit=True)
            carry, chunks = rollout(variables, carry)
        assert chunks.shape == (2, 16, 5, 8)
        assert np.isfinite(np.asarray(chunks)).all()


class TestFusedRollout:
    def test_fused_rollout_matches_xla_rollout(self):
        """Fused-kernel rollout (interpret mode) vs the XLA rollout path."""
        model, variables = make_model()
        import soccerdiffusion_tpu.ops.fused_denoise as fd

        engine_x = RolloutEngine(model, make_schedule(100), Normalizer.identity(8),
                                 num_inference_steps=4)
        engine_f = RolloutEngine(model, make_schedule(100), Normalizer.identity(8),
                                 num_inference_steps=4, fused=True, fused_block_robots=2)
        # force interpret mode for the CPU test
        orig_init = fd.FusedDenoiser.__init__

        def patched(self, m, p, interpret=False, block_robots=32):
            orig_init(self, m, p, interpret=True, block_robots=block_robots)

        fd.FusedDenoiser.__init__ = patched
        try:
            cx = engine_x.init(batch_size=4, rng=jax.random.key(0))
            cf = engine_f.init(batch_size=4, rng=jax.random.key(0))
            _, chunks_x = engine_x.make_rollout_fn(1, jit=False)(variables, cx)
            _, chunks_f = engine_f.make_rollout_fn(1, jit=False)(variables, cf)
        finally:
            fd.FusedDenoiser.__init__ = orig_init
        np.testing.assert_allclose(np.asarray(chunks_f), np.asarray(chunks_x),
                                   rtol=5e-2, atol=5e-2)

    def test_fused_distilled_rollout_runs(self):
        model, variables = make_model()
        import soccerdiffusion_tpu.ops.fused_denoise as fd

        orig_init = fd.FusedDenoiser.__init__

        def patched(self, m, p, interpret=False, block_robots=32):
            orig_init(self, m, p, interpret=True, block_robots=block_robots)

        fd.FusedDenoiser.__init__ = patched
        try:
            engine = RolloutEngine(model, make_schedule(100), Normalizer.identity(8),
                                   distilled=True, fused=True, fused_block_robots=2)
            carry = engine.init(batch_size=4, rng=jax.random.key(0))
            _, chunks = engine.make_rollout_fn(1, jit=False)(variables, carry)
        finally:
            fd.FusedDenoiser.__init__ = orig_init
        assert chunks.shape == (1, 4, 5, 8)
        assert np.isfinite(np.asarray(chunks)).all()

    def test_chunk_fused_rollout_matches_xla_rollout(self):
        """Whole-chunk fused rollout (interpret mode) vs the XLA path."""
        import soccerdiffusion_tpu.ops.fused_chunk as fc

        model, variables = make_model()
        engine_x = RolloutEngine(model, make_schedule(100), Normalizer.identity(8),
                                 num_inference_steps=4)
        engine_f = RolloutEngine(model, make_schedule(100), Normalizer.identity(8),
                                 num_inference_steps=4, fused="chunk",
                                 fused_block_robots=2)
        orig_init = fc.FusedChunkSampler.__init__

        def patched(self, m, p, interpret=False, block_robots=8, **kw):
            orig_init(self, m, p, interpret=True, block_robots=block_robots, **kw)

        fc.FusedChunkSampler.__init__ = patched
        try:
            cx = engine_x.init(batch_size=4, rng=jax.random.key(0))
            cf = engine_f.init(batch_size=4, rng=jax.random.key(0))
            _, chunks_x = engine_x.make_rollout_fn(1, jit=False)(variables, cx)
            _, chunks_f = engine_f.make_rollout_fn(1, jit=False)(variables, cf)
        finally:
            fc.FusedChunkSampler.__init__ = orig_init
        np.testing.assert_allclose(np.asarray(chunks_f), np.asarray(chunks_x),
                                   rtol=5e-2, atol=5e-2)


class TestMultimodalRollout:
    def test_rollout_with_images_updates_buffers(self):
        """Closed-loop rollout for an image config: the stub camera pushes
        2 frames per period into the controller's image window and the
        chunk conditions on them (VERDICT round-1 weak #4)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from soccerdiffusion_tpu.config import ModelConfig
        from soccerdiffusion_tpu.data.normalizer import Normalizer
        from soccerdiffusion_tpu.diffusion import make_schedule
        from soccerdiffusion_tpu.inference import RolloutEngine
        from soccerdiffusion_tpu.inference.controller import make_controller_batch
        from soccerdiffusion_tpu.models import DiffusionPolicy

        cfg = ModelConfig(
            num_joints=8, hidden_dim=32, trajectory_prediction_length=10,
            action_context_length=12, joint_state_context_length=12,
            imu_context_length=12, use_images=True, image_encoder_type="vit",
            image_sequence_encoder_type="none", image_context_length=4,
            image_resolution=32, vit_patch_size=16, vit_width=32, vit_depth=1,
            use_gamestate=False, num_action_history_encoder_layers=1,
            num_imu_encoder_layers=1, joint_state_encoder_layers=1,
            num_decoder_layers=1)
        model = DiffusionPolicy(cfg)
        # cache_image_tokens=False: the raw-frame path (reference buffer
        # semantics, ros.py:205-257); the cached default is covered below
        engine = RolloutEngine(model, make_schedule(50), Normalizer.identity(8),
                               num_inference_steps=2,
                               cache_image_tokens=False)
        carry = engine.init(3, jax.random.key(0))
        batch = make_controller_batch(cfg, carry.controller)
        variables = model.init(jax.random.key(1), batch,
                               jnp.zeros((3, 10, 8)), jnp.zeros((3,), jnp.int32))
        carry2, chunks = engine.make_rollout_fn(2, jit=False)(variables, carry)
        assert chunks.shape == (2, 3, 10, 8)
        assert np.all(np.isfinite(np.asarray(chunks)))
        imgs = np.asarray(carry2.controller.images)
        # 2 periods x 2 frames = newest 4 slots filled, non-zero
        assert imgs.shape == (3, 4, 32, 32, 3)
        assert np.abs(imgs[:, -1]).max() > 0

    def test_cached_token_rollout_matches_raw_frames(self):
        """Image-token caching (the default for image configs): per-frame
        encodings computed on frame arrival + sequence-encoder-only replans
        produce the SAME rollout as re-encoding the raw frame stack every
        replan — while carrying a (B, F, hidden) buffer instead of
        (B, F, H, W, 3)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from soccerdiffusion_tpu.config import ModelConfig
        from soccerdiffusion_tpu.data.normalizer import Normalizer
        from soccerdiffusion_tpu.diffusion import make_schedule
        from soccerdiffusion_tpu.inference import RolloutEngine
        from soccerdiffusion_tpu.inference.controller import make_controller_batch
        from soccerdiffusion_tpu.models import DiffusionPolicy

        cfg = ModelConfig(
            num_joints=8, hidden_dim=32, trajectory_prediction_length=10,
            action_context_length=12, joint_state_context_length=12,
            imu_context_length=12, use_images=True, image_encoder_type="vit",
            image_sequence_encoder_type="transformer",
            num_image_sequence_encoder_layers=1, image_context_length=4,
            image_resolution=32, vit_patch_size=16, vit_width=32, vit_depth=1,
            use_gamestate=False, num_action_history_encoder_layers=1,
            num_imu_encoder_layers=1, joint_state_encoder_layers=1,
            num_decoder_layers=1, compute_dtype="float32")
        model = DiffusionPolicy(cfg)
        sched = make_schedule(50)
        norm = Normalizer.identity(8)
        raw = RolloutEngine(model, sched, norm, num_inference_steps=2,
                            cache_image_tokens=False)
        cached = RolloutEngine(model, sched, norm, num_inference_steps=2)
        assert cached.cache_image_tokens  # default ON for image configs
        c0 = raw.init(2, jax.random.key(0))
        batch = make_controller_batch(cfg, c0.controller)
        variables = model.init(jax.random.key(1), batch,
                               jnp.zeros((2, 10, 8)), jnp.zeros((2,), jnp.int32))
        # variables prefill the token cache with the zero-frame encoding ->
        # exact parity from the very first replan
        c1 = cached.init(2, jax.random.key(0), variables=variables)
        assert c1.controller.images is None
        assert c1.controller.image_tokens.shape == (2, 4, 32)
        _, chunks_raw = raw.make_rollout_fn(3, jit=False)(variables, c0)
        _, chunks_tok = cached.make_rollout_fn(3, jit=False)(variables, c1)
        np.testing.assert_allclose(np.asarray(chunks_tok),
                                   np.asarray(chunks_raw), atol=1e-5)

    def test_fused_encoder_rejected_for_image_configs(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        import pytest

        from soccerdiffusion_tpu.config import ModelConfig
        from soccerdiffusion_tpu.data.normalizer import Normalizer
        from soccerdiffusion_tpu.diffusion import make_schedule
        from soccerdiffusion_tpu.inference import RolloutEngine

        from soccerdiffusion_tpu.models import DiffusionPolicy
        cfg = ModelConfig(
            num_joints=8, hidden_dim=32, trajectory_prediction_length=10,
            action_context_length=12, joint_state_context_length=12,
            imu_context_length=12, use_images=True, image_encoder_type="vit",
            image_sequence_encoder_type="none", image_context_length=2,
            image_resolution=32, vit_patch_size=16, vit_width=32, vit_depth=1,
            use_gamestate=False, num_action_history_encoder_layers=1,
            num_imu_encoder_layers=1, joint_state_encoder_layers=1,
            num_decoder_layers=1)
        model = DiffusionPolicy(cfg)
        engine = RolloutEngine(model, make_schedule(50), Normalizer.identity(8),
                               num_inference_steps=2, fused_encoder=True)
        carry = engine.init(2, jax.random.key(0))
        with pytest.raises(ValueError, match="proprioceptive"):
            engine.make_rollout_fn(1, jit=False)(None, carry)


class TestShardedFusedServing:
    def test_fused_chunk_rollout_under_shard_map(self):
        """Multi-chip serving of the fused chunk sampler: shard_map over the
        8-device data axis, per-shard output bit-matches an unsharded
        rollout over that shard's robots with the shard's folded key."""
        from soccerdiffusion_tpu.inference.rollout import RolloutCarry
        from soccerdiffusion_tpu.parallel import make_mesh

        mesh = make_mesh({"data": 8})
        model, variables = make_model()
        engine = RolloutEngine(
            model, make_schedule(60), Normalizer.identity(8),
            num_inference_steps=2, fused="chunk", fused_interpret=True,
            fused_block_robots=2,
        )
        B, n_dev = 16, 8
        key = jax.random.key(11)
        carry = engine.init(batch_size=B, rng=key)
        rollout = engine.make_sharded_rollout_fn(num_chunks=2, mesh=mesh)
        out_carry, chunks = rollout(variables, carry)
        chunks = np.asarray(chunks)
        assert chunks.shape == (2, B, 5, 8)
        assert np.isfinite(chunks).all()

        # per-shard reference: unsharded rollout over the shard's robots
        # (fresh key object — the sharded call donated the original carry)
        key2 = jax.random.key(11)
        local = B // n_dev
        base = engine.make_rollout_fn(num_chunks=2, jit=False)
        for i in (0, 3, 7):
            ref_carry = engine.init(batch_size=B, rng=key2)
            sl = slice(i * local, (i + 1) * local)
            ref_carry = RolloutCarry(
                controller=jax.tree.map(lambda x: x[sl], ref_carry.controller),
                plant=jax.tree.map(lambda x: x[sl], ref_carry.plant),
                rng=jax.random.fold_in(key2, i),
            )
            _, ref_chunks = base(variables, ref_carry)
            # jitted shard_map vs eager reference: identical math up to
            # float reassociation
            np.testing.assert_allclose(chunks[:, sl], np.asarray(ref_chunks),
                                       rtol=1e-5, atol=1e-5)

    def test_sharded_rollout_carry_chains(self):
        """Repeated sharded calls keep a replicated RNG and draw fresh noise."""
        from soccerdiffusion_tpu.parallel import make_mesh

        mesh = make_mesh({"data": 8})
        model, variables = make_model()
        engine = RolloutEngine(
            model, make_schedule(60), Normalizer.identity(8),
            num_inference_steps=2,
        )
        rollout = engine.make_sharded_rollout_fn(num_chunks=1, mesh=mesh)
        carry = engine.init(batch_size=8, rng=jax.random.key(0))
        carry, c1 = rollout(variables, carry)
        carry, c2 = rollout(variables, carry)
        assert np.abs(np.asarray(c1) - np.asarray(c2)).max() > 1e-6


class TestServeCli:
    def test_serve_simulated_from_checkpoint(self, tmp_path):
        """cli serve: load a checkpoint, drive the simulated plant for a
        fraction of a second of wall clock, finite commands delivered."""
        from soccerdiffusion_tpu.cli import main as cli_main
        from soccerdiffusion_tpu.training import create_train_state, make_optimizer
        from soccerdiffusion_tpu.training.checkpoint import save_checkpoint

        model, variables = make_model()
        state = init_controller_state(CFG, batch_size=2)
        batch = make_controller_batch(CFG, state)
        opt = make_optimizer(1e-3, total_steps=10, use_onecycle=False)
        tstate = create_train_state(model, {**batch}, opt, jax.random.key(0),
                                    5, 8)
        params = {
            "num_joints": 8, "hidden_dim": 32,
            "trajectory_prediction_length": 5,
            "action_context_length": 20, "joint_state_context_length": 20,
            "imu_context_length": 20, "use_images": False,
            "use_gamestate": True,
            "num_action_history_encoder_layers": 1,
            "num_imu_encoder_layers": 1, "joint_state_encoder_layers": 1,
            "num_decoder_layers": 1, "train_denoising_timesteps": 50,
        }
        ckpt = tmp_path / "policy.ckpt"
        save_checkpoint(str(ckpt), tstate, Normalizer.identity(8), params, 0)
        rc = cli_main(["serve", str(ckpt), "--duration", "0.3",
                       "--steps", "2"])
        assert rc == 0
        rc = cli_main(["serve", str(ckpt), "--duration", "0.2",
                       "--steps", "4", "--solver", "dpmpp@lambda"])
        assert rc == 0
