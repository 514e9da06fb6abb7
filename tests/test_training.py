"""Training engine tests: loss decreases on dummy data, checkpoint round
trip, resume determinism, and data-parallel sharding over the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soccerdiffusion_tpu.config import Config, ModelConfig, TrainConfig
from soccerdiffusion_tpu.data import Normalizer, WindowedDataset, generate_dummy_arrays
from soccerdiffusion_tpu.data.pipeline import prefetch_to_device
from soccerdiffusion_tpu.diffusion import make_schedule
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.parallel import MeshRules, make_mesh, param_shardings, shard_batch
from soccerdiffusion_tpu.training import (
    create_train_state,
    load_checkpoint,
    make_optimizer,
    make_train_step,
    save_checkpoint,
)

TINY = ModelConfig(
    num_joints=8, hidden_dim=32, trajectory_prediction_length=10,
    action_context_length=40, joint_state_context_length=40, imu_context_length=40,
    use_images=False, use_gamestate=True,
    num_action_history_encoder_layers=1, num_imu_encoder_layers=1,
    joint_state_encoder_layers=1, num_decoder_layers=2,
)


def make_env(batch_size=16, steps=None, cfg=TINY):
    dummy = generate_dummy_arrays(1, 400, num_joints=cfg.num_joints, with_images=False)
    ds = WindowedDataset.from_dummy(dummy, cfg)
    norm = Normalizer.fit(ds.sample_targets(200))
    model = DiffusionPolicy(cfg)
    sched = make_schedule(100)
    opt = make_optimizer(1e-3, total_steps=steps or 100)
    batch = next(ds.batches(batch_size, shuffle=False))
    state = create_train_state(
        model, jax.device_put(batch), opt, jax.random.key(0),
        cfg.trajectory_prediction_length, cfg.num_joints,
    )
    return ds, norm, model, sched, opt, state


class TestTrainStep:
    def test_loss_decreases(self):
        ds, norm, model, sched, opt, state = make_env()
        step = make_train_step(model, sched, opt, norm, donate=False)
        losses = []
        for epoch in range(3):
            for batch in ds.batches(16, shuffle=True, seed=epoch):
                state, metrics = step(state, jax.device_put(batch), 0)
                losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        # epsilon-MSE starts near 1.0 (unit gaussian target); it must drop.
        assert np.mean(losses[-10:]) < 0.75 * np.mean(losses[:5])

    def test_step_deterministic_given_seed(self):
        ds, norm, model, sched, opt, state = make_env()
        step = make_train_step(model, sched, opt, norm, donate=False)
        batch = jax.device_put(next(ds.batches(16, shuffle=False)))
        s1, m1 = step(state, batch, 7)
        s2, m2 = step(state, batch, 7)
        assert float(m1["loss"]) == float(m2["loss"])

    def test_module_lr_mult_scales_updates(self):
        """make_optimizer(module_lr_mults=...): the named subtree's
        post-AdamW update is scaled exactly, every other subtree is
        bit-identical (the image_encoder_lr_mult camera lever)."""
        import jax.numpy as jnp

        from soccerdiffusion_tpu.training import make_optimizer

        params = {"image_sequence_encoder": {"w": jnp.ones((3,))},
                  "decoder": {"w": jnp.ones((3,))}}
        grads = jax.tree.map(lambda p: jnp.full_like(p, 0.1), params)
        base = make_optimizer(1e-3, 100, use_onecycle=False)
        mult = make_optimizer(1e-3, 100, use_onecycle=False,
                              module_lr_mults={"image_sequence_encoder": 2.0})
        u0, _ = base.update(grads, base.init(params), params)
        u1, _ = mult.update(grads, mult.init(params), params)
        np.testing.assert_array_equal(np.asarray(u1["decoder"]["w"]),
                                      np.asarray(u0["decoder"]["w"]))
        np.testing.assert_allclose(
            np.asarray(u1["image_sequence_encoder"]["w"]),
            2.0 * np.asarray(u0["image_sequence_encoder"]["w"]), rtol=1e-6)

    def test_grad_clip_norm_caps_large_grads_only(self):
        """make_optimizer(grad_clip_norm=c): grads with global norm <= c
        update bit-identically to the unclipped optimizer; grads above c
        are rescaled to norm c before AdamW (TrainConfig.grad_clip_norm)."""
        import jax.numpy as jnp

        from soccerdiffusion_tpu.training import make_optimizer

        params = {"decoder": {"w": jnp.ones((4,))}}
        small = {"decoder": {"w": jnp.full((4,), 0.1)}}   # norm 0.2
        big = {"decoder": {"w": jnp.full((4,), 100.0)}}   # norm 200
        base = make_optimizer(1e-3, 100, use_onecycle=False)
        clip = make_optimizer(1e-3, 100, use_onecycle=False, grad_clip_norm=1.0)
        u0, _ = base.update(small, base.init(params), params)
        u1, _ = clip.update(small, clip.init(params), params)
        np.testing.assert_array_equal(np.asarray(u1["decoder"]["w"]),
                                      np.asarray(u0["decoder"]["w"]))
        # clipped big grad == unclipped grad rescaled to global norm 1.0
        scaled = jax.tree.map(lambda g: g / 200.0, big)
        u2, _ = base.update(scaled, base.init(params), params)
        u3, _ = clip.update(big, clip.init(params), params)
        np.testing.assert_allclose(np.asarray(u3["decoder"]["w"]),
                                   np.asarray(u2["decoder"]["w"]), rtol=1e-6)

    def test_decoder_pretraining_mode(self):
        ds, norm, model, sched, opt, state = make_env()
        step = make_train_step(model, sched, opt, norm, decoder_pretraining=True, donate=False)
        batch = jax.device_put(next(ds.batches(16, shuffle=False)))
        state, metrics = step(state, batch, 0)
        assert np.isfinite(float(metrics["loss"]))


class TestModalityDropout:
    """CFG-style conditioning dropout (data/pipeline.py dropout_modalities)."""

    def _batch(self, bsz=16):
        ds, norm, model, sched, opt, state = make_env(batch_size=bsz)
        return jax.device_put(next(ds.batches(bsz, shuffle=False)))

    def test_dropped_images_invalidate_vision_u(self):
        """When the camera modality is dropped for a sample, its aux-cue
        label must be masked out (vision_u_valid -> 0) so aux_cue_weight
        can ride alongside modality_dropout (CFG-trainable cue runs)."""
        import jax.numpy as jnp

        from soccerdiffusion_tpu.data.pipeline import dropout_modalities

        batch = self._batch()
        bsz = batch["joint_command"].shape[0]
        batch = dict(batch)
        batch["image_data"] = jnp.ones((bsz, 2, 8, 8, 3), jnp.float32)
        batch["vision_u"] = jnp.full((bsz, 1), 0.3, jnp.float32)
        out = dropout_modalities(batch, jax.random.key(5), p=0.5)
        dropped = ~np.asarray(out["image_data"]).any(axis=(1, 2, 3, 4))
        valid = np.asarray(out["vision_u_valid"])[:, 0]
        assert dropped.any() and (~dropped).any()  # p=0.5 split both ways
        np.testing.assert_array_equal(valid, (~dropped).astype(np.float32))
        # the label itself is untouched — only the mask flips
        np.testing.assert_array_equal(np.asarray(out["vision_u"]),
                                      np.asarray(batch["vision_u"]))

    def test_aux_cue_with_dropout_config_allowed(self):
        from soccerdiffusion_tpu.config import TrainConfig

        cfg = TrainConfig(aux_cue_weight=1.0, modality_dropout=0.2)
        assert cfg.aux_cue_weight == 1.0

    def test_p1_replaces_every_modality_with_its_padding_value(self):
        from soccerdiffusion_tpu.data.pipeline import dropout_modalities
        from soccerdiffusion_tpu.data.schema import RobotState

        batch = self._batch()
        out = dropout_modalities(dict(batch), jax.random.key(0), p=1.0 - 1e-9)
        assert not np.asarray(out["joint_command_history"]).any()
        assert not np.asarray(out["joint_state"]).any()
        rot = np.asarray(out["rotation"])
        np.testing.assert_array_equal(
            rot, np.broadcast_to(np.array([0, 0, 0, 1], np.float32), rot.shape))
        assert (np.asarray(out["game_state"]) == int(RobotState.UNKNOWN)).all()
        # the target is never touched
        np.testing.assert_array_equal(
            np.asarray(out["joint_command"]), np.asarray(batch["joint_command"]))

    def test_five_dim_rotation_identity(self):
        from soccerdiffusion_tpu.data.pipeline import dropout_modalities

        batch = {
            "joint_command": jnp.zeros((4, 10, 8)),
            "rotation": jnp.ones((4, 40, 5)),
        }
        out = dropout_modalities(batch, jax.random.key(0), p=1.0 - 1e-9)
        rot = np.asarray(out["rotation"])
        np.testing.assert_array_equal(
            rot, np.broadcast_to(np.array([1, 0, 0, 0, 1], np.float32), rot.shape))

    def test_image_paths_float_and_u8(self):
        from soccerdiffusion_tpu.data.pipeline import dropout_modalities

        base = {"joint_command": jnp.zeros((4, 10, 8))}
        f = dropout_modalities(
            dict(base, image_data=jnp.ones((4, 3, 8, 8, 3))),
            jax.random.key(0), p=1.0 - 1e-9)
        assert not np.asarray(f["image_data"]).any()
        u = dropout_modalities(
            dict(base, image_u8=jnp.full((4, 3, 8, 8, 3), 255, jnp.uint8),
                 image_valid=jnp.ones((4, 3))),
            jax.random.key(0), p=1.0 - 1e-9)
        assert not np.asarray(u["image_u8"]).any()
        assert not np.asarray(u["image_valid"]).any()
        assert u["image_u8"].dtype == jnp.uint8

    def test_p0_is_identity_and_masks_are_per_sample(self):
        from soccerdiffusion_tpu.data.pipeline import dropout_modalities

        batch = self._batch(bsz=64)
        same = dropout_modalities(dict(batch), jax.random.key(0), p=0.0)
        np.testing.assert_array_equal(
            np.asarray(same["joint_state"]), np.asarray(batch["joint_state"]))
        out = dropout_modalities(dict(batch), jax.random.key(1), p=0.5)
        dropped = ~np.asarray(out["joint_state"]).any(axis=(1, 2))
        assert dropped.any() and not dropped.all()
        # modalities draw independent masks: game-state drops differ from
        # joint-state drops somewhere at bsz=64 w.h.p.
        gs_dropped = np.asarray(out["game_state"]) != np.asarray(batch["game_state"])
        js_rows = np.asarray(batch["joint_state"]).any(axis=(1, 2))
        assert (dropped[js_rows] != gs_dropped[js_rows]).any()

    def test_null_modalities_matches_dropout_at_p1(self):
        """null_modalities (the deterministic CFG unconditional branch)
        produces exactly the null values dropout_modalities trains on."""
        from soccerdiffusion_tpu.data.pipeline import (
            dropout_modalities,
            null_modalities,
        )

        batch = self._batch()
        batch = dict(batch, image_u8=jnp.full((16, 3, 8, 8, 3), 7, jnp.uint8),
                     image_valid=jnp.ones((16, 3)))
        via_dropout = dropout_modalities(dict(batch), jax.random.key(0),
                                         p=1.0 - 1e-9)
        via_null = null_modalities(batch, "all")
        for k in batch:
            np.testing.assert_array_equal(
                np.asarray(via_dropout[k]), np.asarray(via_null[k]), err_msg=k)

    def test_null_modalities_selective_and_validating(self):
        import pytest

        from soccerdiffusion_tpu.data.pipeline import null_modalities

        batch = self._batch()
        out = null_modalities(batch, ("joint_states",))
        assert not np.asarray(out["joint_state"]).any()
        np.testing.assert_array_equal(  # other modalities untouched
            np.asarray(out["joint_command_history"]),
            np.asarray(batch["joint_command_history"]))
        with pytest.raises(ValueError, match="unknown modality"):
            null_modalities(batch, ("camera",))
        # absent modalities are a safe no-op
        same = null_modalities(batch, ("image",))
        np.testing.assert_array_equal(
            np.asarray(same["joint_state"]), np.asarray(batch["joint_state"]))

    def test_train_step_with_dropout(self):
        ds, norm, model, sched, opt, state = make_env()
        batch = jax.device_put(next(ds.batches(16, shuffle=False)))
        step_off = make_train_step(model, sched, opt, norm, donate=False)
        step_on = make_train_step(model, sched, opt, norm, donate=False,
                                  modality_dropout=0.5)
        _, m_off = step_off(state, batch, 3)
        _, m_on = step_on(state, batch, 3)
        assert np.isfinite(float(m_on["loss"]))
        # dropout changes the conditioning, hence the loss; the p=0 path is
        # bit-identical to the no-arg step (same rng derivation)
        assert float(m_on["loss"]) != float(m_off["loss"])
        step_p0 = make_train_step(model, sched, opt, norm, donate=False,
                                  modality_dropout=0.0)
        _, m_p0 = step_p0(state, batch, 3)
        assert float(m_p0["loss"]) == float(m_off["loss"])


class TestEMA:
    def test_ema_update_math_and_disabled_path(self):
        ds, norm, model, sched, opt, state0 = make_env()
        state0 = state0.replace(ema_params=state0.params)  # seeded
        decay = 0.5
        step = make_train_step(model, sched, opt, norm, donate=False,
                               ema_decay=decay)
        batch = jax.device_put(next(ds.batches(16, shuffle=False)))
        state1, _ = step(state0, batch, 0)
        # warmup: effective decay at step 1 is min(0.5, 2/11)
        d = min(decay, (1.0 + 1.0) / (10.0 + 1.0))
        expect = jax.tree.map(lambda e, p: e * d + p * (1 - d),
                              state0.params, state1.params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
            state1.ema_params, expect)
        # ema lags params (params moved, average moved less)
        p_delta = jax.tree_util.tree_leaves(jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            state1.params, state0.params))
        e_delta = jax.tree_util.tree_leaves(jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            state1.ema_params, state0.params))
        assert max(e_delta) < max(p_delta)
        # disabled path: ema stays the (empty) sentinel
        step_off = make_train_step(model, sched, opt, norm, donate=False)
        ds2, norm2, model2, sched2, opt2, s = make_env()
        s1, _ = step_off(s, batch, 0)
        assert not s1.ema_params

    def test_ema_with_donated_state(self):
        """create_train_state(ema=True) must hand the donated step DISTINCT
        param/ema buffers (aliased trees fail Execute() with 'donate the
        same buffer twice')."""
        from soccerdiffusion_tpu.training import create_train_state

        cfg = TINY
        dummy = generate_dummy_arrays(1, 400, num_joints=cfg.num_joints,
                                      with_images=False)
        ds = WindowedDataset.from_dummy(dummy, cfg)
        norm = Normalizer.fit(ds.sample_targets(200))
        model = DiffusionPolicy(cfg)
        sched = make_schedule(100)
        opt = make_optimizer(1e-3, total_steps=100)
        batch = jax.device_put(next(ds.batches(8, shuffle=False)))
        state = create_train_state(
            model, batch, opt, jax.random.key(0),
            cfg.trajectory_prediction_length, cfg.num_joints, ema=True)
        step = make_train_step(model, sched, opt, norm, donate=True,
                               ema_decay=0.999)
        state, metrics = step(state, batch, 0)
        state, metrics = step(state, batch, 0)
        assert np.isfinite(float(metrics["loss"]))
        assert jax.tree_util.tree_leaves(state.ema_params)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        ds, norm, model, sched, opt, state = make_env()
        hp = {"hidden_dim": 32, "num_joints": 8}
        save_checkpoint(tmp_path / "ckpt", state, norm, hp, epoch=3)
        restored = load_checkpoint(tmp_path / "ckpt")
        assert restored["hyperparams"] == hp
        assert restored["current_epoch"] == 3
        np.testing.assert_allclose(np.asarray(restored["norm"].mean), np.asarray(norm.mean))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            restored["state"]["params"], jax.device_get(state.params),
        )

    def test_atomic_overwrite(self, tmp_path):
        ds, norm, model, sched, opt, state = make_env()
        save_checkpoint(tmp_path / "ckpt", state, norm, {"a": 1}, epoch=0)
        save_checkpoint(tmp_path / "ckpt", state, norm, {"a": 2}, epoch=1)
        restored = load_checkpoint(tmp_path / "ckpt")
        assert restored["hyperparams"] == {"a": 2}
        assert restored["current_epoch"] == 1

    def test_ema_checkpoint_roundtrip_and_serving(self, tmp_path):
        """EMA rides in the checkpoint when enabled; inference serves the
        EMA weights (the reference's embed_parameters policy); non-EMA
        checkpoints resumed into an EMA template seed from the restored
        params."""
        from soccerdiffusion_tpu.training.checkpoint import (
            load_policy_checkpoint,
        )

        ds, norm, model, sched, opt, state = make_env()
        ema_state = state.replace(
            ema_params=jax.tree.map(jnp.zeros_like, state.params))
        save_checkpoint(tmp_path / "ema", ema_state, norm, {"a": 1}, epoch=0)
        # template-free load: raw dict carries the tree
        raw = load_checkpoint(tmp_path / "ema")["state"]
        assert raw.get("ema_params")
        # serving decodes to the EMA weights
        _, variables, *_ = load_policy_checkpoint(tmp_path / "ema")
        for leaf in jax.tree_util.tree_leaves(variables["params"]):
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
        # template restore round-trips the tree
        restored = load_checkpoint(tmp_path / "ema",
                                   state_template=ema_state)["state"]
        for leaf in jax.tree_util.tree_leaves(restored.ema_params):
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
        # non-EMA checkpoint into an EMA template: ema seeds from params
        save_checkpoint(tmp_path / "plain", state, norm, {"a": 1}, epoch=0)
        resumed = load_checkpoint(tmp_path / "plain",
                                  state_template=ema_state)["state"]
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            resumed.ema_params, resumed.params)
        # and a non-EMA checkpoint stays format-identical (no ema key)
        assert not load_checkpoint(tmp_path / "plain")["state"].get(
            "ema_params")

    def test_load_policy_checkpoint_step_decoding(self, tmp_path):
        """The shared inference-side decoder (used by both `cli serve` and
        evaluation/report.py) must map checkpoint hyperparams to the same
        sampler operating point everywhere."""
        from soccerdiffusion_tpu.training.checkpoint import (
            load_policy_checkpoint,
        )

        ds, norm, model, sched, opt, state = make_env()
        cases = [
            # (extra hyperparams, expected steps, expected distilled)
            ({}, 30, False),                                   # plain teacher
            ({"distill_teacher_inference_steps": 4}, 4, False),  # few-step teacher
            ({"distilled_decoder": True}, 1, True),            # 1-step student
            ({"distilled_decoder": True, "distilled_num_steps": 4}, 4, True),
        ]
        for i, (extra, want_steps, want_distilled) in enumerate(cases):
            hp = {"hidden_dim": 32, **extra}
            save_checkpoint(tmp_path / f"c{i}", state, norm, hp, epoch=0)
            params, variables, n, steps, distilled = load_policy_checkpoint(
                tmp_path / f"c{i}")
            assert (steps, distilled) == (want_steps, want_distilled), extra
            assert params == hp
            assert "params" in variables
            np.testing.assert_allclose(np.asarray(n.mean),
                                       np.asarray(norm.mean))


class TestSharding:
    def test_train_step_on_8_device_mesh(self):
        assert len(jax.devices()) == 8
        mesh = make_mesh({"data": 8})
        ds, norm, model, sched, opt, state = make_env(batch_size=16)
        step = make_train_step(model, sched, opt, norm, donate=False)
        with mesh:
            batch = shard_batch(mesh, next(ds.batches(16, shuffle=False)))
            state, metrics = step(state, batch, 0)
        assert np.isfinite(float(metrics["loss"]))

    def test_sharded_equals_single_device(self):
        mesh = make_mesh({"data": 8})
        ds, norm, model, sched, opt, state = make_env(batch_size=16)
        step = make_train_step(model, sched, opt, norm, donate=False)
        host_batch = next(ds.batches(16, shuffle=False))
        _, m_single = step(state, jax.device_put(host_batch), 0)
        with mesh:
            _, m_sharded = step(state, shard_batch(mesh, host_batch), 0)
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-5
        )

    def test_tensor_parallel_param_shardings(self):
        mesh = make_mesh({"data": 4, "model": 2})
        ds, norm, model, sched, opt, state = make_env()
        rules = MeshRules(model_axis="model")
        shardings = param_shardings(mesh, state.params, rules)
        # q_proj kernels column-sharded over "model"
        qspec = jax.tree_util.tree_leaves_with_path(shardings)
        found_col = any(
            "q_proj" in jax.tree_util.keystr(path) and "kernel" in jax.tree_util.keystr(path)
            and s.spec == jax.sharding.PartitionSpec(None, "model")
            for path, s in qspec
        )
        found_row = any(
            "out_proj" in jax.tree_util.keystr(path) and "kernel" in jax.tree_util.keystr(path)
            and s.spec == jax.sharding.PartitionSpec("model", None)
            for path, s in qspec
        )
        assert found_col and found_row

    def test_tp_train_step_runs_and_matches(self):
        mesh = make_mesh({"data": 4, "model": 2})
        ds, norm, model, sched, opt, state = make_env(batch_size=16)
        step = make_train_step(model, sched, opt, norm, donate=False)
        host_batch = next(ds.batches(16, shuffle=False))
        _, m_single = step(state, jax.device_put(host_batch), 0)

        rules = MeshRules(data_axis="data", model_axis="model")
        p_shard = param_shardings(mesh, state.params, rules)
        with mesh:
            sharded_params = jax.device_put(state.params, p_shard)
            tp_state = state.replace(params=sharded_params)
            batch = shard_batch(mesh, host_batch, rules)
            _, m_tp = step(tp_state, batch, 0)
        np.testing.assert_allclose(float(m_single["loss"]), float(m_tp["loss"]), rtol=1e-4)


class TestPipeline:
    def test_prefetch_yields_all_batches(self):
        ds, *_ = make_env()
        batches = list(ds.batches(16, shuffle=False))
        fetched = list(prefetch_to_device(iter(batches)))
        assert len(fetched) == len(batches)
        np.testing.assert_allclose(
            np.asarray(fetched[0]["joint_command"]), batches[0]["joint_command"]
        )

    def test_device_resident_batches_match_host_batches(self):
        """DeviceResidentData must reproduce WindowedDataset.batches
        exactly (same rng stream, same order, same values) while gathering
        on-device — the tunnel-leak workaround must not change training."""
        from soccerdiffusion_tpu.data.pipeline import DeviceResidentData

        ds, *_ = make_env()
        dev = DeviceResidentData(ds, device=jax.devices()[0])
        assert len(dev) == len(ds)
        for host_b, dev_b in zip(ds.batches(16, shuffle=True, seed=7),
                                 dev.batches(16, shuffle=True, seed=7)):
            assert set(host_b) == set(dev_b)
            for k in host_b:
                np.testing.assert_array_equal(host_b[k], np.asarray(dev_b[k]))

    def test_device_resident_requires_single_device(self):
        from soccerdiffusion_tpu.data.pipeline import DeviceResidentData

        ds, *_ = make_env()
        if len(jax.devices()) > 1:
            with pytest.raises(ValueError):
                DeviceResidentData(ds)

    def test_prefetch_with_mesh(self):
        mesh = make_mesh({"data": 8})
        ds, *_ = make_env()
        fetched = next(prefetch_to_device(ds.batches(16, shuffle=False), mesh))
        sharding = fetched["joint_command"].sharding
        assert sharding.spec == jax.sharding.PartitionSpec("data")


class TestOrbaxBackend:
    def test_orbax_roundtrip(self, tmp_path):
        ds, norm, model, sched, opt, state = make_env()
        from soccerdiffusion_tpu.training.checkpoint import wait_for_async_saves

        save_checkpoint(tmp_path / "ockpt", state, norm, {"hidden_dim": 32},
                        epoch=2, backend="orbax")
        wait_for_async_saves()
        restored = load_checkpoint(tmp_path / "ockpt", state_template=state)
        assert restored["hyperparams"] == {"hidden_dim": 32}
        assert restored["current_epoch"] == 2
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            restored["state"].params, jax.device_get(state.params),
        )
        # optimizer state restored into the optax namedtuple structure
        assert type(restored["state"].opt_state) is type(state.opt_state)


class TestHybridMesh:
    """DCN-aware two-level mesh: "dcn" outermost, ICI axes inside a slice
    (parallel/mesh.make_hybrid_mesh; SURVEY.md §5.8)."""

    def test_construction_and_grouping(self):
        from soccerdiffusion_tpu.parallel import make_mesh

        mesh = make_mesh({"dcn": 2, "data": 2, "model": 2})
        assert mesh.axis_names == ("dcn", "data", "model")
        assert mesh.devices.shape == (2, 2, 2)
        # contiguous simulated slices: all of slice 0's devices precede
        # slice 1's (dcn varies slowest)
        ids = [[d.id for d in row.flat] for row in mesh.devices]
        assert max(ids[0]) < min(ids[1])

    def test_rules_for_mesh_derivation(self):
        from soccerdiffusion_tpu.parallel import make_mesh, rules_for_mesh
        from jax.sharding import PartitionSpec as P

        rules = rules_for_mesh(make_mesh({"dcn": 2, "data": 4}))
        assert rules.dcn and rules.data_axis == "data"
        assert rules.batch_spec() == P(("dcn", "data"))
        plain = rules_for_mesh(make_mesh({"data": 8}))
        assert not plain.dcn and plain.batch_spec() == P("data")

    def test_model_axis_over_dcn_rejected(self):
        from soccerdiffusion_tpu.parallel import MeshRules
        import pytest

        with pytest.raises(ValueError):
            MeshRules(model_axis="dcn")

    def test_dcn_dp_matches_single_device(self):
        from soccerdiffusion_tpu.parallel import make_mesh, shard_batch

        mesh = make_mesh({"dcn": 2, "data": 4})
        ds, norm, model, sched, opt, state = make_env(batch_size=16)
        step = make_train_step(model, sched, opt, norm, donate=False)
        host_batch = next(ds.batches(16, shuffle=False))
        _, m_single = step(state, jax.device_put(host_batch), 0)
        with mesh:
            _, m_dcn = step(state, shard_batch(mesh, host_batch), 0)
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_dcn["loss"]), rtol=1e-5)

    def test_dcn_tp_train_step_matches(self):
        from soccerdiffusion_tpu.parallel import (
            MeshRules, make_mesh, param_shardings, shard_batch)

        mesh = make_mesh({"dcn": 2, "data": 2, "model": 2})
        ds, norm, model, sched, opt, state = make_env(batch_size=16)
        step = make_train_step(model, sched, opt, norm, donate=False)
        host_batch = next(ds.batches(16, shuffle=False))
        _, m_single = step(state, jax.device_put(host_batch), 0)
        rules = MeshRules(model_axis="model", dcn=True)
        with mesh:
            sharded = jax.device_put(state.params,
                                     param_shardings(mesh, state.params, rules))
            batch = shard_batch(mesh, host_batch, rules)
            _, m = step(state.replace(params=sharded), batch, 0)
        np.testing.assert_allclose(float(m_single["loss"]), float(m["loss"]),
                                   rtol=1e-4)
