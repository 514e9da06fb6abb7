"""Whole-chunk fused sampler (interpret mode on CPU) vs the XLA DDIM path."""

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.diffusion import ddim_sample, ddim_timesteps, make_schedule
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.ops.fused_chunk import FusedChunkSampler
from soccerdiffusion_tpu.config import ModelConfig
from tests.test_fused_denoise import CFG, setup


def get_context(model, variables, kv_setup_batch=4):
    # setup() returns kv; tests here need the raw context too
    pass


def full_setup(b=4, cfg=None):
    rng = np.random.default_rng(0)
    cfg = cfg or CFG
    model = DiffusionPolicy(cfg)
    batch = {
        "joint_command_history": jnp.asarray(
            rng.random((b, cfg.action_context_length, cfg.num_joints), dtype=np.float32)),
        "rotation": jnp.asarray(
            rng.random((b, cfg.imu_context_length, 4), dtype=np.float32)),
        "joint_state": jnp.asarray(
            rng.random((b, cfg.joint_state_context_length, cfg.num_joints), dtype=np.float32)),
        "game_state": jnp.zeros((b,), jnp.int32),
    }
    noisy = jnp.asarray(rng.standard_normal(
        (b, cfg.trajectory_prediction_length, cfg.num_joints)).astype(np.float32))
    t = jnp.full((b,), 37, jnp.int32)
    variables = model.init(jax.random.key(0), batch, noisy, t)
    ctx = model.apply(variables, batch, method=model.encode_context)
    kv = model.apply(variables, ctx, method=model.precompute_context_kv)
    return model, variables, ctx, kv, noisy


def xla_sample(model, variables, kv, noise, schedule, steps):
    b = noise.shape[0]

    def denoise_fn(x, t):
        return model.apply(variables, kv, x, jnp.full((b,), t, jnp.int32),
                           method=model.denoise_with_kv)

    return ddim_sample(schedule, denoise_fn, noise, steps)


def step_table(model, variables, schedule, steps):
    ts = jnp.asarray(ddim_timesteps(schedule.num_train_timesteps, steps))
    return model.apply(variables, ts, method=lambda m, tt: m.step_encoding(tt))[:, 0]


class TestFusedChunkSampler:
    def test_full_chunk_matches_xla_sampler(self):
        model, variables, ctx, kv, noisy = full_setup(b=4)
        schedule = make_schedule(100)
        steps = 5
        expected = xla_sample(model, variables, kv, noisy, schedule, steps)

        fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                  block_robots=2)
        got = fused.sample(ctx, noisy,
                           step_table(model, variables, schedule, steps),
                           schedule, steps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=8e-3, atol=8e-3)

    def test_block_sizes_agree(self):
        model, variables, ctx, kv, noisy = full_setup(b=8)
        schedule = make_schedule(60)
        steps = 3
        st = step_table(model, variables, schedule, steps)
        outs = []
        for block in (2, 4, 8):
            fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                      block_robots=block)
            outs.append(np.asarray(fused.sample(ctx, noisy, st, schedule, steps)))
        np.testing.assert_allclose(outs[0], outs[1], rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(outs[0], outs[2], rtol=2e-3, atol=2e-3)

    def test_grouped_blockdiag_matches_xla(self):
        """group_robots > 1 flattens G robots into one block-diagonal
        attention per group — numerics must match the XLA sampler exactly
        (the off-diagonal blocks are masked, not approximated)."""
        model, variables, ctx, kv, noisy = full_setup(b=8)
        schedule = make_schedule(60)
        steps = 3
        expected = np.asarray(xla_sample(model, variables, kv, noisy, schedule, steps))
        st = step_table(model, variables, schedule, steps)
        for block, group in ((8, 2), (8, 4), (8, 8), (4, 2)):
            fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                      block_robots=block, group_robots=group)
            got = np.asarray(fused.sample(ctx, noisy, st, schedule, steps))
            np.testing.assert_allclose(got, expected, rtol=8e-3, atol=8e-3,
                                       err_msg=f"block={block} group={group}")

    def test_grouped_rejects_indivisible_group(self):
        model, variables, ctx, kv, noisy = full_setup(b=4)
        with np.testing.assert_raises(ValueError):
            FusedChunkSampler(model, variables["params"], interpret=True,
                              block_robots=4, group_robots=3)

    def test_eight_head_parity(self):
        """Head-stacked attention with a non-default head count."""
        cfg8 = ModelConfig(**{**CFG.__dict__, "hidden_dim": 256,
                              "num_decoder_heads": 8})
        model, variables, ctx, kv, noisy = full_setup(b=2, cfg=cfg8)
        schedule = make_schedule(50)
        expected = xla_sample(model, variables, kv, noisy, schedule, 2)
        fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                  block_robots=2)
        assert fused.num_heads == 8
        got = fused.sample(ctx, noisy, step_table(model, variables, schedule, 2),
                           schedule, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=8e-3, atol=8e-3)

    def test_single_step_is_distilled_forward(self):
        """T=1 chunk == one denoise + one DDIM update."""
        model, variables, ctx, kv, noisy = full_setup(b=4)
        schedule = make_schedule(50)
        expected = xla_sample(model, variables, kv, noisy, schedule, 1)

        fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                  block_robots=4)
        got = fused.sample(ctx, noisy, step_table(model, variables, schedule, 1),
                           schedule, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=5e-3, atol=5e-3)

    def test_rejects_indivisible_batch(self):
        model, variables, ctx, kv, noisy = full_setup(b=4)
        schedule = make_schedule(50)
        fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                  block_robots=3)
        try:
            fused.sample(ctx, noisy, step_table(model, variables, schedule, 1),
                         schedule, 1)
            assert False, "should raise"
        except AssertionError as e:
            assert "divisible" in str(e)


class TestQstatOrientation:
    def test_qstat_single_step_matches_xla(self):
        """Streamed-K orientation, exact single-step parity."""
        model, variables, ctx, kv, noisy = full_setup(b=4)
        schedule = make_schedule(50)
        expected = xla_sample(model, variables, kv, noisy, schedule, 1)
        fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                  block_robots=4, cross_orientation="qstat")
        got = fused.sample(ctx, noisy, step_table(model, variables, schedule, 1),
                           schedule, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=8e-3, atol=8e-3)

    def test_qstat_multi_step_bounded_drift(self):
        """Multi-step drift now matches kstat-level accuracy: normalization
        divides the fp32 output after the value contraction instead of
        rounding normalized probabilities to bf16 before it."""
        model, variables, ctx, kv, noisy = full_setup(b=4)
        schedule = make_schedule(60)
        expected = xla_sample(model, variables, kv, noisy, schedule, 3)
        fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                  block_robots=4, cross_orientation="qstat")
        got = fused.sample(ctx, noisy, step_table(model, variables, schedule, 3),
                           schedule, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=8e-3, atol=8e-3)

    def test_qstat_rejects_grouping(self):
        model, variables, ctx, kv, noisy = full_setup(b=4)
        with np.testing.assert_raises(ValueError):
            FusedChunkSampler(model, variables["params"], interpret=True,
                              block_robots=4, group_robots=2,
                              cross_orientation="qstat")


class TestInt8ContextKV:
    """context_kv_quant="int8": bounded-error study of the quantized
    cross-attention path (per-(layer,tensor) scales, int8 score/value dots,
    1/127 fixed-point probabilities)."""

    def test_int8_single_step_bounded_error(self):
        model, variables, ctx, kv, noisy = full_setup(b=4)
        schedule = make_schedule(50)
        expected = np.asarray(xla_sample(model, variables, kv, noisy, schedule, 1))
        fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                  block_robots=4, context_kv_quant="int8")
        got = np.asarray(fused.sample(
            ctx, noisy, step_table(model, variables, schedule, 1), schedule, 1))
        err = np.abs(got - expected)
        scale = np.abs(expected).mean() + 1e-6
        assert err.max() / scale < 0.05, (err.max(), scale)

    def test_int8_multi_step_bounded_drift(self):
        model, variables, ctx, kv, noisy = full_setup(b=4)
        schedule = make_schedule(60)
        steps = 5
        expected = np.asarray(xla_sample(model, variables, kv, noisy, schedule, steps))
        fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                  block_robots=4, context_kv_quant="int8")
        got = np.asarray(fused.sample(
            ctx, noisy, step_table(model, variables, schedule, steps),
            schedule, steps))
        err = np.abs(got - expected)
        scale = np.abs(expected).mean() + 1e-6
        # multi-step accumulation of the int8 rounding stays bounded
        assert err.max() / scale < 0.15, (err.max(), scale)
        assert err.mean() / scale < 0.05, (err.mean(), scale)

    def test_int8_rejects_qstat_and_grouping(self):
        model, variables, ctx, kv, noisy = full_setup(b=4)
        st = step_table(model, variables, make_schedule(50), 1)
        for kwargs in ({"cross_orientation": "qstat"}, {"group_robots": 2}):
            fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                      block_robots=4, context_kv_quant="int8",
                                      **kwargs)
            with np.testing.assert_raises(ValueError):
                fused.sample(ctx, noisy, st, make_schedule(50), 1)

    def test_int8_rejects_unknown_mode(self):
        model, variables, *_ = full_setup(b=4)
        with np.testing.assert_raises(ValueError):
            FusedChunkSampler(model, variables["params"], interpret=True,
                              block_robots=4, context_kv_quant="fp8")


class TestDpmppSolverInKernel:
    def test_dpmpp_chunk_matches_xla_solver(self):
        from soccerdiffusion_tpu.diffusion import solver_sample

        model, variables, ctx, kv, noisy = full_setup(b=4)
        schedule = make_schedule(100)
        steps = 5
        b = noisy.shape[0]

        def denoise_fn(x, t):
            return model.apply(variables, kv, x, jnp.full((b,), t, jnp.int32),
                               method=model.denoise_with_kv)

        expected = solver_sample(schedule, denoise_fn, noisy, steps,
                                 solver="dpmpp")
        fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                  block_robots=2)
        got = fused.sample(ctx, noisy,
                           step_table(model, variables, schedule, steps),
                           schedule, steps, solver="dpmpp")
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=8e-3, atol=8e-3)

    def test_dpmpp_differs_from_ddim(self):
        # guard against the solver arg being silently ignored
        model, variables, ctx, kv, noisy = full_setup(b=2)
        schedule = make_schedule(100)
        steps = 4
        st = step_table(model, variables, schedule, steps)
        fused = FusedChunkSampler(model, variables["params"], interpret=True,
                                  block_robots=2)
        a = np.asarray(fused.sample(ctx, noisy, st, schedule, steps))
        b = np.asarray(fused.sample(ctx, noisy, st, schedule, steps,
                                    solver="dpmpp"))
        assert np.abs(a - b).max() > 1e-4
