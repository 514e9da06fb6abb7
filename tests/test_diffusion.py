"""Golden-value tests for the diffusion core.

The expected values are computed by an independent numpy re-derivation of the
published DDIM/improved-DDPM math (the semantics the reference gets from
diffusers' DDIMScheduler; reference ml/training/train.py:185-186, 218 and
ml/inference/ros.py:301-310), written from the papers' closed forms — not by
importing diffusers.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soccerdiffusion_tpu.diffusion import (
    add_noise,
    ddim_sample,
    ddim_step,
    ddim_timesteps,
    ddpm_sample,
    make_schedule,
)


def np_squaredcos_alphas_cumprod(T: int, max_beta: float = 0.999) -> np.ndarray:
    """Independent reimplementation: improved-DDPM cosine schedule."""

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = [min(1 - alpha_bar((i + 1) / T) / alpha_bar(i / T), max_beta) for i in range(T)]
    return np.cumprod(1.0 - np.array(betas, dtype=np.float64))


class TestSchedule:
    def test_alphas_cumprod_matches_closed_form(self):
        sched = make_schedule(1000)
        expected = np_squaredcos_alphas_cumprod(1000)
        np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), expected, rtol=2e-5)

    def test_beta_cap(self):
        sched = make_schedule(1000)
        assert float(jnp.max(sched.betas)) <= 0.999 + 1e-6  # float32 rounding of the cap

    def test_monotone_decreasing(self):
        sched = make_schedule(50)
        acp = np.asarray(sched.alphas_cumprod)
        assert np.all(np.diff(acp) < 0)
        assert 0 < acp[-1] < acp[0] < 1

    def test_final_alpha_cumprod_is_one(self):
        # diffusers DDIMScheduler default set_alpha_to_one=True
        assert make_schedule(100).final_alpha_cumprod == 1.0


class TestAddNoise:
    def test_matches_closed_form(self):
        sched = make_schedule(1000)
        acp = np_squaredcos_alphas_cumprod(1000)
        rng = np.random.default_rng(0)
        x0 = rng.standard_normal((4, 10, 20)).astype(np.float32)
        noise = rng.standard_normal((4, 10, 20)).astype(np.float32)
        t = np.array([0, 1, 500, 999], dtype=np.int32)
        got = np.asarray(add_noise(sched, jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(t)))
        expected = (
            np.sqrt(acp[t])[:, None, None] * x0 + np.sqrt(1 - acp[t])[:, None, None] * noise
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_t0_is_nearly_clean(self):
        sched = make_schedule(1000)
        x0 = jnp.ones((2, 3, 4))
        noise = jnp.zeros((2, 3, 4))
        out = add_noise(sched, x0, noise, jnp.array([0, 0]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3)


class TestDDIMTimesteps:
    def test_leading_spacing_1000_30(self):
        ts = ddim_timesteps(1000, 30)
        # step_ratio = 33 -> 957, 924, ..., 33, 0
        assert ts[0] == 957 and ts[-1] == 0
        assert len(ts) == 30
        np.testing.assert_array_equal(np.diff(ts), -33 * np.ones(29, dtype=np.int64))

    def test_full_steps_identity(self):
        ts = ddim_timesteps(10, 10)
        np.testing.assert_array_equal(ts, np.arange(9, -1, -1))

    def test_too_many_steps_raises(self):
        with pytest.raises(ValueError):
            ddim_timesteps(10, 11)


class TestDDIMStep:
    def test_matches_closed_form(self):
        T, n = 1000, 30
        sched = make_schedule(T)
        acp = np_squaredcos_alphas_cumprod(T)
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 10, 20)).astype(np.float32)
        eps = rng.standard_normal((2, 10, 20)).astype(np.float32)
        t, prev_t = 957, 957 - T // n
        got = np.asarray(ddim_step(sched, jnp.asarray(eps), t, prev_t, jnp.asarray(x)))
        x0_hat = (x - math.sqrt(1 - acp[t]) * eps) / math.sqrt(acp[t])
        expected = math.sqrt(acp[prev_t]) * x0_hat + math.sqrt(1 - acp[prev_t]) * eps
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_final_step_uses_alpha_one(self):
        # prev_t < 0 => abar_prev = 1.0 => x_prev = x0_hat exactly.
        T, n = 1000, 30
        sched = make_schedule(T)
        acp = np_squaredcos_alphas_cumprod(T)
        x = np.full((1, 2, 3), 0.7, dtype=np.float32)
        eps = np.full((1, 2, 3), -0.2, dtype=np.float32)
        got = np.asarray(ddim_step(sched, jnp.asarray(eps), 0, 0 - T // n, jnp.asarray(x)))
        x0_hat = (x - math.sqrt(1 - acp[0]) * eps) / math.sqrt(acp[0])
        np.testing.assert_allclose(got, x0_hat, rtol=1e-5, atol=1e-6)


    def test_clip_x0_inactive_when_within_range(self):
        """clip_x0 large enough to never bind matches the unclipped step to
        float-roundtrip precision (production passes clip_x0=None, which
        skips the branch entirely and stays bit-exact)."""
        T, n = 1000, 30
        sched = make_schedule(T)
        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 10, 20)).astype(np.float32)
        eps = rng.standard_normal((2, 10, 20)).astype(np.float32)
        t, prev_t = 33, 33 - T // n
        plain = np.asarray(ddim_step(sched, jnp.asarray(eps), t, prev_t, jnp.asarray(x)))
        clipped = np.asarray(ddim_step(sched, jnp.asarray(eps), t, prev_t,
                                       jnp.asarray(x), clip_x0=1e6))
        np.testing.assert_allclose(plain, clipped, rtol=1e-6, atol=1e-6)

    def test_clip_x0_clamps_and_recomputes_eps(self):
        """diffusers clip_sample semantics: x0_hat clamped to [-c, c], eps
        recomputed from the clamped x0 (DDIMScheduler.step with
        clip_sample=True, as the preliminary MLP archetype uses)."""
        T, n = 1000, 30
        sched = make_schedule(T)
        acp = np_squaredcos_alphas_cumprod(T)
        t, prev_t = 957, 957 - T // n
        # big positive sample at high t => x0_hat explodes without clipping
        x = np.full((1, 3, 4), 5.0, dtype=np.float32)
        eps = np.zeros((1, 3, 4), dtype=np.float32)
        got = np.asarray(ddim_step(sched, jnp.asarray(eps), t, prev_t,
                                   jnp.asarray(x), clip_x0=1.0))
        x0 = np.clip(x / math.sqrt(acp[t]), -1.0, 1.0)
        eps_re = (x - math.sqrt(acp[t]) * x0) / math.sqrt(1 - acp[t])
        expected = math.sqrt(acp[prev_t]) * x0 + math.sqrt(1 - acp[prev_t]) * eps_re
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_ddim_sample_clip_bounds_the_walk(self):
        """A zero-eps denoiser (worst case: pure amplification) stays within
        [-c, c] under clip_x0 where the unclipped walk explodes."""
        sched = make_schedule(1000)
        noise = 3.0 * jax.random.normal(jax.random.key(0), (4, 10, 12))
        zero_fn = lambda x, t: jnp.zeros_like(x)
        wild = np.asarray(ddim_sample(sched, zero_fn, noise, 30))
        tame = np.asarray(ddim_sample(sched, zero_fn, noise, 30, clip_x0=1.0))
        assert np.abs(wild).max() > 10.0
        assert np.abs(tame).max() <= 1.0 + 1e-5


class TestSamplers:
    def test_ddim_sample_perfect_model_recovers_x0(self):
        """With a denoiser that knows the true eps for the tracked x_t, DDIM
        must walk back to x0: simulate eps(x_t, t) = (x_t - sqrt(abar_t) x0)/sqrt(1-abar_t)."""
        T, n = 1000, 30
        sched = make_schedule(T)
        x0 = jnp.asarray(np.random.default_rng(2).standard_normal((2, 10, 4)).astype(np.float32))
        xT_eps = jnp.asarray(np.random.default_rng(3).standard_normal((2, 10, 4)).astype(np.float32))
        x_start = add_noise(sched, x0, xT_eps, jnp.full((2,), T - 1))

        def oracle_eps(x, t):
            abar = sched.alphas_cumprod[t]
            return (x - jnp.sqrt(abar) * x0) / jnp.sqrt(1.0 - abar)

        out = ddim_sample(sched, oracle_eps, x_start, n)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3, atol=1e-3)

    def test_ddim_sample_jittable(self):
        sched = make_schedule(100)
        f = jax.jit(lambda x: ddim_sample(sched, lambda xt, t: xt * 0.0, x, 10))
        out = f(jnp.ones((1, 4, 2)))
        assert out.shape == (1, 4, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_ddpm_sample_perfect_model_recovers_x0_approx(self):
        T = 100
        sched = make_schedule(T)
        x0 = jnp.asarray(np.random.default_rng(4).standard_normal((2, 5, 3)).astype(np.float32))

        def oracle_eps(x, t):
            abar = sched.alphas_cumprod[t]
            return (x - jnp.sqrt(abar) * x0) / jnp.sqrt(1.0 - abar)

        xT = jax.random.normal(jax.random.key(0), x0.shape)
        out = ddpm_sample(sched, oracle_eps, xT, jax.random.key(1))
        # Ancestral sampling injects noise, so tolerance is loose; it must
        # still land near x0 with the oracle denoiser.
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.2)

    def test_ddim_deterministic(self):
        sched = make_schedule(100)

        def eps_fn(x, t):
            return jnp.tanh(x) * 0.1

        x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 4, 2)).astype(np.float32))
        a = ddim_sample(sched, eps_fn, x, 10)
        b = ddim_sample(sched, eps_fn, x, 10)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDPMSolverPP:
    """DPM-Solver++(2M) against the closed-form Gaussian probability-flow ODE.

    For x0 ~ N(0, s^2 I) the exact posterior epsilon is
    eps*(x, t) = x * sigma_t / (abar_t s^2 + 1 - abar_t), and along the
    probability-flow ODE x / sqrt(var_t) is invariant, so the exact
    denoised endpoint from x_T at the first leading-spaced timestep is
    x_T * sqrt(s^2 / var_T). This gives a ground truth against which the
    DISCRETIZATION error of each solver is measured exactly.
    """

    S2 = 0.25

    def _setup(self):
        from soccerdiffusion_tpu.diffusion import solver_sample

        sched = make_schedule(1000)
        acp = jnp.asarray(np.asarray(sched.alphas_cumprod, np.float64),
                          jnp.float32)

        def eps_fn(x, t):
            ab = jnp.take(acp, t)
            sig2 = 1.0 - ab
            v = ab * self.S2 + sig2
            return x * jnp.sqrt(sig2) / v

        xT = jnp.asarray(np.random.default_rng(0)
                         .standard_normal((4, 10, 3)).astype(np.float32))
        acp64 = np.asarray(sched.alphas_cumprod, np.float64)

        def exact(N, spacing):
            # the exact ODE endpoint depends on the solver's OWN start
            # timestep (leading: ddim_timesteps[0]; lambda: ~T-1), so
            # measure each solver against its own x/sqrt(var) invariant
            from soccerdiffusion_tpu.diffusion.dpm_solver import solver_timesteps

            t0 = int(solver_timesteps(sched, N, spacing)[0])
            vT = acp64[t0] * self.S2 + (1 - acp64[t0])
            return np.asarray(xT) * np.sqrt(self.S2 / vT)

        def err(solver, N):
            from soccerdiffusion_tpu.diffusion import parse_solver

            out = np.asarray(solver_sample(sched, eps_fn, xT, N, solver=solver))
            return float(np.abs(out - exact(N, parse_solver(solver)[1])).max())

        return err

    def test_lambda_spaced_dpmpp_beats_leading_ddim(self):
        # the deployment claim: dpmpp on log-SNR-uniform timesteps vs the
        # reference's leading-spaced DDIM at the same step count
        err = self._setup()
        for N in (8, 10, 16, 30):
            assert err("dpmpp@lambda", N) < 0.55 * err("ddim", N), N

    def test_dpmpp10_lambda_matches_ddim30(self):
        # the few-step headline: 10 lambda-spaced dpmpp steps at or beyond
        # 30-step leading DDIM accuracy (training-free)
        err = self._setup()
        assert err("dpmpp@lambda", 10) < err("ddim", 30)

    def test_second_order_convergence(self):
        # on the shared leading spacing (smooth h ratios at large N),
        # halving h must cut the dpmpp error ~4x (2nd order) where DDIM
        # (1st order) manages ~2x
        err = self._setup()
        assert err("dpmpp", 16) / err("dpmpp", 32) > 2.7
        assert err("ddim", 16) / err("ddim", 32) < 2.3

    def test_ddim_table_matches_ddim_sample(self):
        from soccerdiffusion_tpu.diffusion import solver_sample

        sched = make_schedule(200)

        def eps_fn(x, t):
            return jnp.tanh(x) * 0.3

        x = jnp.asarray(np.random.default_rng(7)
                        .standard_normal((2, 6, 4)).astype(np.float32))
        a = ddim_sample(sched, eps_fn, x, 12)
        b = solver_sample(sched, eps_fn, x, 12, solver="ddim")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    def test_unknown_solver_raises(self):
        from soccerdiffusion_tpu.diffusion import solver_coef_table

        sched = make_schedule(100)
        try:
            solver_coef_table(sched, 5, solver="euler")
        except ValueError:
            pass
        else:
            raise AssertionError("expected ValueError")

    def test_table_final_step_is_exact_limit(self):
        """Terminal step (sigma_prev=0): x_next must be exactly the x0
        estimate — A,B reduce to the first-order P,Q row under
        lower_order_final."""
        from soccerdiffusion_tpu.diffusion import solver_coef_table

        sched = make_schedule(100)
        tab = solver_coef_table(sched, 10, solver="dpmpp")
        A, B, C, P, Q = tab[-1]
        assert C == 0.0  # lower_order_final
        np.testing.assert_allclose(A, P, rtol=1e-6)
        np.testing.assert_allclose(B, Q, rtol=1e-6)

    def test_matches_direct_2m_transcription(self):
        """The (T,5) table exactly reproduces a direct step-by-step
        transcription of the DPM-Solver++(2M) data-prediction update
        (Lu et al. 2022, eq. as implemented by diffusers'
        DPMSolverMultistepScheduler with lower_order_final), including the
        exact terminal projection."""
        from soccerdiffusion_tpu.diffusion import solver_sample, solver_timesteps

        sched = make_schedule(1000)
        acp = np.asarray(sched.alphas_cumprod, np.float64)
        N = 10
        for spacing in ("leading", "lambda"):
            ts = np.asarray(solver_timesteps(sched, N, spacing), np.int64)

            def eps_np(x, t):
                ab = acp[t]
                return np.tanh(x) * 0.7 + 0.1 * x * np.sqrt(1 - ab)

            x = np.random.default_rng(1).normal(size=(3, 8))
            m_hist, h_hist = [], []
            for i, t in enumerate(ts):
                prev = int(ts[i + 1]) if i + 1 < len(ts) else -1
                ab_c = acp[t]
                ab_p = acp[prev] if prev >= 0 else 1.0
                a_c, s_c = np.sqrt(ab_c), np.sqrt(1 - ab_c)
                a_p, s_p = np.sqrt(ab_p), np.sqrt(1 - ab_p)
                eps = eps_np(x, int(t))
                m0 = (x - s_c * eps) / a_c
                if s_p == 0.0:
                    x = m0
                    m_hist.append(m0)
                    continue
                h = np.log(a_p / s_p) - np.log(a_c / s_c)
                if not m_hist or i == N - 1:
                    x = (s_p / s_c) * x - a_p * (np.exp(-h) - 1.0) * m0
                else:
                    r0 = h_hist[-1] / h
                    D1 = (1.0 / r0) * (m0 - m_hist[-1])
                    x = ((s_p / s_c) * x
                         - a_p * (np.exp(-h) - 1.0) * (m0 + 0.5 * D1))
                m_hist.append(m0)
                h_hist.append(h)

            def eps_fn(xj, t):
                ab = jnp.take(jnp.asarray(acp, jnp.float32), t)
                return jnp.tanh(xj) * 0.7 + 0.1 * xj * jnp.sqrt(1 - ab)

            solver = "dpmpp" if spacing == "leading" else "dpmpp@lambda"
            ours = np.asarray(solver_sample(
                sched, eps_fn,
                jnp.asarray(np.random.default_rng(1).normal(size=(3, 8)),
                            jnp.float32),
                N, solver=solver))
            np.testing.assert_allclose(ours, x, rtol=3e-5, atol=3e-5)
