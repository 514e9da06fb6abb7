"""Fused ViT block (interpret mode): forward parity vs the flax layer and
gradient parity vs autodiff — the custom-VJP backward recomputes in-kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soccerdiffusion_tpu.models.transformer import TransformerEncoderLayer
from soccerdiffusion_tpu.ops.fused_vit_block import make_vit_block_fn

LAYOUTS = ("stacked", "headloop")

W, T, H, FF = 64, 13, 4, 256


def setup(n=6, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, T, W)).astype(np.float32), dtype)
    layer = TransformerEncoderLayer(W, H, ff_dim=FF, dtype=dtype)
    params = layer.init(jax.random.key(0), x)["params"]
    return layer, params, x


def flat_weights(params):
    sa = params["self_attn"]
    wqkv = jnp.concatenate([sa["q_proj"]["kernel"], sa["k_proj"]["kernel"],
                            sa["v_proj"]["kernel"]], axis=1)
    bqkv = jnp.concatenate([sa["q_proj"]["bias"], sa["k_proj"]["bias"],
                            sa["v_proj"]["bias"]])
    return (params["norm1"]["scale"], params["norm1"]["bias"], wqkv, bqkv,
            sa["out_proj"]["kernel"], sa["out_proj"]["bias"],
            params["norm2"]["scale"], params["norm2"]["bias"],
            params["mlp"]["linear1"]["kernel"], params["mlp"]["linear1"]["bias"],
            params["mlp"]["linear2"]["kernel"], params["mlp"]["linear2"]["bias"])


class TestForward:
    @pytest.mark.parametrize("layout", LAYOUTS)
    def test_matches_flax_layer(self, layout):
        layer, params, x = setup()
        want = layer.apply({"params": params}, x)
        fn = make_vit_block_fn(H, block_frames=3, interpret=True,
                               layout=layout)
        got = fn(x, *flat_weights(params))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_layouts_agree(self):
        """stacked and headloop are the same math in a different layout —
        outputs agree to fp32 roundoff."""
        _, params, x = setup(n=8, seed=7)
        w = flat_weights(params)
        ys = [np.asarray(make_vit_block_fn(H, block_frames=4, interpret=True,
                                           layout=l)(x, *w)) for l in LAYOUTS]
        np.testing.assert_allclose(ys[0], ys[1], rtol=1e-5, atol=1e-5)

    def test_block_sizes_agree(self):
        _, params, x = setup(n=8)
        w = flat_weights(params)
        outs = [np.asarray(make_vit_block_fn(H, block_frames=f, interpret=True)(x, *w))
                for f in (2, 4, 8)]
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=1e-5)

    def test_indivisible_batch_shrinks_block(self):
        _, params, x = setup(n=5)
        fn = make_vit_block_fn(H, block_frames=4, interpret=True)
        assert fn(x, *flat_weights(params)).shape == (5, T, W)


class TestGradients:
    @pytest.mark.parametrize("layout", LAYOUTS)
    def test_grads_match_autodiff(self, layout):
        """d(loss)/d(x, every weight) vs jax.grad through the flax layer."""
        layer, params, x = setup(n=4, seed=3)
        cot = jnp.asarray(
            np.random.default_rng(9).standard_normal((4, T, W)).astype(np.float32))

        def loss_ref(params, x):
            return jnp.sum(layer.apply({"params": params}, x) * cot)

        want_dp, want_dx = jax.grad(loss_ref, argnums=(0, 1))(params, x)

        fn = make_vit_block_fn(H, block_frames=2, interpret=True,
                               layout=layout)

        def loss_fused(weights, x):
            return jnp.sum(fn(x, *weights) * cot)

        got_dw, got_dx = jax.grad(loss_fused, argnums=(0, 1))(
            flat_weights(params), x)

        rtol = atol = 2e-3
        np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                                   rtol=rtol, atol=atol, err_msg="dx")
        want_w = flat_weights(want_dp)
        names = ("g1", "be1", "wqkv", "bqkv", "wo", "bo", "g2", "be2",
                 "w1", "b1", "w2", "b2")
        for name, got, want in zip(names, got_dw, want_w):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=rtol, atol=atol, err_msg=name)

    def test_grad_accumulates_across_grid(self):
        """Weight grads must sum over ALL frame blocks (grid accumulation):
        doubling the batch by concatenation doubles the weight grads."""
        _, params, x = setup(n=3, seed=5)
        w = flat_weights(params)
        fn = make_vit_block_fn(H, block_frames=3, interpret=True)

        def wgrad(xin):
            return jax.grad(lambda ww: jnp.sum(fn(xin, *ww)))(w)

        g1 = wgrad(x)
        g2 = wgrad(jnp.concatenate([x, x], axis=0))
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(2 * np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_policy_wiring_param_compat_and_grad(self):
        """vit_fused_block=True: identical param tree to the plain ViT
        policy, matching forward, and a finite train-step gradient."""
        from soccerdiffusion_tpu.config import ModelConfig
        from soccerdiffusion_tpu.models import DiffusionPolicy

        kw = dict(num_joints=6, hidden_dim=32, trajectory_prediction_length=5,
                  action_context_length=10, joint_state_context_length=10,
                  imu_context_length=10, use_images=True,
                  image_encoder_type="vit", image_resolution=32,
                  image_context_length=2, vit_patch_size=16, vit_width=64,
                  vit_depth=2, num_action_history_encoder_layers=1,
                  num_imu_encoder_layers=1, joint_state_encoder_layers=1,
                  num_decoder_layers=1)
        plain = DiffusionPolicy(ModelConfig(**kw))
        fused = DiffusionPolicy(ModelConfig(**kw, vit_fused_block=True))
        rng = np.random.default_rng(0)
        b = 3
        batch = {
            "joint_command": jnp.asarray(rng.random((b, 5, 6), np.float32)),
            "joint_command_history": jnp.asarray(rng.random((b, 10, 6), np.float32)),
            "rotation": jnp.asarray(rng.random((b, 10, 4), np.float32)),
            "joint_state": jnp.asarray(rng.random((b, 10, 6), np.float32)),
            "image_data": jnp.asarray(rng.random((b, 2, 32, 32, 3), np.float32)),
            "game_state": jnp.zeros((b,), jnp.int32),
        }
        noisy = jnp.asarray(rng.random((b, 5, 6), np.float32))
        t = jnp.full((b,), 2, jnp.int32)
        vp = plain.init(jax.random.key(0), batch, noisy, t)
        vf = fused.init(jax.random.key(0), batch, noisy, t)
        assert (jax.tree_util.tree_structure(vp)
                == jax.tree_util.tree_structure(vf))
        # same seed -> same init values -> same forward (tolerance: fp32)
        out_p = plain.apply(vp, batch, noisy, t, False)
        out_f = fused.apply(vp, batch, noisy, t, False)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                                   rtol=2e-4, atol=2e-4)
        grads = jax.grad(
            lambda p: jnp.mean(jnp.square(
                fused.apply({"params": p}, batch, noisy, t, False))))(vp["params"])
        flat, _ = jax.tree_util.tree_flatten(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        vit_grads = grads["image_sequence_encoder"]["image_encoder"]["blocks"]
        assert float(jnp.abs(vit_grads["layer_0"]["mlp"]["linear1"]["kernel"]).sum()) > 0

    def test_bf16_finite_and_close(self):
        layer, params, x = setup(n=4, dtype=jnp.bfloat16)
        fn = make_vit_block_fn(H, block_frames=2, interpret=True)
        w = flat_weights(params)
        y = fn(x.astype(jnp.bfloat16), *w)
        assert y.dtype == jnp.bfloat16
        want = layer.apply({"params": params}, x.astype(jnp.bfloat16))
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(want, np.float32),
            rtol=6e-2, atol=6e-2)
        g = jax.grad(lambda xx: jnp.sum(fn(xx, *w).astype(jnp.float32)))(
            x.astype(jnp.bfloat16))
        assert np.all(np.isfinite(np.asarray(g, np.float32)))


class TestPolyGelu:
    """The "poly" GELU option: FMA-only minimax approximation with bounded
    error vs the exact erf-based path (ops/fused_vit_block._gelu_poly)."""

    def test_function_level_error_bounds(self):
        from soccerdiffusion_tpu.ops.fused_denoise import _gelu_exact
        from soccerdiffusion_tpu.ops.fused_vit_block import (
            _gelu_cdf, _gelu_grad, _gelu_poly, _gelu_poly_grad)

        z = jnp.linspace(-12.0, 12.0, 200001)
        assert float(jnp.max(jnp.abs(_gelu_poly(z) - _gelu_exact(z)))) < 5e-4
        exact_grad = _gelu_grad(z, _gelu_cdf(z))
        assert float(jnp.max(jnp.abs(_gelu_poly_grad(z) - exact_grad))) < 2.5e-3

    def test_kernel_outputs_close_to_exact(self):
        layer, params, x = setup()
        w = flat_weights(params)
        y_exact = make_vit_block_fn(H, block_frames=3, interpret=True)(x, *w)
        y_poly = make_vit_block_fn(H, block_frames=3, interpret=True,
                                   gelu="poly")(x, *w)
        np.testing.assert_allclose(np.asarray(y_poly), np.asarray(y_exact),
                                   atol=2e-3)

    def test_poly_grads_close_to_exact(self):
        layer, params, x = setup(n=4)
        w = flat_weights(params)

        def loss(fn, weights, xin):
            return jnp.sum(fn(xin, *weights) ** 2)

        f_exact = make_vit_block_fn(H, block_frames=2, interpret=True)
        f_poly = make_vit_block_fn(H, block_frames=2, interpret=True,
                                   gelu="poly")
        ge = jax.grad(lambda ws: loss(f_exact, ws, x))(w)
        gp = jax.grad(lambda ws: loss(f_poly, ws, x))(w)
        for i, (a, b) in enumerate(zip(ge, gp)):
            ref = float(jnp.max(jnp.abs(a))) + 1e-6
            err = float(jnp.max(jnp.abs(a - b)))
            assert err / ref < 2e-2, f"weight {i}: rel {err / ref}"


class TestQuickGelu:
    """The "quick" / "bf16" GELU options: quick-GELU z*sigmoid(1.702z)
    (the CLIP activation) in fp32 or evaluated on storage-dtype (bf16)
    arrays. These are a deliberate activation SUBSTITUTION (<=2.1e-2 from
    exact GELU), chosen because v5e Mosaic has no bf16 comparisons and
    high-degree Horner is ill-conditioned in bf16 (both measured —
    docs/perf_notes.md)."""

    def test_function_level_error_bounds(self):
        from soccerdiffusion_tpu.ops.fused_denoise import _gelu_exact
        from soccerdiffusion_tpu.ops.fused_vit_block import (
            _gelu_cdf, _gelu_grad, _gelu_quick, _gelu_quick_grad)

        z = jnp.linspace(-12.0, 12.0, 200001)
        s = _gelu_quick(z)
        assert float(jnp.max(jnp.abs(z * s - _gelu_exact(z)))) < 2.5e-2
        exact_grad = _gelu_grad(z, _gelu_cdf(z))
        assert float(jnp.max(jnp.abs(_gelu_quick_grad(z, s) - exact_grad))) < 3.5e-2
        # bf16 evaluation stays within bf16 rounding of the fp32 form
        zb = z.astype(jnp.bfloat16)
        sb = _gelu_quick(zb)
        assert float(jnp.max(jnp.abs((zb * sb).astype(jnp.float32)
                                     - _gelu_exact(z)))) < 5e-2
        gb = _gelu_quick_grad(zb, sb).astype(jnp.float32)
        assert float(jnp.max(jnp.abs(gb - exact_grad))) < 5e-2
        # graceful saturation at extremes (no NaN/inf from the bf16 exp)
        zz = jnp.asarray([-6e4, -300.0, 0.0, 300.0, 6e4], jnp.bfloat16)
        ss = _gelu_quick(zz)
        assert bool(jnp.all(jnp.isfinite((zz * ss).astype(jnp.float32))))
        assert bool(jnp.all(jnp.isfinite(
            _gelu_quick_grad(zz, ss).astype(jnp.float32))))

    def test_unfused_path_honors_quick(self):
        """TransformerEncoder with fused_block=False and fused_gelu=quick
        must compute the SAME function as the fused quick kernel — a
        quick-trained checkpoint serves identically with the kernel off."""
        from soccerdiffusion_tpu.models.transformer import TransformerEncoder

        _, params, x = setup(n=4, seed=13)
        w = flat_weights(params)
        fused = make_vit_block_fn(H, block_frames=2, interpret=True,
                                  gelu="quick")(x, *w)
        enc = TransformerEncoder(W, H, num_layers=1, ff_dim=FF,
                                 fused_gelu="quick", fused_block=False)
        want = enc.apply({"params": {"layer_0": params}}, x)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(want),
                                   rtol=3e-4, atol=3e-4)
        # and with exact gelu the two functions measurably DIFFER (guards
        # against the knob silently not reaching the Mlp)
        enc_exact = TransformerEncoder(W, H, num_layers=1, ff_dim=FF,
                                       fused_gelu="exact", fused_block=False)
        want_exact = enc_exact.apply({"params": {"layer_0": params}}, x)
        assert float(jnp.max(jnp.abs(want - want_exact))) > 1e-3

    def test_quick_kernel_close_to_exact(self):
        """fp32 storage: the only difference vs the exact path is the
        activation substitution itself (<=2.1e-2 on hg, diluted through
        w2 and the residual)."""
        _, params, x = setup()
        w = flat_weights(params)
        y_exact = make_vit_block_fn(H, block_frames=3, interpret=True)(x, *w)
        y_q = make_vit_block_fn(H, block_frames=3, interpret=True,
                                gelu="quick")(x, *w)
        np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_exact),
                                   atol=4e-2)

    @pytest.mark.parametrize("layout", LAYOUTS)
    def test_bf16_kernel_matches_quick_fp32(self, layout):
        """Same activation, bf16 vs fp32 evaluation — differences are
        pure precision, bounded by bf16 rounding through the MLP."""
        _, params, x = setup(n=4, dtype=jnp.bfloat16)
        w = flat_weights(params)
        xb = x.astype(jnp.bfloat16)
        y_q = make_vit_block_fn(H, block_frames=2, interpret=True,
                                gelu="quick", layout=layout)(xb, *w)
        y_b = make_vit_block_fn(H, block_frames=2, interpret=True,
                                gelu="bf16", layout=layout)(xb, *w)
        np.testing.assert_allclose(np.asarray(y_b, np.float32),
                                   np.asarray(y_q, np.float32),
                                   rtol=2.5e-2, atol=2.5e-2)

    @pytest.mark.parametrize("layout", LAYOUTS)
    def test_quick_grads_match_real_autodiff(self, layout):
        """Per-parameter gradient parity of the hand-derived quick-GELU
        backward against TRUE autodiff through the flax layer with
        activation="quick_gelu" (custom_vjp overrides autodiff, so
        comparing two kernel invocations would be vacuous — the reference
        here is a separate flax forward)."""
        layer = TransformerEncoderLayer(W, H, ff_dim=FF,
                                        activation="quick_gelu")
        _, params, x = setup(n=4, seed=3)
        cot = jnp.asarray(np.random.default_rng(9).standard_normal(
            (4, T, W)).astype(np.float32))

        def loss_ref(params, x):
            return jnp.sum(layer.apply({"params": params}, x) * cot)

        want_dp, want_dx = jax.grad(loss_ref, argnums=(0, 1))(params, x)
        fn = make_vit_block_fn(H, block_frames=2, interpret=True,
                               gelu="quick", layout=layout)

        def loss_fused(weights, x):
            return jnp.sum(fn(x, *weights) * cot)

        got_dw, got_dx = jax.grad(loss_fused, argnums=(0, 1))(
            flat_weights(params), x)
        rtol = atol = 2e-3
        np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                                   rtol=rtol, atol=atol, err_msg="dx")
        for name, got, want in zip(
                ("g1", "be1", "wqkv", "bqkv", "wo", "bo", "g2", "be2",
                 "w1", "b1", "w2", "b2"),
                got_dw, flat_weights(want_dp)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=rtol, atol=atol, err_msg=name)

    @pytest.mark.parametrize("layout", LAYOUTS)
    def test_bf16_grads_close_to_quick(self, layout):
        """bf16-evaluated variant vs the fp32 quick kernel: same
        activation, differences bounded by bf16 rounding. (The quick
        kernel itself is autodiff-verified above.)"""
        _, params, x = setup(n=4, dtype=jnp.bfloat16)
        w = flat_weights(params)
        xb = x.astype(jnp.bfloat16)

        def loss(fn, weights):
            return jnp.sum(fn(xb, *weights).astype(jnp.float32) ** 2)

        f_ref = make_vit_block_fn(H, block_frames=2, interpret=True,
                                  gelu="quick", layout=layout)
        f_t = make_vit_block_fn(H, block_frames=2, interpret=True,
                                gelu="bf16", layout=layout)
        gr = jax.grad(lambda ws: loss(f_ref, ws))(w)
        gt = jax.grad(lambda ws: loss(f_t, ws))(w)
        for i, (a, b) in enumerate(zip(gr, gt)):
            ref = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) + 1e-6
            err = float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b.astype(jnp.float32))))
            assert err / ref <= 6e-2, f"weight {i}: rel {err / ref}"


class TestAlignedT:
    """T % 8 == 0 routes head_stack/merge through the rank-4 broadcast
    paths (free (F, HT, W) <-> (F, H, T, W) tile remaps when T is a
    sublane-tile multiple); parity must hold against the flax layer."""

    T_ALIGNED = 16

    def _setup(self, n=4, seed=11):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((n, self.T_ALIGNED, W)),
                        jnp.float32)
        layer = TransformerEncoderLayer(W, H, ff_dim=FF, dtype=jnp.float32)
        params = layer.init(jax.random.key(0), x)["params"]
        return layer, params, x

    def test_forward_matches_flax(self):
        layer, params, x = self._setup()
        want = layer.apply({"params": params}, x)
        got = make_vit_block_fn(H, block_frames=2, interpret=True)(
            x, *flat_weights(params))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_grads_match_autodiff(self):
        layer, params, x = self._setup(n=2, seed=13)
        cot = jnp.asarray(np.random.default_rng(4).standard_normal(
            (2, self.T_ALIGNED, W)).astype(np.float32))
        want_dp, want_dx = jax.grad(
            lambda p, xx: jnp.sum(layer.apply({"params": p}, xx) * cot),
            argnums=(0, 1))(params, x)
        fn = make_vit_block_fn(H, block_frames=2, interpret=True)
        got_dw, got_dx = jax.grad(
            lambda w, xx: jnp.sum(fn(xx, *w) * cot), argnums=(0, 1))(
            flat_weights(params), x)
        np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                                   rtol=2e-3, atol=2e-3, err_msg="dx")
        for got, want in zip(got_dw, flat_weights(want_dp)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-3, atol=2e-3)


class TestEncoderFusedBlock:
    def test_proprio_encoder_wiring_parity(self):
        """encoder_fused_block=True keeps the param tree and forward of the
        plain proprioceptive policy (fused blocks are a pure execution
        strategy), and its grads match autodiff end to end."""
        from soccerdiffusion_tpu.config import ModelConfig
        from soccerdiffusion_tpu.models import DiffusionPolicy

        kw = dict(num_joints=6, hidden_dim=64, trajectory_prediction_length=4,
                  action_context_length=16, joint_state_context_length=16,
                  imu_context_length=16, use_images=False, use_gamestate=True,
                  num_action_history_encoder_layers=1, num_imu_encoder_layers=1,
                  joint_state_encoder_layers=1, num_decoder_layers=1,
                  encoder_patch_size=1)
        plain = DiffusionPolicy(ModelConfig(**kw))
        fused = DiffusionPolicy(ModelConfig(
            **kw, encoder_fused_block=True, encoder_fused_block_rows=2))
        rng = np.random.default_rng(0)
        b = 4
        batch = {
            "joint_command_history": jnp.asarray(rng.random((b, 16, 6), np.float32)),
            "rotation": jnp.asarray(rng.random((b, 16, 4), np.float32)),
            "joint_state": jnp.asarray(rng.random((b, 16, 6), np.float32)),
            "game_state": jnp.zeros((b,), jnp.int32),
        }
        noisy = jnp.asarray(rng.random((b, 4, 6), np.float32))
        t = jnp.full((b,), 2, jnp.int32)
        vp = plain.init(jax.random.key(0), batch, noisy, t)
        vf = fused.init(jax.random.key(0), batch, noisy, t)
        assert (jax.tree_util.tree_structure(vp)
                == jax.tree_util.tree_structure(vf))
        out_p = plain.apply(vp, batch, noisy, t)
        out_f = fused.apply(vp, batch, noisy, t)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                                   rtol=2e-4, atol=2e-4)
        gp = jax.grad(lambda p: jnp.mean(jnp.square(
            plain.apply({"params": p}, batch, noisy, t))))(vp["params"])
        gf = jax.grad(lambda p: jnp.mean(jnp.square(
            fused.apply({"params": p}, batch, noisy, t))))(vp["params"])
        for a, b_ in zip(jax.tree_util.tree_leaves(gp),
                         jax.tree_util.tree_leaves(gf)):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=2e-3, atol=2e-3)

    def test_ring_attention_conflict_rejected(self):
        from soccerdiffusion_tpu.config import ModelConfig

        with pytest.raises(ValueError, match="ring"):
            ModelConfig(encoder_fused_block=True, attention_impl="ring")
