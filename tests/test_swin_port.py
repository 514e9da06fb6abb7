"""Swin checkpoint porting (reference image.py:86-100 wraps torchvision
swin_t/swin_s): synthesized torchvision-layout state dict -> our
SwinImageEncoder params, tree-exact, with the patch-merging concat-order
permutation verified numerically."""

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.models.swin import SwinImageEncoder
from soccerdiffusion_tpu.utils.torch_port import _swin_merge_col_perm, port_swin


def synth_swin_sd(variant="tiny", hidden_dim=32, prefix="", seed=0):
    """Random state dict in torchvision swin layout (head replaced by the
    reference's hidden_dim Linear)."""
    rng = np.random.default_rng(seed)
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05
    depths = (2, 2, 6, 2) if variant == "tiny" else (2, 2, 18, 2)
    heads = (3, 6, 12, 24)
    p = (lambda n: f"{prefix}.{n}") if prefix else (lambda n: n)
    sd = {
        p("features.0.0.weight"): r(96, 3, 4, 4),
        p("features.0.0.bias"): r(96),
        p("features.0.2.weight"): r(96),
        p("features.0.2.bias"): r(96),
    }
    dim = 96
    for stage, depth in enumerate(depths):
        feat = 2 * stage + 1
        for i in range(depth):
            bp = p(f"features.{feat}.{i}")
            sd.update({
                f"{bp}.norm1.weight": r(dim), f"{bp}.norm1.bias": r(dim),
                f"{bp}.attn.qkv.weight": r(3 * dim, dim),
                f"{bp}.attn.qkv.bias": r(3 * dim),
                f"{bp}.attn.proj.weight": r(dim, dim),
                f"{bp}.attn.proj.bias": r(dim),
                f"{bp}.attn.relative_position_bias_table": r(169, heads[stage]),
                f"{bp}.norm2.weight": r(dim), f"{bp}.norm2.bias": r(dim),
                f"{bp}.mlp.0.weight": r(4 * dim, dim),
                f"{bp}.mlp.0.bias": r(4 * dim),
                f"{bp}.mlp.3.weight": r(dim, 4 * dim),
                f"{bp}.mlp.3.bias": r(dim),
            })
        if stage < len(depths) - 1:
            mp = p(f"features.{2 * stage + 2}")
            sd[f"{mp}.norm.weight"] = r(4 * dim)
            sd[f"{mp}.norm.bias"] = r(4 * dim)
            sd[f"{mp}.reduction.weight"] = r(2 * dim, 4 * dim)
            dim *= 2
    sd[p("norm.weight")] = r(dim)
    sd[p("norm.bias")] = r(dim)
    sd[p("head.weight")] = r(hidden_dim, dim)
    sd[p("head.bias")] = r(hidden_dim)
    return sd


class TestSwinPort:
    def test_tree_exact_and_forward(self):
        sd = synth_swin_sd()
        ported = port_swin(sd, "tiny")
        model = SwinImageEncoder(hidden_dim=32, variant="tiny")
        x = jnp.asarray(np.random.default_rng(1).random((1, 224, 224, 3), np.float32))
        ref = model.init(jax.random.key(0), x)["params"]
        got_tree = jax.tree_util.tree_structure(
            jax.tree.map(lambda a: a.shape, ported))
        want_tree = jax.tree_util.tree_structure(
            jax.tree.map(lambda a: a.shape, ref))
        assert got_tree == want_tree
        shapes_equal = jax.tree.map(
            lambda a, b: np.shape(a) == np.shape(b), ported, ref)
        assert all(jax.tree_util.tree_leaves(shapes_equal))
        out = model.apply({"params": jax.tree.map(jnp.asarray, ported)}, x)
        assert out.shape == (1, 32)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_prefixed_keys(self):
        sd = synth_swin_sd(prefix="image_sequence_encoder.image_encoder.encoder")
        ported = port_swin(sd, "tiny",
                           prefix="image_sequence_encoder.image_encoder.encoder")
        assert "stage2_block5" in ported

    def test_merge_permutation_numerically(self):
        """torchvision cats merge patches [x00, x10, x01, x11]; ours
        reshapes to [x00, x01, x10, x11]. The ported norm/reduction params
        must make both pipelines produce the SAME output."""
        c = 8
        rng = np.random.default_rng(3)
        x = {k: rng.standard_normal(c).astype(np.float32)
             for k in ("00", "01", "10", "11")}
        tv_cat = np.concatenate([x["00"], x["10"], x["01"], x["11"]])
        our_cat = np.concatenate([x["00"], x["01"], x["10"], x["11"]])
        g = rng.standard_normal(4 * c).astype(np.float32)
        b = rng.standard_normal(4 * c).astype(np.float32)
        w = rng.standard_normal((2 * c, 4 * c)).astype(np.float32)

        def ln(v, scale, bias):
            mu, var = v.mean(), v.var()
            return (v - mu) / np.sqrt(var + 1e-5) * scale + bias

        tv_out = ln(tv_cat, g, b) @ w.T
        perm = _swin_merge_col_perm(c)
        our_out = ln(our_cat, g[perm], b[perm]) @ (w.T[perm])
        np.testing.assert_allclose(our_out, tv_out, rtol=1e-5, atol=1e-5)
