"""Ring attention over the 8-device CPU mesh vs single-device attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soccerdiffusion_tpu.models.attention import xla_attention
from soccerdiffusion_tpu.parallel.mesh import make_mesh
from soccerdiffusion_tpu.parallel.ring_attention import (
    ring_attention,
    ring_attention_sharded,
)


def _qkv(b=2, s=64, h=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    return mk(), mk(), mk()


class TestRingAttention:
    def test_matches_single_device_attention(self):
        q, k, v = _qkv()
        mesh = make_mesh({"seq": 8})
        got = ring_attention(q, k, v, mesh, axis="seq")
        want = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_jit_sharded_end_to_end(self):
        """jitted shard_map path with sharded inputs stays sharded."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        q, k, v = _qkv(s=128, seed=1)
        mesh = make_mesh({"seq": 8})
        spec = P(None, "seq", None, None)
        sharding = NamedSharding(mesh, spec)
        qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))

        fn = jax.jit(jax.shard_map(
            lambda a, b, c: ring_attention_sharded(a, b, c, axis_name="seq"),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec))
        got = fn(qs, ks, vs)
        assert got.sharding.spec == spec
        want = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_uneven_shard_rejected(self):
        q, k, v = _qkv(s=60)
        mesh = make_mesh({"seq": 8})
        with pytest.raises(Exception):
            ring_attention(q, k, v, mesh, axis="seq")

    @pytest.mark.parametrize("s", [8, 256])
    def test_extreme_shard_sizes(self, s):
        q, k, v = _qkv(s=s, seed=2)
        mesh = make_mesh({"seq": 8})
        got = ring_attention(q, k, v, mesh, axis="seq")
        want = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
