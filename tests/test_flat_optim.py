"""flat_wrap(adamw) computes the identical update to per-leaf adamw —
AdamW is purely elementwise, so raveling cannot change any value."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from soccerdiffusion_tpu.training.flat_optim import flat_wrap
from soccerdiffusion_tpu.training.trainer import make_optimizer


def tree(seed, scale=1.0):
    r = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(scale * r.standard_normal(s).astype(np.float32))
    return {
        "encoder": {"w": mk(7, 5), "b": mk(5)},
        "decoder": {"layer_0": {"k": mk(5, 5), "s": mk(1)}, "out": mk(5, 3)},
    }


def test_flat_adamw_matches_per_leaf():
    params = tree(0)
    inner = optax.adamw(1e-3, weight_decay=1e-2)
    plain_state = inner.init(params)
    flat = flat_wrap(inner)
    flat_state = flat.init(params)
    p_plain, p_flat = params, params
    for step in range(5):
        grads = tree(10 + step, scale=0.1)
        u1, plain_state = inner.update(grads, plain_state, p_plain)
        p_plain = optax.apply_updates(p_plain, u1)
        u2, flat_state = flat.update(grads, flat_state, p_flat)
        p_flat = optax.apply_updates(p_flat, u2)
        for a, b in zip(jax.tree.leaves(p_plain), jax.tree.leaves(p_flat)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_make_optimizer_flat_knob_matches():
    params = tree(1)
    plain = make_optimizer(1e-3, total_steps=50)
    flat = make_optimizer(1e-3, total_steps=50, flat=True)
    s1, s2 = plain.init(params), flat.init(params)
    p1 = p2 = params
    for step in range(4):
        grads = tree(20 + step, scale=0.1)
        u1, s1 = plain.update(grads, s1, p1)
        p1 = optax.apply_updates(p1, u1)
        u2, s2 = flat.update(grads, s2, p2)
        p2 = optax.apply_updates(p2, u2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the flat state is two big buffers, not a tree of per-leaf moments
    mu = jax.tree.leaves(s2)
    assert any(m.ndim == 1 and m.size == sum(
        l.size for l in jax.tree.leaves(params)) for m in mu)
