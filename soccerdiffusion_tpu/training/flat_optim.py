"""Flat-buffer optimizer wrapper: run optax on ONE raveled vector.

Why: the flagship train step's depth-0 ablation (docs/perf_notes.md round 3)
shows ~3 ms of flat per-tensor overhead that scales with the number of
parameter LEAVES, not bytes — AdamW's ~8 elementwise ops times ~150 param
tensors is ~1000 tiny HBM-bound fusions per step. AdamW is purely
elementwise, so running it on the raveled parameter vector computes the
IDENTICAL update (bitwise: no cross-element reassociation exists) in ~8
large fusions plus one gather/scatter pair that XLA fuses into the
surrounding step.

Semantics: the wrapped transformation must be elementwise per parameter
(optax.adamw with scalar/schedule LR qualifies — torch AdamW semantics,
reference ml/training/train.py:162-174; anything with per-leaf structure,
e.g. multi-transform masks, must not be wrapped).

Used via ``flat_optimizer: true`` (TrainConfig) — training/trainer.py
``make_optimizer(..., flat=True)``.
"""

from __future__ import annotations

import optax
from jax.flatten_util import ravel_pytree


def flat_wrap(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Wrap an elementwise GradientTransformation to operate on the raveled
    parameter vector. State becomes the inner state over one flat vector
    (two big mu/nu buffers for AdamW instead of two per param tensor)."""

    def init(params):
        flat, _ = ravel_pytree(params)
        return inner.init(flat)

    def update(updates, state, params=None):
        flat_g, unravel = ravel_pytree(updates)
        if params is not None:
            flat_p, _ = ravel_pytree(params)
        else:
            flat_p = None
        flat_u, new_state = inner.update(flat_g, state, flat_p)
        return unravel(flat_u), new_state

    return optax.GradientTransformation(init, update)
