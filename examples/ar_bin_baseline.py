"""Tiny-tier example: autoregressive discretized-bin gait baseline.

Counterpart of the reference's preliminary AR baseline
(reference ml/preliminary/train_robot_dis.py:15-47 — per-timestep tokens
are the concatenation of one-hot joint-angle bins, a causal transformer
predicts every joint's NEXT-step bin with cross-entropy, and sampling is
greedy top-1 from a zero start token; causal mask :43-47). SURVEY.md §2.8
places this lineage in the example zoo: it is the discrete/AR foil to the
diffusion policy (examples/sine_diffusion_toy.py) on the same kind of
synthetic gait data.

TPU-first differences from the reference (behavior, not a translation):

* the one-hot @ embedding matrix is a per-joint table GATHER (same math,
  no (J*num_bins)-wide one-hot materialization);
* training is ONE jitted step (loss + AdamW update fused by XLA);
* AR decoding is a ``lax.scan`` over a static-length token buffer —
  static shapes, no Python-loop re-tracing, one compiled program.

Runs on CPU in well under a minute:

  JAX_PLATFORMS=cpu python examples/ar_bin_baseline.py
"""

import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax

SEQ, JOINTS, BINS = 48, 4, 32
HIDDEN, HEADS, LAYERS = 64, 4, 2  # reference: hidden 128, 1 layer, 4 heads


def gait_bins(rng: np.random.Generator, batch: int) -> np.ndarray:
    """Synthetic multi-frequency gait, tanh-squashed to (-1, 1) and
    discretized to BINS bins — the reference's CSV pipeline shape
    (train_robot_dis.py:92-120) on procedural data. (B, SEQ, JOINTS) int32."""
    freqs = rng.uniform(0.5, 1.5, (batch, JOINTS))
    phases = rng.uniform(0, 2 * np.pi, (batch, JOINTS))
    amps = rng.uniform(0.6, 1.4, (batch, JOINTS))
    t = np.arange(SEQ) * 0.15
    waves = amps[:, None, :] * np.sin(
        freqs[:, None, :] * t[None, :, None] + phases[:, None, :])
    scaled = (np.tanh(waves) + 1.0) / 2.0  # [0, 1]
    return np.minimum((scaled * BINS).astype(np.int32), BINS - 1)


class CausalBinTransformer(nn.Module):
    """Causal transformer over per-timestep joint-bin tokens.

    Reference layer semantics (train_robot_dis.py:15-47): linear embed of
    the joint×bin token, fixed sin/cos posenc, pre-softmax causal mask,
    per-joint bin logits. The unused zero-memory cross-attention of the
    torch TransformerDecoder is dropped (it is a constant)."""

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        B, L, J = tokens.shape
        emb = self.param("embed", nn.initializers.normal(0.02),
                         (J, BINS, HIDDEN))
        x = jnp.take_along_axis(
            emb[None, None], tokens[..., None, None], axis=3
        ).squeeze(3).sum(axis=2)  # (B, L, HIDDEN): sum of per-joint rows
        pos = np.zeros((SEQ, HIDDEN), np.float32)
        div = np.exp(np.arange(0, HIDDEN, 2) * (-np.log(10000.0) / HIDDEN))
        pos[:, 0::2] = np.sin(np.arange(SEQ)[:, None] * div)
        pos[:, 1::2] = np.cos(np.arange(SEQ)[:, None] * div)
        x = x + jnp.asarray(pos)[None, :L]
        mask = nn.make_causal_mask(tokens[..., 0])  # (B, 1, L, L)
        for _ in range(LAYERS):
            a = nn.MultiHeadDotProductAttention(
                num_heads=HEADS, qkv_features=HIDDEN)(x, x, mask=mask)
            x = nn.LayerNorm()(x + a)
            h = nn.Dense(HIDDEN)(nn.gelu(nn.Dense(HIDDEN)(x)))
            x = nn.LayerNorm()(x + h)
        return nn.Dense(J * BINS)(x).reshape(B, L, J, BINS)


def main() -> int:
    rng = np.random.default_rng(0)
    model = CausalBinTransformer()
    params = model.init(jax.random.key(0), jnp.zeros((1, SEQ, JOINTS), jnp.int32))
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, tokens):
        # zero start token, shift-right input; next-step CE on all positions
        inp = jnp.pad(tokens[:, :-1], ((0, 0), (1, 0), (0, 0)))

        def loss_fn(p):
            logits = model.apply(p, inp)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, BINS), tokens.reshape(-1))
            return ce.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    losses = []
    for i in range(800):
        batch = jnp.asarray(gait_bins(rng, 32))
        params, opt_state, loss = train_step(params, opt_state, batch)
        losses.append(float(loss))
        if i % 200 == 0:
            print(f"step {i}: ce {losses[-1]:.3f}")
    final_ce = float(np.mean(losses[-10:]))
    print(f"trained 800 steps in {time.time()-t0:.1f}s; final ce {final_ce:.3f} "
          f"(uniform baseline {np.log(BINS):.3f})")

    # Held-out next-step accuracy (teacher-forced), then greedy AR rollout
    # from a 12-step prompt — the reference's sample_trajectory(:185-225)
    # as one lax.scan.
    test = jnp.asarray(gait_bins(rng, 64))
    inp = jnp.pad(test[:, :-1], ((0, 0), (1, 0), (0, 0)))
    logits = jax.jit(model.apply)(params, inp)
    acc = float((logits.argmax(-1) == test).mean())
    print(f"held-out next-step bin accuracy: {acc:.3f} (chance {1 / BINS:.3f})")

    prompt_len = 12

    @jax.jit
    def ar_rollout(params, prompt):
        buf = jnp.pad(prompt, ((0, 0), (0, SEQ - prompt_len), (0, 0)))

        def step(buf, i):
            inp = jnp.pad(buf[:, :-1], ((0, 0), (1, 0), (0, 0)))
            logits = model.apply(params, inp)  # (B, SEQ, J, BINS)
            nxt = jnp.take_along_axis(
                logits.argmax(-1).astype(jnp.int32),
                jnp.full((buf.shape[0], 1, JOINTS), i, jnp.int32), axis=1)
            return jax.lax.dynamic_update_slice_in_dim(buf, nxt, i, axis=1), None

        buf, _ = jax.lax.scan(step, buf, jnp.arange(prompt_len, SEQ))
        return buf

    rolled = ar_rollout(params, test[:, :prompt_len])
    # Greedy AR continuations compound errors, so gate on the horizon the
    # policy actually serves (the production chunk is 10 ticks): mean
    # |bin error| over the 10 steps after the prompt, vs ~BINS/3 for
    # uniform noise. The full-horizon drift is reported for the record.
    horizon = 10
    near = float(jnp.abs(
        rolled[:, prompt_len:prompt_len + horizon]
        - test[:, prompt_len:prompt_len + horizon]).mean())
    far = float(jnp.abs(
        rolled[:, prompt_len:] - test[:, prompt_len:]).mean())
    print(f"AR continuation mean |bin error|: {near:.2f} over {horizon} steps"
          f" / {far:.2f} over {SEQ - prompt_len}"
          f" (uniform-noise baseline ~{BINS / 3:.1f})")

    ok = final_ce < 1.2 and acc > 0.35 and near < 4.0
    print("AR BIN BASELINE PASSED" if ok else "AR BIN BASELINE FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
