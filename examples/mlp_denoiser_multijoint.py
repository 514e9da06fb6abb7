"""Tiny-tier example: unconditional MLP denoiser over whole leg trajectories.

Counterpart of the reference's preliminary MLP archetype
(reference ml/preliminary/train_robot_multi_joint.py, SURVEY.md §2.8): no
transformer, no conditioning — the 12 leg-joint trajectory window is
FLATTENED into one vector, denoised by a two-layer LeakyReLU MLP with a
sinusoidal timestep embedding added in hidden space, and sampled
unconditionally with DDIM. The reference reads joint_commands.csv, windows
70 steps subsampled ::3, normalizes per joint, and squashes with tanh
(train_robot_multi_joint.py:53-96); here the same recipe runs against a
dataset DB's JointCommands rows (dummy-synthesized when no --db is given,
standing in for fetch_data.py) on our diffusion core
(diffusion/schedule.py add_noise + ddim.py).

  JAX_PLATFORMS=cpu python examples/mlp_denoiser_multijoint.py
"""

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax

from soccerdiffusion_tpu.data.schema import connect
from soccerdiffusion_tpu.diffusion import add_noise, ddim_sample, make_schedule

# The reference's 12 leg joints (train_robot_multi_joint.py:57-71), in its
# order; window 70 after ::3 subsampling (:84-90).
LEG_JOINTS = (
    "LHipYaw", "LHipRoll", "LHipPitch", "LKnee", "LAnklePitch", "LAnkleRoll",
    "RHipYaw", "RHipRoll", "RHipPitch", "RKnee", "RAnklePitch", "RAnkleRoll",
)
WINDOW, SUBSAMPLE = 70, 3


class MLPDenoiser(nn.Module):
    """joint_enc -> (+ timestep embedding) -> joint_dec on the flattened
    trajectory (reference train_robot_multi_joint.py:12-27)."""

    hidden: int = 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        flat = x.reshape(b, -1)
        h = nn.leaky_relu(nn.Dense(self.hidden)(flat))
        # sinusoidal timestep embedding (reference :30-41)
        half = self.hidden // 2
        freqs = jnp.exp(-np.log(10000.0) / (half - 1) * jnp.arange(half))
        emb = t[:, None].astype(jnp.float32) * freqs[None, :]
        h = h + jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
        h = nn.leaky_relu(nn.Dense(self.hidden)(h))
        out = nn.Dense(flat.shape[-1])(h)
        return out.reshape(x.shape)


def leg_windows(db: str) -> np.ndarray:
    """(N, WINDOW, 12) tanh-squashed per-joint-normalized windows from the
    DB's JointCommands rows (reference :53-96, CSV -> sqlite)."""
    conn = connect(db, read_only=True)
    cols = ", ".join(f'"{j}"' for j in LEG_JOINTS)
    rows = conn.execute(
        f"SELECT {cols} FROM JointCommands ORDER BY recording_id, stamp"
    ).fetchall()
    conn.close()
    data = np.asarray(rows, dtype=np.float32)[::SUBSAMPLE]
    data = (data - data.mean(0)) / (data.std(0) + 1e-6)
    wins = np.stack([data[i : i + WINDOW] for i in range(len(data) - WINDOW)])
    return np.tanh(wins)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--db", type=str, default=None)
    parser.add_argument("--steps", type=int, default=2000)
    args = parser.parse_args()

    db = args.db
    if db is None:
        from soccerdiffusion_tpu.cli import main as cli

        db = str(Path(tempfile.mkdtemp()) / "mlp_prelim.sqlite3")
        cli(["db", "create-schema", "--db", db])
        cli(["db", "dummy-data", "-n", "2", "-s", "1500", "-i", "50", "--db", db])

    wins = leg_windows(db)
    print(f"{len(wins)} windows of ({WINDOW}, {len(LEG_JOINTS)}) from {db}")

    model = MLPDenoiser()
    sched = make_schedule(1000)  # reference num_train_timesteps (:47-48)
    params = model.init(jax.random.key(0), jnp.zeros((1, WINDOW, 12)),
                        jnp.zeros((1,), jnp.int32))
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (batch.shape[0],), 0, 1000)
        noise = jax.random.normal(kn, batch.shape)
        noisy = add_noise(sched, batch, noise, t)

        def loss_fn(p):
            return jnp.mean((model.apply(p, noisy, t) - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    t0, losses = time.time(), []
    for i in range(args.steps):
        idx = rng.integers(0, len(wins), 64)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(wins[idx]), jax.random.key(i))
        losses.append(float(loss))
        if i % 500 == 0:
            print(f"step {i}: loss {losses[-1]:.4f}")
    print(f"trained {args.steps} steps in {time.time()-t0:.1f}s; "
          f"final {np.mean(losses[-10:]):.4f}")

    # Unconditional DDIM sampling (reference samples 30 steps via the DDIM
    # scheduler); check the generated population's per-joint spread against
    # the data's — the unconditional archetype's fit criterion.
    noise = jax.random.normal(jax.random.key(7), (64, WINDOW, 12))
    traj = np.asarray(ddim_sample(
        sched, lambda x, t: model.apply(params, x, jnp.full((64,), t, jnp.int32)),
        noise, 30, clip_x0=1.0))  # DDIMScheduler default clip_sample=True
    data_std, gen_std = float(wins.std()), float(traj.std())
    print(f"per-element std: data {data_std:.3f} vs sampled {gen_std:.3f}; "
          f"range [{traj.min():.2f}, {traj.max():.2f}]")
    ok = (np.mean(losses[-10:]) < 0.5 * losses[0]
          and np.isfinite(traj).all()
          and 0.3 < gen_std / data_std < 3.0)
    print("MLP MULTI-JOINT PASSED" if ok else "MLP MULTI-JOINT FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
