"""Bisect the Mosaic SIGABRT in the fused encoder kernel.

Compiles minimal variants on the real chip: single encoder, aligned vs
unaligned token counts, gamestate token on/off.

Run: python benchmarks/debug_encoder_compile.py [case ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.inference.controller import (
    init_controller_state,
    make_controller_batch,
)
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.ops.fused_encoder import FusedContextEncoder

CASES = {
    "act100": dict(T=100, gs=False, imu=False, js=False),
    "act96": dict(T=96, gs=False, imu=False, js=False),
    "act100_gs": dict(T=100, gs=True, imu=False, js=False),
    "act96_gs": dict(T=96, gs=True, imu=False, js=False),
    "full100": dict(T=100, gs=False, imu=True, js=True),
    "full96_gs": dict(T=96, gs=True, imu=True, js=True),
}


def run(name):
    c = CASES[name]
    cfg = ModelConfig(
        num_joints=20, hidden_dim=128, trajectory_prediction_length=10,
        action_context_length=c["T"], joint_state_context_length=c["T"],
        imu_context_length=c["T"], use_images=False, use_gamestate=c["gs"],
        use_imu=c["imu"], use_joint_states=c["js"],
        num_action_history_encoder_layers=1, num_imu_encoder_layers=1,
        joint_state_encoder_layers=1, num_decoder_layers=1,
        compute_dtype="bfloat16",
    )
    model = DiffusionPolicy(cfg)
    B = 64
    ctrl = init_controller_state(cfg, B)
    batch = make_controller_batch(cfg, ctrl)
    variables = model.init(jax.random.key(1), batch,
                           jnp.zeros((B, 10, 20)), jnp.zeros((B,), jnp.int32))
    enc = FusedContextEncoder(model, variables["params"], block_robots=8)
    try:
        out = jax.block_until_ready(jax.jit(enc.encode)(batch))
        print(json.dumps({"case": name, "ok": True, "shape": list(out.shape)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": name, "ok": False, "err": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    for name in (sys.argv[1:] or list(CASES)):
        run(name)
