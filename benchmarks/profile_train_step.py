"""Per-fusion device-time attribution of the flagship train step.

jax.profiler tracing works through the axon tunnel (the trace.json.gz
carries real /device:TPU XLA-op spans), so instead of inferring from
ablation deltas, aggregate actual device time per fusion over a few steps.

  PROF_VARIANT=depth0|fused|plain python benchmarks/profile_train_step.py

Prints one JSON line per top op (device µs summed over TRACE_STEPS steps)
plus a total. Used to attribute the ~38 ms non-ViT remainder of the step
(docs/perf_notes.md round 3).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import yaml

from soccerdiffusion_tpu.config import Config
from soccerdiffusion_tpu.data import Normalizer
from soccerdiffusion_tpu.diffusion import make_schedule
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.training.trainer import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from benchmarks.train_mfu import device_batch
from soccerdiffusion_tpu.data.pipeline import prepare_batch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRACE_STEPS = 3


def aggregate_device_ops(trace: dict) -> tuple[dict, float]:
    """Sum per-op device time from a Chrome-trace dict.

    Device events live on pids whose process_name metadata contains
    "/device:" under the "XLA Ops" thread. Returns ({op_name: total_us},
    total_us). Unit-tested in tests/test_profiling.py."""
    ev = trace["traceEvents"]
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "/device:" in str(e.get("args", {}).get("name", ""))}
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in dev_pids
               and e.get("args", {}).get("name") == "XLA Ops"}
    agg = defaultdict(float)
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            agg[e["name"]] += e.get("dur", 0.0)
            total += e.get("dur", 0.0)
    return dict(agg), total


def main():
    variant = os.environ.get("PROF_VARIANT", "depth0")
    overrides = {
        "depth0": {"vit_depth": 0, "vit_fused_block": False},
        "plain": {"vit_fused_block": False},
        "fused": {},
    }[variant]
    # PROF_CONFIG selects any shipped YAML (default: the flagship);
    # PROF_BATCH the batch; PROF_OVERRIDES a JSON dict of config knobs —
    # e.g. PROF_CONFIG=default_tpu PROF_BATCH=128 PROF_VARIANT=fused for
    # the ResNet reference-parity step attribution (round-5 item 5).
    cfg_name = os.environ.get("PROF_CONFIG", "vit_flagship")
    with open(os.path.join(REPO, "soccerdiffusion_tpu", "training", "configs",
                           cfg_name + ".yaml")) as f:
        params = yaml.safe_load(f)
    if cfg_name == "vit_flagship":
        params.update(overrides)
    extra = os.environ.get("PROF_OVERRIDES")
    if extra:
        params.update(json.loads(extra))
    config = Config.from_dict(params)
    cfg = config.model
    model = DiffusionPolicy(cfg)
    schedule = make_schedule(config.train.train_denoising_timesteps)
    batch = device_batch(cfg, int(os.environ.get("PROF_BATCH", "256")),
                         np.random.default_rng(0))
    optimizer = make_optimizer(config.train.lr, 1000)
    state = create_train_state(model, prepare_batch(batch), optimizer,
                               jax.random.key(0),
                               cfg.trajectory_prediction_length, cfg.num_joints)
    step = make_train_step(model, schedule, optimizer,
                           Normalizer.identity(cfg.num_joints))
    state, m = step(state, batch, 0)
    jax.block_until_ready(m["loss"])

    trace_dir = f"/tmp/prof_{cfg_name}_{variant}"
    jax.profiler.start_trace(trace_dir)
    for i in range(1, 1 + TRACE_STEPS):
        state, m = step(state, batch, i)
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()

    runs = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*")))
    path = glob.glob(os.path.join(runs[-1], "*.trace.json.gz"))[0]
    with gzip.open(path) as f:
        data = json.load(f)
    agg, total = aggregate_device_ops(data)
    per_step = {k: v / TRACE_STEPS for k, v in agg.items()}
    print(json.dumps({"config": cfg_name, "variant": variant,
                      "steps": TRACE_STEPS,
                      "total_device_us_per_step": round(total / TRACE_STEPS, 1)}))
    for name, us in sorted(per_step.items(), key=lambda kv: -kv[1])[:40]:
        print(json.dumps({"op": name[:100], "us_per_step": round(us, 1)}))


if __name__ == "__main__":
    main()
