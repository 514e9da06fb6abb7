"""Mesh construction and sharding rules.

Default topology: 1-D "data" mesh over all local devices — pure data
parallelism, which is the right regime for this model family (<=~50M params;
gradients psum over ICI). A second "model" axis is supported for the larger
configs: Dense kernels are column/row-sharded megatron-style so the MLP and
attention matmuls split across the axis, with XLA inserting the reduce
collectives (GSPMD propagation from the parameter shardings; no model-code
changes needed).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a Mesh. ``shape`` maps axis name -> size; {} or None means all
    devices on a single "data" axis."""
    devices = devices if devices is not None else jax.devices()
    if not shape:
        shape = {"data": len(devices)}
    sizes = list(shape.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev_array, tuple(shape.keys()))


# Megatron-style tensor-parallel patterns for the transformer stacks:
# column-parallel into the axis (qkv projections, MLP in), row-parallel out
# of it (attention out_proj, MLP out). Embeddings/norms replicated.
_TP_COLUMN = re.compile(r"(q_proj|k_proj|v_proj|linear1)$")
_TP_ROW = re.compile(r"(out_proj|linear2)$")


@dataclass(frozen=True)
class MeshRules:
    """How params/batch map onto mesh axes."""

    data_axis: str = "data"
    model_axis: str | None = None  # None = pure DP (params replicated)

    def param_spec(self, path: tuple[str, ...], value) -> P:
        if self.model_axis is None:
            return P()
        parent = path[-2] if len(path) >= 2 else ""
        leaf = path[-1]
        if leaf == "kernel" and value.ndim == 2:
            if _TP_COLUMN.search(parent):
                return P(None, self.model_axis)
            if _TP_ROW.search(parent):
                return P(self.model_axis, None)
        if leaf == "bias" and _TP_COLUMN.search(parent):
            return P(self.model_axis)
        return P()

    def batch_spec(self) -> P:
        return P(self.data_axis)


def param_shardings(mesh: Mesh, params, rules: MeshRules | None = None):
    """NamedSharding pytree for a parameter pytree."""
    rules = rules or MeshRules()

    def spec_for(path, value):
        names = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return NamedSharding(mesh, rules.param_spec(names, value))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_batch(mesh: Mesh, batch, rules: MeshRules | None = None):
    """Device-put a host batch dict with the leading dim sharded over data."""
    rules = rules or MeshRules()
    spec = rules.batch_spec()

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)
