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


#: the reserved mesh-axis name for the slow cross-slice (DCN) dimension
DCN_AXIS = "dcn"


def make_mesh(shape: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a Mesh. ``shape`` maps axis name -> size; {} or None means all
    devices on a single "data" axis.

    A ``"dcn"`` key requests a DCN-aware two-level mesh (see
    ``make_hybrid_mesh``): that axis is placed OUTERMOST and grouped by
    slice, so every other axis's collectives ride ICI within a slice and
    only the dcn axis crosses the data-center network.
    """
    devices = devices if devices is not None else jax.devices()
    if not shape:
        shape = {"data": len(devices)}
    if DCN_AXIS in shape:
        ici = {k: v for k, v in shape.items() if k != DCN_AXIS}
        return make_hybrid_mesh(ici_shape=ici or None,
                                num_slices=shape[DCN_AXIS], devices=devices)
    sizes = list(shape.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev_array, tuple(shape.keys()))


def _slice_id(device) -> int:
    """Best-available slice identity: TPU slice_index when the runtime
    exposes it (multi-slice), else the owning process (multi-host = one
    slice per host), else 0."""
    sid = getattr(device, "slice_index", None)
    if sid is not None:
        return int(sid)
    return int(getattr(device, "process_index", 0))


def make_hybrid_mesh(
    ici_shape: dict[str, int] | None = None,
    num_slices: int | None = None,
    devices=None,
) -> Mesh:
    """DCN-aware two-level mesh: ("dcn", *ici axes), dcn outermost.

    Devices are grouped by slice (``slice_index`` when the TPU runtime
    reports it, process index otherwise; contiguous equal blocks as the
    simulation fallback when neither distinguishes, e.g. the 8-device CPU
    test mesh). The dcn axis varies slowest, so any collective over an ICI
    axis ("data", "model", "seq") stays within one slice's ICI fabric and
    ONLY dcn-axis collectives (the data-parallel gradient sum's second
    stage) cross DCN — the standard slow-outer/fast-inner hybrid layout
    (SURVEY.md §5.8; scaling-book recipe).

    Use with ``MeshRules(dcn=True)``: the batch shards over (dcn, data),
    so XLA lowers the gradient reduction to an in-slice reduce-scatter/
    all-reduce plus a small cross-slice sum, never a model-axis transfer
    over DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    groups: dict[int, list] = {}
    for d in devices:
        groups.setdefault(_slice_id(d), []).append(d)
    if len(groups) == 1 and num_slices and num_slices > 1:
        # single-process simulation (CPU mesh): contiguous equal blocks
        if len(devices) % num_slices:
            raise ValueError(
                f"{len(devices)} devices do not split into {num_slices} "
                "equal slices")
        per = len(devices) // num_slices
        groups = {i: devices[i * per : (i + 1) * per] for i in range(num_slices)}
    ns = num_slices or len(groups)
    if ns != len(groups):
        raise ValueError(f"requested {ns} slices, topology has {len(groups)}")
    sizes = {len(g) for g in groups.values()}
    if len(sizes) != 1:
        raise ValueError(f"uneven slices: {sorted(sizes)}")
    per_slice = sizes.pop()
    ici_shape = dict(ici_shape or {"data": per_slice})
    need = int(np.prod(list(ici_shape.values())))
    if need != per_slice:
        raise ValueError(
            f"ici_shape {ici_shape} needs {need} devices/slice, have {per_slice}")
    dev_array = np.asarray(
        [groups[k] for k in sorted(groups)]
    ).reshape([ns] + list(ici_shape.values()))
    return Mesh(dev_array, (DCN_AXIS,) + tuple(ici_shape.keys()))


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
    # two-level (DCN x ICI) mesh: batch additionally sharded over the
    # outer "dcn" axis — data parallelism spans slices, while any model
    # axis stays inside one slice's ICI by construction (dcn outermost)
    dcn: bool = False

    def __post_init__(self):
        if self.model_axis == DCN_AXIS:
            raise ValueError(
                "model parallelism over the DCN axis is never profitable — "
                "use an ICI axis for model_axis and dcn=True for cross-slice "
                "data parallelism")

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
        if self.dcn:
            return P((DCN_AXIS, self.data_axis))
        return P(self.data_axis)


def rules_for_mesh(mesh: Mesh) -> MeshRules:
    """Default rules derived from a mesh's axis names: "data" (or the last
    axis) carries the batch, "model" (if present) tensor-parallelism, and a
    "dcn" axis extends data parallelism across slices."""
    names = tuple(mesh.axis_names)
    # batch-axis candidates: ICI axes that are not the TP axis
    candidates = [n for n in names if n not in (DCN_AXIS, "model")]
    if "data" in candidates:
        data_axis = "data"
    elif candidates:
        data_axis = candidates[-1]
    elif DCN_AXIS in names:
        # pure cross-slice DP mesh ("dcn" only, or dcn x model): the dcn
        # axis itself carries the batch (dcn=False avoids a duplicate
        # axis in batch_spec)
        return MeshRules(data_axis=DCN_AXIS,
                         model_axis="model" if "model" in names else None,
                         dcn=False)
    else:
        raise ValueError(
            f"mesh axes {names} leave no axis to shard the batch over")
    return MeshRules(
        data_axis=data_axis,
        model_axis="model" if "model" in names else None,
        dcn=DCN_AXIS in names,
    )


def param_shardings(mesh: Mesh, params, rules: MeshRules | None = None):
    """NamedSharding pytree for a parameter pytree."""
    rules = rules or rules_for_mesh(mesh)

    def spec_for(path, value):
        names = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return NamedSharding(mesh, rules.param_spec(names, value))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_batch(mesh: Mesh, batch, rules: MeshRules | None = None):
    """Device-put a host batch dict with the leading dim sharded over data
    (and, on a two-level mesh, over dcn x data — rules_for_mesh)."""
    rules = rules or rules_for_mesh(mesh)
    spec = rules.batch_spec()

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)
