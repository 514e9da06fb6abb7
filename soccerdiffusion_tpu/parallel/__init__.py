"""SPMD parallelism: device meshes, sharding rules, distributed init.

The reference is strictly single-device (SURVEY.md §2.10: no DDP/NCCL
anywhere); this subsystem is a new first-class component. Scaling is
expressed the XLA way: pick a mesh, annotate shardings on params and data,
and let the compiler insert psum/all-gather collectives over ICI — there is
no NCCL-style explicit communication API to port.
"""

from soccerdiffusion_tpu.parallel.mesh import (
    DCN_AXIS,
    MeshRules,
    make_hybrid_mesh,
    make_mesh,
    param_shardings,
    rules_for_mesh,
    shard_batch,
)
from soccerdiffusion_tpu.parallel.ring_attention import (
    auto_ring_attention,
    head_sharded_attention,
    ring_attention,
    ring_attention_sharded,
    ring_self_attention,
)

__all__ = ["make_mesh", "make_hybrid_mesh", "rules_for_mesh", "DCN_AXIS",
           "MeshRules", "shard_batch", "param_shardings",
           "ring_attention", "ring_attention_sharded", "auto_ring_attention",
           "ring_self_attention", "head_sharded_attention"]
