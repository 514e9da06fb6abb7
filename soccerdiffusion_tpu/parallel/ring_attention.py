"""Ring attention: exact attention over a sequence-sharded device mesh.

Long-context stretch goal (SURVEY.md §5.7): when the context is too long
for one chip's VMEM/HBM, shard the sequence over a mesh axis and compute
exact attention by rotating K/V shards around the ring with
``lax.ppermute`` while accumulating a streaming (online-softmax) partial
result — the distributed analogue of the flash-attention recursion in
``ops/flash_attention.py``. Communication rides the ICI neighbor links
(ppermute), overlapping with each step's local block computation under
XLA's async collectives.

The reference has no distributed attention at all (single CUDA GPU,
SURVEY.md §2.10); this is TPU-native capability beyond parity. Layouts
match ``models/attention.py``: q/k/v are (B, S, H, D) with the sequence
axis sharded.

No causal masking — the policy attends bidirectionally over context
tokens (reference ml/model/decoder.py:36-54), so every (query, key) block
pair is computed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attention(q, k, v, scale):
    """Unnormalized block attention: returns (acc, m, l) for the streaming
    softmax: acc = sum exp(s - m) v, m = rowmax, l = sum exp(s - m)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1)  # (B, H, Q)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)  # (B, H, Q)
    acc = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return acc, m, l


def ring_attention_sharded(q, k, v, axis_name: str):
    """Per-shard ring attention body; call inside ``shard_map`` with the
    sequence dimension of q/k/v sharded over ``axis_name``.

    Each of the ``n`` devices starts with its own K/V shard and passes it
    to the next device around the ring each step; after n steps every
    query shard has attended every key shard exactly once. The partial
    results merge with the standard streaming-softmax rescale (same
    recursion as ops/flash_attention.py's q-block loop).
    """
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    perm = [(i, (i + 1) % n) for i in range(n)]

    acc0, m0, l0 = _block_attention(q, k, v, scale)

    def step(carry, _):
        k_cur, v_cur, acc, m, l = carry
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        acc_b, m_b, l_b = _block_attention(q, k_nxt, v_nxt, scale)
        m_new = jnp.maximum(m, m_b)
        c_old = jnp.exp(m - m_new)  # (B, H, Q)
        c_new = jnp.exp(m_b - m_new)
        # acc is (B, Q, H, D); scaling factors are (B, H, Q)
        scale_old = jnp.transpose(c_old, (0, 2, 1))[..., None]
        scale_new = jnp.transpose(c_new, (0, 2, 1))[..., None]
        acc = acc * scale_old + acc_b * scale_new
        l = l * c_old + l_b * c_new
        return (k_nxt, v_nxt, acc, m_new, l), None

    (_, _, acc, m, l), _ = lax.scan(step, (k, v, acc0, m0, l0), None,
                                    length=n - 1)
    out = acc / jnp.transpose(l, (0, 2, 1))[..., None]
    return out.astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, axis: str = "data"):
    """Exact attention with the SEQUENCE dimension sharded over ``axis``.

    q/k/v: (B, S, H, D) global arrays (S divisible by the axis size).
    Returns (B, S, H, D), numerically equal (to streaming-softmax
    tolerance) to ``models.attention.xla_attention`` on one device.
    """
    spec = P(None, axis, None, None)
    shard = partial(ring_attention_sharded, axis_name=axis)
    fn = jax.shard_map(shard, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec)
    sharding = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
    return fn(q, k, v)


# --------------------------------------------------------------------------
# Model wiring: ``attention_impl: "ring"`` (models/attention.py) routes every
# MultiHeadAttention through ``auto_ring_attention`` below, which reads the
# ambient device mesh and picks the exact sharded form each call shape
# admits. This makes sequence parallelism a CONFIG property of the model
# rather than a standalone demo function.
# --------------------------------------------------------------------------

RING_AXIS = "seq"  # mesh axis the ring rotates over (parallel/mesh.py)
BATCH_AXIS = "data"  # dp axis, kept sharded through the shard_map boundary


def ambient_mesh() -> Mesh | None:
    """The mesh in scope at trace time: the legacy ``with mesh:`` context
    (used throughout training/serving here), else None."""
    from jax._src import mesh as mesh_lib

    pm = mesh_lib.thread_resources.env.physical_mesh
    return None if pm.empty else pm


def _batch_spec(mesh: Mesh):
    return BATCH_AXIS if BATCH_AXIS in mesh.axis_names else None


def ring_self_attention(q, k, v, mesh: Mesh, axis: str = RING_AXIS):
    """Self-attention with the sequence dim of q/k/v sharded over ``axis``
    (true ring: K/V shards rotate via ppermute). Requires S % axis_size == 0."""
    spec = P(_batch_spec(mesh), axis, None, None)
    fn = jax.shard_map(partial(ring_attention_sharded, axis_name=axis),
                       mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def head_sharded_attention(q, k, v, mesh: Mesh, axis: str = RING_AXIS):
    """Exact attention with the HEAD dim sharded over ``axis`` (the
    Ulysses-style form): each device holds full sequences for its head
    subset, so arbitrary q/kv lengths work — the form the denoiser's
    cross-attention (10 query rows vs a long context) admits when the ring
    form does not. XLA inserts the boundary all-to-alls over ICI."""
    from soccerdiffusion_tpu.models.attention import xla_attention

    spec = P(_batch_spec(mesh), None, axis, None)
    fn = jax.shard_map(xla_attention, mesh=mesh,
                       in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def auto_ring_attention(q, k, v):
    """Backend for ``attention_impl: "ring"``: shape-aware sequence
    parallelism over the ambient mesh's ``seq`` axis.

      * no mesh in scope, or no ``seq`` axis -> plain XLA attention
      * self-attention with S divisible by the axis -> ring attention
      * otherwise, heads divisible by the axis -> head-sharded attention
      * else -> plain XLA attention (shapes admit no exact sharding)
    """
    from soccerdiffusion_tpu.models.attention import xla_attention

    mesh = ambient_mesh()
    if mesh is None or RING_AXIS not in mesh.axis_names:
        return xla_attention(q, k, v)
    n = mesh.shape[RING_AXIS]
    if n == 1:
        return xla_attention(q, k, v)
    s_q, s_k, heads = q.shape[1], k.shape[1], q.shape[2]
    if s_q == s_k and s_q % n == 0:
        return ring_self_attention(q, k, v, mesh)
    if heads % n == 0:
        return head_sharded_attention(q, k, v, mesh)
    return xla_attention(q, k, v)
