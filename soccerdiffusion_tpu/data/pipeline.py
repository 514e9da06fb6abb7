"""Host -> device input pipeline.

Replaces the reference's 32 DataLoader worker processes
(reference train.py:94-104) with a thread-pooled batch assembler and a
double-buffered device prefetcher: while the TPU runs step N, the next batch
is already being assembled and transferred, so the feed never blocks the
device. Batches land directly with a data-axis NamedSharding.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax

from soccerdiffusion_tpu.parallel.mesh import MeshRules, shard_batch


def prefetch_to_device(
    batch_iter: Iterator,
    mesh=None,
    rules: MeshRules | None = None,
    buffer_size: int = 2,
) -> Iterator:
    """Wrap a host batch iterator with async device transfer.

    If ``mesh`` is None batches are device_put to the default device;
    otherwise they are sharded over the mesh's data axis.
    """
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    _SENTINEL = object()

    def put(batch):
        if mesh is not None:
            return shard_batch(mesh, batch, rules)
        return jax.device_put(batch)

    def producer():
        try:
            for batch in batch_iter:
                q.put(put(batch))
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item


class DeviceResidentData:
    """Upload a whole (small) dataset to the device ONCE; gather batches
    on-device by index, so per-step host->device traffic is a handful of
    int32 indices instead of the full batch.

    Two reasons to use it:

    * It is the TPU-idiomatic shape for datasets that fit in HBM (the
      dummy tiers easily do) — no per-step transfer at all.
    * The tunneled runtime used here RETAINS a host-side mirror of every
      uploaded buffer for the life of the process (measured: ~35 MB/step
      for a 64x5x96px float image batch, neither GC nor Array.delete()
      reclaims it — a 5000-step camera run OOMs a 128 GB host;
      docs/perf_notes.md "Tunnel-client upload retention"). With the
      dataset resident, long runs are flat-RSS.

    Exposes ``batches(batch_size, shuffle, seed, drop_remainder)`` with
    the same epoch/order semantics as ``WindowedDataset.batches`` (same
    rng stream), yielding device-side dicts.
    """

    def __init__(self, dataset, device=None):
        import numpy as np

        if device is None:
            if len(jax.devices()) > 1:
                # gathering would have to respect a sharding; the
                # small-data use cases (ledgers, dummy tiers) are
                # single-device — pass an explicit device to override
                raise ValueError(
                    "DeviceResidentData supports single-device runs only "
                    "(pass device= to pin one explicitly)")
            device = jax.devices()[0]
        self._device = device
        n = len(dataset)
        sample = dataset[0]
        host = {
            k: np.empty((n,) + np.shape(v), np.asarray(v).dtype)
            for k, v in sample.items()
        }
        for i in range(n):
            item = dataset[i]
            for k, v in item.items():
                host[k][i] = v
        self.num_samples = n
        self.data = jax.device_put(host, device)
        # inputs are committed to `device`, so the gather executes there
        self._gather = jax.jit(
            lambda data, idx: jax.tree_util.tree_map(
                lambda a: jnp_take(a, idx), data))

    def __len__(self) -> int:
        return self.num_samples

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                drop_remainder: bool = True, order=None):
        import numpy as np

        if order is None:
            order = np.arange(self.num_samples)
            if shuffle:
                np.random.default_rng(seed).shuffle(order)
        limit = len(order) - (len(order) % batch_size if drop_remainder else 0)
        for i in range(0, limit, batch_size):
            idx = jax.device_put(np.asarray(order[i : i + batch_size]),
                                 self._device)
            yield self._gather(self.data, idx)


def jnp_take(a, idx):
    import jax.numpy as jnp

    return jnp.take(a, idx, axis=0)


def device_normalize_images(u8, valid):
    """uint8 image windows + validity mask -> normalized float image_data.

    The packed pipeline ships raw uint8 (4x smaller transfers, decode/resize
    done once at pack time); the [0,1] scale + ImageNet stats + zeroing of
    padded frames (reference pytorch.py:198-213, :218-227) run inside the
    jitted step where XLA fuses them into the encoder's first conv.
    """
    import jax.numpy as jnp

    from soccerdiffusion_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    if u8.shape[-1] != 3:
        # pre-patchified frames (..., patches, P*P*3): the channel pattern
        # repeats every 3 along the last axis (patchify_frames)
        reps = u8.shape[-1] // 3
        mean, std = jnp.tile(mean, reps), jnp.tile(std, reps)
        x = (u8.astype(jnp.float32) / 255.0 - mean) / std
        return x * valid[..., None, None]
    x = u8.astype(jnp.float32) / 255.0
    x = (x - mean) / std
    return x * valid[..., None, None, None]


def patchify_frames(frames, patch: int):
    """(..., H, W, C) -> (..., (H//P)*(W//P), P*P*C), any dtype, numpy or jnp.

    The ViT patch layout, produced on the HOST (pack time or batch
    assembly) so the device step is a straight patches @ kernel GEMM with
    the uint8 -> bf16 convert fused into the operand load. Profiled on the
    flagship step: device-side patchify of the (B, F, 224, 224, 3) uint8
    batch costs ~8-13 ms/step in pure layout copies
    (benchmarks/profile_train_step.py; docs/perf_notes.md round 3).
    """
    *lead, h, w, c = frames.shape
    p = patch
    x = frames.reshape(*lead, h // p, p, w // p, p, c)
    ndim = x.ndim
    # (..., h/p, p, w/p, p, c) -> (..., h/p, w/p, p, p, c)
    perm = tuple(range(ndim - 5)) + (ndim - 5, ndim - 3, ndim - 4, ndim - 2, ndim - 1)
    x = x.transpose(*perm)
    return x.reshape(*lead, (h // p) * (w // p), p * p * c)


def prepare_batch(batch: dict, keep_u8: bool = False) -> dict:
    """In-jit batch preparation: materialize ``image_data`` from a packed
    uint8 batch; pass float batches through unchanged.

    ``keep_u8=True`` leaves ``image_u8``/``image_valid`` in the batch for
    models that consume raw uint8 directly (the ViT encoder folds the
    [0,1]-scale + ImageNet normalization into its patch-embed weights,
    removing several full-image HBM passes; docs/perf_notes.md round 2).
    """
    if "image_u8" not in batch or keep_u8:
        return batch
    batch = dict(batch)
    u8 = batch.pop("image_u8")
    valid = batch.pop("image_valid")
    batch["image_data"] = device_normalize_images(u8, valid)
    return batch


def dropout_modalities(batch: dict, rng, p: float) -> dict:
    """CFG-style per-sample conditioning dropout (in-jit, train-time only).

    With probability ``p``, independently per sample and per modality,
    replace that modality's input with the dataset's own "missing data"
    value (the window-padding semantics of data/dataset.py, which the model
    already sees for short histories): zeros for the joint-command history
    and joint states, the identity orientation for the IMU (quaternion
    ``[0,0,0,1]`` / five-dim ``[1,0,0,0,1]``), zeroed + invalid frames for
    the camera, and ``RobotState.UNKNOWN`` for the game state. The target
    chunk is never touched.

    This is classifier-free-guidance-style conditioning dropout: the model
    must stay a good denoiser under every partial-conditioning pattern, so
    easy modalities cannot fully shadow hard ones (the camera, in the
    vision-ledger runs; docs/quality_ledger_vision_imageonly.md). No
    reference counterpart — the reference trains fully conditioned always
    (reference ml/training/train.py:221-226 uses random context only for
    decoder pretraining).
    """
    import jax.numpy as jnp

    from soccerdiffusion_tpu.data.schema import RobotState

    if p <= 0.0:
        return batch
    batch = dict(batch)
    bsz = batch["joint_command"].shape[0]
    keys = jax.random.split(rng, 5)

    def drop_mask(key):
        return jax.random.bernoulli(key, p, (bsz,))

    for i, name in enumerate(("joint_command_history", "joint_state")):
        if name in batch:
            m = drop_mask(keys[i])
            batch[name] = jnp.where(m[:, None, None],
                                    jnp.zeros_like(batch[name]), batch[name])
    if "rotation" in batch:
        m = drop_mask(keys[2])
        rot = batch["rotation"]
        if rot.shape[-1] == 5:
            identity = jnp.array([1.0, 0.0, 0.0, 0.0, 1.0], dtype=rot.dtype)
        else:
            identity = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype)
        batch["rotation"] = jnp.where(m[:, None, None], identity, rot)
    m_img = drop_mask(keys[3])
    if "image_u8" in batch:
        u8 = batch["image_u8"]
        pad = (1,) * (u8.ndim - 1)
        batch["image_u8"] = jnp.where(m_img.reshape(bsz, *pad),
                                      jnp.zeros_like(u8), u8)
        batch["image_valid"] = jnp.where(m_img[:, None],
                                         jnp.zeros_like(batch["image_valid"]),
                                         batch["image_valid"])
    elif "image_data" in batch:
        img = batch["image_data"]
        pad = (1,) * (img.ndim - 1)
        batch["image_data"] = jnp.where(m_img.reshape(bsz, *pad),
                                        jnp.zeros_like(img), img)
    if "vision_u" in batch:
        # the aux cue-regression label (TrainConfig.aux_cue_weight) is only
        # supervisable from real frames: invalidate it wherever the camera
        # was nulled so the masked aux loss (training/trainer.py) skips it
        vu = batch["vision_u"]
        valid = batch.get("vision_u_valid", jnp.ones_like(vu))
        m_vu = m_img.reshape(bsz, *(1,) * (vu.ndim - 1))
        batch["vision_u_valid"] = jnp.where(m_vu, jnp.zeros_like(valid), valid)
    if "game_state" in batch:
        m = drop_mask(keys[4])
        batch["game_state"] = jnp.where(
            m, jnp.full_like(batch["game_state"], int(RobotState.UNKNOWN)),
            batch["game_state"])
    return batch


#: modality name -> the batch keys it covers (the conditioning surface of
#: DiffusionPolicy.encode_context, models/policy.py:105-134). "all" nulls
#: every conditioning modality (the fully-unconditional CFG branch).
MODALITY_KEYS = {
    "action_history": ("joint_command_history",),
    "joint_states": ("joint_state",),
    "imu": ("rotation",),
    "image": ("image_u8", "image_valid", "image_data"),
    "game_state": ("game_state",),
}


def parse_guidance_spec(spec: str) -> tuple[float, tuple[str, ...]]:
    """Parse the CLI classifier-free-guidance spec ``SCALE[@MODALITY,...]``
    (e.g. ``'2.0@image'``) into ``(scale, null_modalities)``.

    One parser for every CLI surface (serve/plot/report) so malformed specs
    fail uniformly: raises :class:`ValueError` on a non-numeric scale or an
    unknown modality name (callers with an argparse parser wrap this in
    ``parser.error``). The default modality is ``image``.
    """
    scale_s, _, mods_s = spec.partition("@")
    try:
        scale = float(scale_s)
    except ValueError:
        raise ValueError(
            f"bad guidance spec {spec!r}: scale {scale_s!r} is not a number; "
            "expected SCALE[@MODALITY,...], e.g. '2.0@image'") from None
    mods = tuple(mods_s.split(",")) if mods_s else ("image",)
    for mod in mods:
        if mod != "all" and mod not in MODALITY_KEYS:
            raise ValueError(
                f"bad guidance spec {spec!r}: unknown modality {mod!r}; "
                f"expected one of {sorted(MODALITY_KEYS)} or 'all'")
    return scale, mods


def inactive_guidance_modalities(model_config, modalities) -> list[str]:
    """The subset of ``modalities`` that ``model_config`` never conditions
    on — nulling those is a silent no-op (``eps_u == eps_c``), so guidance
    pays the doubled-batch cost for an unguided result. Callers warn when
    this is non-empty (advisor finding r3: ``serve --guidance 2.0@image``
    on a camera-free config)."""
    names = tuple(MODALITY_KEYS) if "all" in modalities else tuple(modalities)
    off = {"image": not model_config.use_images,
           "game_state": not model_config.use_gamestate}
    return [m for m in names if off.get(m, False)]


def null_modalities(batch: dict, modalities) -> dict:
    """Replace whole conditioning modalities with their "missing data" value
    for EVERY sample — the deterministic counterpart of
    :func:`dropout_modalities` (same null values: the window-padding
    semantics of data/dataset.py).

    This builds the *unconditional branch* for classifier-free guidance at
    sampling time: a model trained with ``modality_dropout > 0`` has seen
    exactly these null patterns, so ``eps_uncond = denoise(null context)``
    is in-distribution and ``eps_u + w (eps_c - eps_u)`` amplifies the
    contribution of the nulled modalities (Ho & Salimans 2022). No
    reference counterpart (the reference samples fully conditioned always,
    reference ml/inference/ros.py:301-310).

    ``modalities``: iterable of :data:`MODALITY_KEYS` names, or ``"all"``.
    Unknown names raise; modalities absent from the batch are ignored (so
    ``("image",)`` is a safe no-op on camera-free batches).
    """
    import jax.numpy as jnp

    from soccerdiffusion_tpu.data.schema import RobotState

    if isinstance(modalities, str):
        modalities = (modalities,)
    names: tuple[str, ...] = tuple(modalities)
    if "all" in names:
        names = tuple(MODALITY_KEYS)
    for name in names:
        if name not in MODALITY_KEYS:
            raise ValueError(
                f"unknown modality {name!r}; expected one of "
                f"{sorted(MODALITY_KEYS)} or 'all'")
    batch = dict(batch)
    for name in names:
        if name in ("action_history", "joint_states"):
            (key,) = MODALITY_KEYS[name]
            if key in batch:
                batch[key] = jnp.zeros_like(batch[key])
        elif name == "imu":
            if "rotation" in batch:
                rot = batch["rotation"]
                if rot.shape[-1] == 5:
                    identity = jnp.array([1.0, 0.0, 0.0, 0.0, 1.0],
                                         dtype=rot.dtype)
                else:
                    identity = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype)
                batch["rotation"] = jnp.broadcast_to(identity, rot.shape)
        elif name == "image":
            if "image_tokens" in batch:
                # cached per-frame ENCODINGS (inference/controller.py):
                # zeroing them is not the null condition (the null is the
                # zero IMAGE, whose encoding is nonzero) — refuse rather
                # than produce a silently-wrong unconditional branch
                raise ValueError(
                    "cannot null the 'image' modality of a cached-token "
                    "batch (image_tokens are encodings, not frames); serve "
                    "guidance with cache_image_tokens=False")
            for key in ("image_u8", "image_data", "image_valid"):
                if key in batch:
                    batch[key] = jnp.zeros_like(batch[key])
        elif name == "game_state":
            if "game_state" in batch:
                batch["game_state"] = jnp.full_like(
                    batch["game_state"], int(RobotState.UNKNOWN))
    return batch
