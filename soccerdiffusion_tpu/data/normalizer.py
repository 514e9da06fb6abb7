"""Per-joint normalization statistics (reference dataset/pytorch.py:401-414).

``fit`` uses the unbiased (ddof=1) standard deviation to match
``torch.Tensor.std``'s default, so stats embedded in ported checkpoints and
stats fitted here agree.
"""

from __future__ import annotations

import numpy as np
from flax import struct
import jax.numpy as jnp


@struct.dataclass
class Normalizer:
    mean: jnp.ndarray  # (J,)
    std: jnp.ndarray  # (J,)

    @classmethod
    def fit(cls, data) -> "Normalizer":
        """data: (N, J) samples (the reference concatenates target chunks
        along time; reference train.py:106-110)."""
        arr = np.asarray(data, dtype=np.float32)
        std = arr.std(axis=0, ddof=1)
        if np.any(std == 0):
            raise ValueError("normalization std is zero: some joints are constant")
        return cls(mean=jnp.asarray(arr.mean(axis=0)), std=jnp.asarray(std))

    @classmethod
    def identity(cls, num_joints: int) -> "Normalizer":
        return cls(mean=jnp.zeros(num_joints), std=jnp.ones(num_joints))

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.mean) / self.std

    def denormalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * self.std + self.mean
