"""Model zoo: functional flax modules, TPU-first.

Everything is a pure-function pytree module; attention runs through a
pluggable backend (XLA einsum or a Pallas fused kernel, see
``soccerdiffusion_tpu.ops``). Layer semantics intentionally match the
reference's torch modules (pre-norm, exact GELU, ``dim_feedforward ==
hidden_dim``; reference ml/model/encoder/base.py:29-39) so that fidelity
tests and checkpoint ports are bit-comparable.
"""

from soccerdiffusion_tpu.models.embeddings import (
    PatchConvEmbed,
    PositionalEncoding,
    StepToken,
    sinusoidal_table,
)
from soccerdiffusion_tpu.models.attention import MultiHeadAttention
from soccerdiffusion_tpu.models.transformer import (
    TransformerDecoder,
    TransformerDecoderLayer,
    TransformerEncoder,
    TransformerEncoderLayer,
)
from soccerdiffusion_tpu.models.encoders import (
    GameStateEncoder,
    IMUEncoder,
    JointEncoder,
    SequenceEncoder,
)
from soccerdiffusion_tpu.models.decoder import DiffusionActionGenerator
from soccerdiffusion_tpu.models.policy import DiffusionPolicy

__all__ = [
    "sinusoidal_table",
    "PositionalEncoding",
    "StepToken",
    "PatchConvEmbed",
    "MultiHeadAttention",
    "TransformerEncoder",
    "TransformerEncoderLayer",
    "TransformerDecoder",
    "TransformerDecoderLayer",
    "SequenceEncoder",
    "JointEncoder",
    "IMUEncoder",
    "GameStateEncoder",
    "DiffusionActionGenerator",
    "DiffusionPolicy",
]
