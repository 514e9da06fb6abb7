"""Numerical fidelity tests: flax modules vs torch reference semantics.

The reference model is built from torch primitives
(nn.TransformerEncoder/DecoderLayer with norm_first + gelu, nn.Conv1d patch
embeddings, nn.MultiheadAttention; reference ml/model/encoder/base.py:29-39,
ml/model/decoder.py:36-46). These tests build the same torch modules, port
their weights through ``soccerdiffusion_tpu.utils.torch_port``, and require
agreement to float32 tolerance.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch import nn as tnn

from soccerdiffusion_tpu.models import (
    MultiHeadAttention,
    PatchConvEmbed,
    PositionalEncoding,
    StepToken,
    TransformerDecoderLayer,
    TransformerEncoder,
    TransformerEncoderLayer,
)
from soccerdiffusion_tpu.utils import torch_port

B, T, E, HEADS = 3, 11, 16, 4
RTOL, ATOL = 2e-5, 2e-5


def t2n(x):
    return x.detach().cpu().numpy()


class TestMultiHeadAttention:
    def test_self_attention_matches_torch(self, rng):
        torch.manual_seed(0)
        tmha = tnn.MultiheadAttention(E, HEADS, batch_first=True)
        x = rng.standard_normal((B, T, E)).astype(np.float32)
        with torch.no_grad():
            expected, _ = tmha(torch.tensor(x), torch.tensor(x), torch.tensor(x), need_weights=False)

        mha = MultiHeadAttention(E, HEADS)
        params = torch_port.port_mha(tmha.state_dict(), "")
        got = mha.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), t2n(expected), rtol=RTOL, atol=ATOL)

    def test_cross_attention_matches_torch(self, rng):
        torch.manual_seed(1)
        tmha = tnn.MultiheadAttention(E, HEADS, batch_first=True)
        q = rng.standard_normal((B, 5, E)).astype(np.float32)
        kv = rng.standard_normal((B, T, E)).astype(np.float32)
        with torch.no_grad():
            expected, _ = tmha(torch.tensor(q), torch.tensor(kv), torch.tensor(kv), need_weights=False)
        params = torch_port.port_mha(tmha.state_dict(), "")
        got = MultiHeadAttention(E, HEADS).apply(
            {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(q), jnp.asarray(kv)
        )
        np.testing.assert_allclose(np.asarray(got), t2n(expected), rtol=RTOL, atol=ATOL)


class TestEncoderLayer:
    def test_matches_torch_norm_first_gelu(self, rng):
        torch.manual_seed(2)
        tlayer = tnn.TransformerEncoderLayer(
            d_model=E, nhead=HEADS, dim_feedforward=E, batch_first=True,
            norm_first=True, activation="gelu", dropout=0.0,
        )
        tlayer.eval()
        x = rng.standard_normal((B, T, E)).astype(np.float32)
        with torch.no_grad():
            expected = tlayer(torch.tensor(x))
        params = torch_port.port_encoder_layer(tlayer.state_dict(), "")
        # state dict keys carry a leading "." after empty prefix join; normalize
        got = TransformerEncoderLayer(E, HEADS).apply(
            {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)
        )
        np.testing.assert_allclose(np.asarray(got), t2n(expected), rtol=RTOL, atol=ATOL)

    def test_stack_matches_torch(self, rng):
        torch.manual_seed(3)
        tstack = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(
                d_model=E, nhead=HEADS, dim_feedforward=E, batch_first=True,
                norm_first=True, activation="gelu", dropout=0.0,
            ),
            num_layers=3,
        )
        tstack.eval()
        x = rng.standard_normal((B, T, E)).astype(np.float32)
        with torch.no_grad():
            expected = tstack(torch.tensor(x))
        sd = tstack.state_dict()
        params = {
            f"layer_{i}": torch_port.port_encoder_layer(sd, f"layers.{i}") for i in range(3)
        }
        got = TransformerEncoder(E, HEADS, 3).apply(
            {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)
        )
        np.testing.assert_allclose(np.asarray(got), t2n(expected), rtol=1e-4, atol=1e-4)


class TestDecoderLayer:
    def test_matches_torch(self, rng):
        torch.manual_seed(4)
        tlayer = tnn.TransformerDecoderLayer(
            d_model=E, nhead=HEADS, dim_feedforward=E, batch_first=True,
            norm_first=True, activation="gelu", dropout=0.0,
        )
        tlayer.eval()
        x = rng.standard_normal((B, 10, E)).astype(np.float32)
        mem = rng.standard_normal((B, T, E)).astype(np.float32)
        with torch.no_grad():
            expected = tlayer(torch.tensor(x), torch.tensor(mem))
        params = torch_port.port_decoder_layer(tlayer.state_dict(), "")
        got = TransformerDecoderLayer(E, HEADS).apply(
            {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x), jnp.asarray(mem)
        )
        np.testing.assert_allclose(np.asarray(got), t2n(expected), rtol=RTOL, atol=ATOL)


class TestEmbeddings:
    def test_positional_encoding_matches_reference_formula(self):
        d_model, max_len = 32, 50
        pe = np.zeros((max_len, d_model), dtype=np.float64)
        position = np.arange(max_len)[:, None].astype(np.float64)
        div_term = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
        pe[:, 0::2] = np.sin(position * div_term)
        pe[:, 1::2] = np.cos(position * div_term)

        x = jnp.zeros((1, 20, d_model))
        mod = PositionalEncoding(d_model, max_len)
        got = mod.apply({}, x)
        np.testing.assert_allclose(np.asarray(got)[0], pe[:20], rtol=1e-6, atol=1e-6)

    def test_step_token_matches_reference_formula(self, rng):
        # reference misc.py:26-35: half sinusoidal of t, half learned token.
        dim = 16
        steps = np.array([0, 5, 999], dtype=np.int32)
        mod = StepToken(dim)
        variables = mod.init(jax.random.key(0), jnp.asarray(steps))
        token = np.asarray(variables["params"]["token"])
        got = np.asarray(mod.apply(variables, jnp.asarray(steps)))

        half_dim = dim // 4
        emb = np.exp(np.arange(half_dim) * -math.log(10000.0) / (half_dim - 1))
        ang = steps[:, None].astype(np.float64) * emb[None, :]
        expected = np.concatenate(
            [np.sin(ang), np.cos(ang), np.tile(token, (3, 1))], axis=-1
        )[:, None, :]
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
        assert got.shape == (3, 1, dim)

    def test_patch_conv_matches_torch_conv1d(self, rng):
        torch.manual_seed(5)
        in_dim, hidden, patch = 20, 32, 5
        tconv = tnn.Conv1d(in_dim, hidden, kernel_size=patch, stride=patch)
        x = rng.standard_normal((B, 100, in_dim)).astype(np.float32)
        with torch.no_grad():
            # torch expects (B, C, T)
            expected = tconv(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1)
        params = {"proj": torch_port.port_conv1d(tconv.state_dict(), "")}
        got = PatchConvEmbed(hidden, patch).apply(
            {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)
        )
        assert got.shape == (B, 20, hidden)
        np.testing.assert_allclose(np.asarray(got), t2n(expected), rtol=RTOL, atol=ATOL)


class TestPortHelpers:
    def test_port_linear_roundtrip(self, rng):
        torch.manual_seed(6)
        lin = tnn.Linear(8, 4)
        x = rng.standard_normal((5, 8)).astype(np.float32)
        with torch.no_grad():
            expected = lin(torch.tensor(x))
        p = torch_port.port_linear(lin.state_dict(), "")
        got = jnp.asarray(x) @ jnp.asarray(p["kernel"]) + jnp.asarray(p["bias"])
        np.testing.assert_allclose(np.asarray(got), t2n(expected), rtol=RTOL, atol=ATOL)
