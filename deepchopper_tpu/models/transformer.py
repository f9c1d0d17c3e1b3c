"""From-scratch transformer-encoder token classifier baseline.

Mirrors the capability of the reference's torch TransformerEncoder module
(reference: deepchopper/models/transformer.py:12-107), built TPU-first:
bfloat16 MXU matmuls, static shapes, optional padding mask.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import TransformerConfig


def sinusoidal_positions(max_len: int, d_model: int) -> np.ndarray:
    pos = np.arange(max_len)[:, None].astype(np.float32)
    div = np.exp(np.arange(0, d_model, 2).astype(np.float32) * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class EncoderLayer(nn.Module):
    config: TransformerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: jnp.ndarray | None) -> jnp.ndarray:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x)
        attn_mask = None
        if pad_mask is not None:
            attn_mask = pad_mask[:, None, None, :]  # (B, 1, 1, L): mask keys
        h = nn.MultiHeadDotProductAttention(
            num_heads=cfg.n_heads, dtype=dtype, name="mha"
        )(h.astype(dtype), h.astype(dtype), mask=attn_mask)
        x = x + h.astype(jnp.float32)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x)
        h = nn.Dense(cfg.d_ff, dtype=dtype, name="ff1")(h.astype(dtype))
        h = jax.nn.relu(h)
        h = nn.Dense(cfg.d_model, dtype=dtype, name="ff2")(h)
        return x + h.astype(jnp.float32)


class TransformerBackbone(nn.Module):
    """Embedding + sinusoidal positions + N prenorm encoder layers."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, pad_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.d_model, name="embed", dtype=jnp.float32)(input_ids)
        pe = jnp.asarray(sinusoidal_positions(cfg.max_len, cfg.d_model))
        x = x + pe[None, : x.shape[1]]
        for i in range(cfg.n_layers):
            x = EncoderLayer(cfg, name=f"layer_{i}")(x, pad_mask)
        return nn.LayerNorm(dtype=jnp.float32, name="ln_f")(x)
