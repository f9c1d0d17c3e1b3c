"""HyenaDNA-style long-convolution backbone, re-derived in JAX for TPU.

The operator follows the public HyenaDNA architecture (implicit long filter
from a tiny sine MLP over positional features, exponential decay modulation,
depthwise short conv, multiplicative gating, causal FFT convolution) that the
reference consumes via `AutoModel` (reference: deepchopper/models/llm/hyena.py:8-41,
deepchopper/models/llm/components.py:8-14).

TPU-first notes:
* The long conv runs as a causal circular FFT conv (rfft/irfft, O(L log L)) —
  XLA lowers FFTs well on TPU; the gating/projections are MXU matmuls in
  bfloat16 while FFT and layernorm stay float32.
* All shapes are static under jit; sequence length enters as the traced
  array's shape, so bucketing upstream keeps recompilations bounded.
* The implicit filter depends only on parameters, so under jit XLA hoists it
  out of the batch computation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import HyenaConfig


def positional_features(seq_len: int, emb_dim: int, max_seq_len: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hyena positional features z (L, emb_dim) and normalized time t (L, 1).

    z = [t, Re(exp(-i f w)), Im(exp(-i f w))] for `bands` frequencies f.
    """
    t = jnp.linspace(0.0, 1.0, max_seq_len, dtype=jnp.float32)[:, None]
    bands = (emb_dim - 1) // 2
    t_rescaled = jnp.linspace(0.0, float(max_seq_len - 1), max_seq_len, dtype=jnp.float32)[:, None]
    w = 2.0 * math.pi * t_rescaled / float(max_seq_len)  # (L, 1)
    f = jnp.linspace(1e-4, float(bands) - 1.0, bands, dtype=jnp.float32)[None, :]  # (1, bands)
    phase = f * w  # (L, bands)
    z = jnp.concatenate([t, jnp.cos(-phase), jnp.sin(-phase)], axis=-1)  # (L, emb_dim)
    return z[:seq_len], t[:seq_len]


class HyenaFilter(nn.Module):
    """Implicit long filter: sine MLP over positional features + decay modulation."""

    config: HyenaConfig

    @nn.compact
    def __call__(self, seq_len: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        d_filter = cfg.d_model * (cfg.hyena_order - 1)
        z, t = positional_features(seq_len, cfg.emb_dim, cfg.max_seq_len)

        freq_init = nn.initializers.constant(cfg.activation_freq)

        def sine(x: jnp.ndarray, idx: int) -> jnp.ndarray:
            if cfg.train_freq:
                freq = self.param(f"sin_freq_{idx}", freq_init, (1, cfg.filter_order), jnp.float32)
            else:
                freq = cfg.activation_freq
            return jnp.sin(freq * x)

        h = nn.Dense(cfg.filter_order, name="mlp_in", dtype=jnp.float32)(z)
        h = sine(h, 0)
        for i in range(cfg.num_inner_mlps):
            h = nn.Dense(cfg.filter_order, name=f"mlp_{i}", dtype=jnp.float32)(h)
            h = sine(h, i + 1)
        h = nn.Dense(d_filter, use_bias=False, name="mlp_out", dtype=jnp.float32)(h)  # (L, d)

        # Exponential modulation: per-channel decay envelope over time.
        max_decay = math.log(cfg.modulation_target) / cfg.modulation_fast_decay_pct
        min_decay = math.log(cfg.modulation_target) / cfg.modulation_slow_decay_pct
        deltas = jnp.linspace(min_decay, max_decay, d_filter, dtype=jnp.float32)[None, :]
        decay = jnp.exp(-t * jnp.abs(deltas))  # (L, d)
        h = h * (decay + cfg.modulation_shift)

        bias = self.param(
            "bias", nn.initializers.normal(stddev=1.0), (d_filter,), jnp.float32
        )
        if not cfg.use_bias:
            bias = jnp.zeros_like(bias)
        return h, bias


def fft_causal_conv(v: jnp.ndarray, k: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Causal long convolution via zero-padded FFT: y = (v * k)[:L] + v * bias.

    v: (B, L, D) float32, k: (L, D), bias: (D,).
    """
    seq_len = v.shape[1]
    fft_size = 2 * seq_len
    v32 = v.astype(jnp.float32)
    k_f = jnp.fft.rfft(k, n=fft_size, axis=0)  # (F, D)
    v_f = jnp.fft.rfft(v32, n=fft_size, axis=1)  # (B, F, D)
    y = jnp.fft.irfft(v_f * k_f[None], n=fft_size, axis=1)[:, :seq_len]
    return y + v32 * bias[None, None, :]


def causal_conv(v: jnp.ndarray, k: jnp.ndarray, bias: jnp.ndarray, impl: str) -> jnp.ndarray:
    """Dispatch the long conv.

    impl:
      "pallas_fft"  — fused VMEM kernel (ops/pallas_fft.py) on TPU; falls back
                      to matmul_fft when off-TPU or the length is unsupported.
      "matmul_fft"  — XLA four-step Cooley-Tukey on the MXU (ops/fft.py).
      "fft"         — stock jnp.fft (any length).

    Non-power-of-two lengths zero-pad v and k up to the next power of two and
    slice the result back: the FFT runs at the same size it would for the next
    pow2 bucket, while every other op in the network (projections, gating,
    head) runs at the smaller true width — this is what makes fine-grained
    (non-pow2) sequence buckets profitable on TPU.
    """
    seq_len = v.shape[1]
    if impl in ("pallas_fft", "matmul_fft"):
        n = 2 * seq_len
        if impl == "pallas_fft":
            from ..ops import pallas_fft

            if (
                pallas_fft.MIN_N <= n <= pallas_fft.MAX_N
                and n % 512 == 0
                and jax.default_backend() == "tpu"
            ):
                return pallas_fft.fft_causal_conv_pallas(v, k, bias)
        from ..ops.fft import _split as _mm_split, fft_causal_conv_matmul

        try:
            _mm_split(n)
            return fft_causal_conv_matmul(v, k, bias)
        except ValueError:
            # Length the four-step split can't factor: pad up to the next
            # multiple of 256 (or pow2 for tiny L) and slice back — exact
            # because outputs < seq_len only touch taps/inputs < seq_len.
            padded = max(256, -(-seq_len // 256) * 256)
            v_p = jnp.pad(v, ((0, 0), (0, padded - seq_len), (0, 0)))
            k_p = jnp.pad(k, ((0, padded - seq_len), (0, 0)))
            y = causal_conv(v_p, k_p, jnp.zeros_like(bias), impl)[:, :seq_len]
            return y + v.astype(jnp.float32) * bias[None, None, :]
    return fft_causal_conv(v, k, bias)


def short_depthwise_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Depthwise conv (k taps, left-pad k-1) as shift-multiply-adds.

    Equivalent to lax.conv_general_dilated with feature_group_count=W, which
    lowers poorly on TPU for large group counts; k shifted elementwise FMAs
    run on the VPU at memory speed. Runs in x's dtype (bf16 on the fast path —
    a 3-tap FMA, so the error is ~1 ulp of bf16 and the op is HBM-bound).
    x: (B, L, W), kernel: (k, 1, W).
    """
    taps = kernel.shape[0]
    seq_len = x.shape[1]
    kernel = kernel.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (taps - 1, 0), (0, 0)))
    out = xp[:, 0:seq_len, :] * kernel[0, 0][None, None, :]
    for t in range(1, taps):
        out = out + xp[:, t : t + seq_len, :] * kernel[t, 0][None, None, :]
    return out + bias[None, None, :].astype(x.dtype)


class HyenaOperator(nn.Module):
    """Order-2 Hyena mixer: projections, depthwise short conv, gated long conv."""

    config: HyenaConfig

    @nn.compact
    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        d = cfg.d_model
        seq_len = u.shape[1]
        width = (cfg.hyena_order + 1) * d
        dtype = jnp.dtype(cfg.compute_dtype)

        proj = nn.Dense(width, name="in_proj", dtype=dtype)(u.astype(dtype))  # (B, L, 3d)

        # Depthwise causal-ish short conv: torch Conv1d(k=3, padding=2) then
        # truncate to L — i.e. pad (2, 0) relative to a valid conv output of
        # length L. Runs in compute_dtype: the activation stream stays bf16
        # on the fast path (the backbone is HBM-bandwidth-bound, not
        # MXU-bound, so halving activation bytes is the win); the FFT conv
        # below still computes in float32 internally.
        k_short = self.param(
            "short_filter_kernel",
            nn.initializers.lecun_normal(),
            (cfg.short_filter_order, 1, width),
            jnp.float32,
        )
        b_short = self.param("short_filter_bias", nn.initializers.zeros, (width,), jnp.float32)
        uc = short_depthwise_conv(proj.astype(dtype), k_short, b_short)

        x2, x1, v = jnp.split(uc, 3, axis=-1)  # each (B, L, d)

        k_long, bias = HyenaFilter(cfg, name="filter_fn")(seq_len)

        v = v * x1
        v = causal_conv(v, k_long, bias, cfg.conv_impl)
        y = v.astype(dtype) * x2

        return nn.Dense(d, name="out_proj", dtype=dtype)(y.astype(dtype))


class HyenaMlp(nn.Module):
    config: HyenaConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        h = nn.Dense(cfg.d_inner, name="fc1", dtype=dtype)(x.astype(dtype))
        h = jax.nn.gelu(h, approximate=True)
        return nn.Dense(cfg.d_model, name="fc2", dtype=dtype)(h)


class HyenaBlock(nn.Module):
    """Pre-norm residual block: r += mixer(ln1(r)); r += mlp(ln2(r))."""

    config: HyenaConfig

    @nn.compact
    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        eps = cfg.layer_norm_epsilon
        # LayerNorm statistics in float32 (dtype=f32 upcasts the bf16 stream,
        # so mean/var never round in bf16); everything else — residual adds,
        # short conv, gating, matmuls — stays in compute_dtype.
        h = nn.LayerNorm(epsilon=eps, name="norm1", dtype=jnp.float32)(r)
        r = r + HyenaOperator(cfg, name="mixer")(h).astype(r.dtype)
        h = nn.LayerNorm(epsilon=eps, name="norm2", dtype=jnp.float32)(r)
        r = r + HyenaMlp(cfg, name="mlp")(h).astype(r.dtype)
        return r


class HyenaBackbone(nn.Module):
    """Embedding -> n_layer HyenaBlocks -> final LayerNorm; returns (B, L, D)."""

    config: HyenaConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        emb = nn.Embed(
            cfg.padded_vocab_size,
            cfg.d_model,
            name="word_embeddings",
            dtype=dtype,
        )(input_ids)
        r = emb
        for i in range(cfg.n_layer):
            r = HyenaBlock(cfg, name=f"block_{i}")(r)
        # Final norm in float32: the head consumes an f32 hidden state.
        return nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_f", dtype=jnp.float32)(r)
