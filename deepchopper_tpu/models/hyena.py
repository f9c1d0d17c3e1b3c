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


# ---------------------------------------------------------------------------
# Channel-major building blocks.
#
# The backbone's residual stream runs CHANNEL-MAJOR, (D, B, L), end to end:
# the Pallas gated-conv kernel wants per-channel blocks with the sequence
# digit split (h, n1) in the minor dims, and in (D, B, L) that split is a
# free row-major reshape — the round-3 layout paid two f32 (B, L, D)
# transposes per layer per conv to get there. Matmuls contract the leading
# channel axis (M=features, K=channels, N=B*L — ideal MXU shapes), LayerNorm
# reduces axis 0 in float32, and the layout converts exactly twice per
# forward: once after the embedding gather, once before the head.
#
# All param names/shapes are IDENTICAL to the previous (B, L, D) modules
# (in_proj/out_proj/fc1/fc2 as nn.Dense-compatible kernel+bias, norm* as
# scale+bias), so checkpoints and the torch converter are unaffected.
# ---------------------------------------------------------------------------


class DenseCM(nn.Module):
    """nn.Dense-compatible linear on a channel-major (Cin, B, L) stream.

    Params are named/shaped exactly like `nn.Dense` (kernel (Cin, Cout),
    bias (Cout,)); the contraction runs as kernel^T @ x -> (Cout, B, L).
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x_cm: jnp.ndarray) -> jnp.ndarray:
        cin = x_cm.shape[0]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (cin, self.features), jnp.float32
        )
        y = jax.lax.dot_general(
            kernel.astype(self.dtype),
            x_cm.astype(self.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=self.dtype,
        )  # (Cout, B, L)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)[:, None, None]
        return y


class LayerNormCM(nn.Module):
    """nn.LayerNorm-compatible norm over the channel axis of (C, B, L).

    Statistics in float32 (matching the previous dtype=f32 LayerNorm);
    the OUTPUT is cast to `out_dtype` — bf16 on the fast path, which halves
    the HBM stream the next matmul reads (the matmul cast to bf16 is the
    same rounding the nn.Dense(dtype=bf16) input cast performed before).
    """

    epsilon: float = 1e-5
    out_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_cm: jnp.ndarray) -> jnp.ndarray:
        c = x_cm.shape[0]
        x32 = x_cm.astype(jnp.float32)
        mean = jnp.mean(x32, axis=0, keepdims=True)
        # E[x^2] - E[x]^2, matching flax's use_fast_variance default.
        var = jnp.maximum(jnp.mean(x32 * x32, axis=0, keepdims=True) - mean * mean, 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return (y * scale[:, None, None] + bias[:, None, None]).astype(self.out_dtype)


def short_depthwise_conv_cm(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray
) -> jnp.ndarray:
    """Channel-major short conv: x (W, B, L), kernel (k, 1, W), bias (W,).

    Same semantics as `short_depthwise_conv` (k shifted FMAs along the
    sequence axis, left pad k-1), in x's dtype on the VPU.
    """
    taps = kernel.shape[0]
    seq_len = x.shape[2]
    kernel = kernel.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (0, 0), (taps - 1, 0)))
    out = xp[:, :, 0:seq_len] * kernel[0, 0][:, None, None]
    for t in range(1, taps):
        out = out + xp[:, :, t : t + seq_len] * kernel[t, 0][:, None, None]
    return out + bias[:, None, None].astype(x.dtype)


def gated_causal_conv_cm(
    uc: jnp.ndarray, k: jnp.ndarray, bias: jnp.ndarray, impl: str
) -> jnp.ndarray:
    """Dispatch the fused gate+conv+gate on a channel-major stream.

    uc: (3D, B, L) [x2 | x1 | v], k: (L, D), bias: (D,). Returns (D, B, L)
    in uc's dtype. On TPU with a supported length this is ONE fused Pallas
    dispatch (ops/pallas_fft.gated_fft_conv_cm); otherwise the same math
    (f32 gates, f32 conv, cast back) runs in XLA via `causal_conv`.
    """
    d_model = k.shape[1]
    seq_len = uc.shape[2]
    n = 2 * seq_len
    if impl == "pallas_fft":
        from ..ops import pallas_fft

        if (
            pallas_fft.MIN_N <= n <= pallas_fft.MAX_N
            and n % 512 == 0
            and jax.default_backend() == "tpu"
        ):
            return pallas_fft.gated_fft_conv_cm(uc, k, bias)
        impl = "matmul_fft"
    x2, x1, v = uc[:d_model], uc[d_model : 2 * d_model], uc[2 * d_model :]
    w = v.astype(jnp.float32) * x1.astype(jnp.float32)
    z = causal_conv(jnp.moveaxis(w, 0, -1), k, bias, impl)  # (B, L, D) f32
    return (jnp.moveaxis(z, -1, 0) * x2.astype(jnp.float32)).astype(uc.dtype)


class _MixerInProj(nn.Module):
    """in_proj + fused mixer conv as ONE Pallas dispatch.

    Param names/shapes are EXACTLY DenseCM's (kernel (Cin, 3D), bias (3D,))
    under this module's scope — named "in_proj" by the caller, so checkpoints
    are interchangeable with the unfused path. Consumes the channel-major
    (D, B, L) normalized stream; returns the mixer output batch-major
    (B, D, L) (the caller transposes — a bitcast under XLA's layouts).
    """

    features: int  # 3 * d_model
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, u_cm, k_short, b_short, k_long, bias):
        from ..ops import pallas_fft

        cin = u_cm.shape[0]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (cin, self.features), jnp.float32
        )
        b_in = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x_bm = jnp.transpose(u_cm.astype(self.dtype), (1, 0, 2))  # (B, D, L)
        return pallas_fft.mixer_fft_conv_inproj(
            x_bm, kernel, b_in, k_short, b_short, k_long, bias
        )


class HyenaOperator(nn.Module):
    """Order-2 Hyena mixer: projections, depthwise short conv, gated long conv.

    Channel-major: consumes and returns (D, B, L)."""

    config: HyenaConfig

    @nn.compact
    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        d = cfg.d_model
        seq_len = u.shape[2]
        width = (cfg.hyena_order + 1) * d
        dtype = jnp.dtype(cfg.compute_dtype)

        # Depthwise causal-ish short conv: torch Conv1d(k=3, padding=2) then
        # truncate to L — i.e. pad (2, 0) relative to a valid conv output of
        # length L. Runs in compute_dtype (one fused VPU pass).
        k_short = self.param(
            "short_filter_kernel",
            nn.initializers.lecun_normal(),
            (cfg.short_filter_order, 1, width),
            jnp.float32,
        )
        b_short = self.param("short_filter_bias", nn.initializers.zeros, (width,), jnp.float32)

        k_long, bias = HyenaFilter(cfg, name="filter_fn")(seq_len)

        import os

        n = 2 * seq_len
        # Default ON: measured 52.3 -> 44.6 ms/step at (256, 1024) on v5e —
        # the XLA short-conv pass (read+write of the 3d-wide bf16 stream)
        # disappears; the in-kernel digit-space rolls are ~free by comparison.
        fuse_short = os.environ.get("DEEPCHOPPER_FUSE_SHORT", "1") == "1"
        if fuse_short and cfg.conv_impl == "pallas_fft":
            from ..ops import pallas_fft

            if (
                pallas_fft.MIN_N <= n <= pallas_fft.MAX_N
                and n % 512 == 0
                and d % 8 == 0  # tap-table blocks need cg divisible by 8
                and jax.default_backend() == "tpu"
            ):
                # DEEPCHOPPER_FUSE_INPROJ=1: in_proj matmul + short conv +
                # gate + long conv + gate in ONE Pallas dispatch (the 3d-wide
                # proj tensor never exists in HBM; mixer_fft_conv_inproj,
                # checkpoint-compatible params). Measured SLOWER on v5e
                # (71.5 vs 39.8 ms/step at 256x1024): Mosaic lowers the
                # in-kernel (cg, D) x (bt, D, h, n1) contraction over x's
                # second-major dim poorly — default stays the XLA in_proj +
                # batch-major mixer; DEEPCHOPPER_MIXER_BM=0 further falls
                # back to the channel-major entry.
                if os.environ.get("DEEPCHOPPER_FUSE_INPROJ", "0") == "1":
                    y_bm = _MixerInProj(width, name="in_proj", dtype=dtype)(
                        u, k_short, b_short, k_long, bias
                    )
                    y = jnp.transpose(y_bm, (1, 0, 2))
                    return DenseCM(d, name="out_proj", dtype=dtype)(y)
                proj = DenseCM(width, name="in_proj", dtype=dtype)(u)  # (3d, B, L)
                if os.environ.get("DEEPCHOPPER_MIXER_BM", "1") == "1":
                    y_bm = pallas_fft.mixer_fft_conv_bm(
                        jnp.transpose(proj, (1, 0, 2)), k_short, b_short, k_long, bias
                    )
                    y = jnp.transpose(y_bm, (1, 0, 2))
                else:
                    y = pallas_fft.mixer_fft_conv_cm(proj, k_short, b_short, k_long, bias)
                return DenseCM(d, name="out_proj", dtype=dtype)(y)
        proj = DenseCM(width, name="in_proj", dtype=dtype)(u)  # (3d, B, L)

        uc = short_depthwise_conv_cm(proj, k_short, b_short)  # (3d, B, L)

        # Fused gate -> long conv -> gate (one Pallas dispatch on TPU).
        y = gated_causal_conv_cm(uc, k_long, bias, cfg.conv_impl)

        return DenseCM(d, name="out_proj", dtype=dtype)(y)


class HyenaMlp(nn.Module):
    config: HyenaConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        h = DenseCM(cfg.d_inner, name="fc1", dtype=dtype)(x)
        h = jax.nn.gelu(h, approximate=True)
        return DenseCM(cfg.d_model, name="fc2", dtype=dtype)(h)


class HyenaBlock(nn.Module):
    """Pre-norm residual block: r += mixer(ln1(r)); r += mlp(ln2(r)).

    Channel-major (D, B, L) stream in compute_dtype."""

    config: HyenaConfig

    @nn.compact
    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        eps = cfg.layer_norm_epsilon
        dtype = jnp.dtype(cfg.compute_dtype)
        # LayerNorm statistics in float32; the normalized stream is emitted
        # in compute_dtype (the consumer matmuls cast there anyway).
        h = LayerNormCM(epsilon=eps, name="norm1", out_dtype=dtype)(r)
        r = r + HyenaOperator(cfg, name="mixer")(h).astype(r.dtype)
        h = LayerNormCM(epsilon=eps, name="norm2", out_dtype=dtype)(r)
        r = r + HyenaMlp(cfg, name="mlp")(h).astype(r.dtype)
        return r


class HyenaBackbone(nn.Module):
    """Embedding -> n_layer HyenaBlocks -> final LayerNorm; returns (B, L, D).

    Internally channel-major (see module comment); the external contract is
    unchanged: (B, L) int ids in, (B, L, D) float32 hidden states out."""

    config: HyenaConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, channel_major_out: bool = False) -> jnp.ndarray:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        emb = nn.Embed(
            cfg.padded_vocab_size,
            cfg.d_model,
            name="word_embeddings",
            dtype=dtype,
        )(input_ids)
        r = jnp.moveaxis(emb, -1, 0)  # (D, B, L): one layout pass in
        for i in range(cfg.n_layer):
            r = HyenaBlock(cfg, name=f"block_{i}")(r)
        if channel_major_out:
            # For the channel-major head: skip the layout pass out and emit
            # compute_dtype — the same rounding the (B, L, D) head's own
            # input cast performed on the f32 norm output.
            return LayerNormCM(epsilon=cfg.layer_norm_epsilon, name="ln_f", out_dtype=dtype)(r)
        # Final norm in float32: the head consumes an f32 hidden state.
        h = LayerNormCM(epsilon=cfg.layer_norm_epsilon, name="ln_f", out_dtype=jnp.float32)(r)
        return jnp.moveaxis(h, 0, -1)  # (B, L, D): one layout pass out
