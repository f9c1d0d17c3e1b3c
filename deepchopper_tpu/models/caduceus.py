"""Caduceus-style bidirectional Mamba backbone, re-derived in JAX for TPU.

The reference consumes `kuleshov-group/caduceus-{ph,ps}_seqlen-131k_d_model-256_
n_layer-16` via `AutoModel` (reference: deepchopper/models/llm/caduceus.py:5-55).
This is a from-scratch TPU-first re-derivation of that architecture family:
Mamba selective-SSM blocks made bidirectional by weight-tied application to the
flipped sequence ("ph", parameter-homologous), stacked with RMSNorm residuals.

TPU-first notes:
* The selective scan runs as `jax.lax.associative_scan` over the sequence axis
  — the parallel-prefix formulation XLA schedules well on TPU, instead of the
  reference ecosystem's custom CUDA recurrence kernel.
* The short depthwise conv reuses the shift-FMA form (models.hyena).
* Projections run in bfloat16 on the MXU; the scan stays float32 for
  stability of the exp-discretized state.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import CaduceusConfig
from .hyena import short_depthwise_conv


def _combine(x, y):
    a1, b1 = x
    a2, b2 = y
    return a2 * a1, a2 * b1 + b2


def selective_scan(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: jnp.ndarray,
    chunk: int | None = None,
) -> jnp.ndarray:
    """Parallel selective SSM scan.

    u: (B, L, D_in); delta: (B, L, D_in); A: (D_in, N); B, C: (B, L, N);
    D: (D_in,). Returns (B, L, D_in).

    h[t] = exp(delta[t] A) h[t-1] + delta[t] B[t] u[t];  y[t] = C[t]·h[t] + D u[t]
    computed with an associative scan over composed affine maps (a, b):
    (a2, b2) ∘ (a1, b1) = (a2*a1, a2*b1 + b2).

    `chunk` bounds live memory: the flat associative scan materializes O(L)
    (B, L, D_in, N) float32 intermediates — at the Caduceus family's 131k
    context that is tens of GB for a single read, far beyond HBM. With
    `chunk=c`, a `lax.scan` walks L/c chunks carrying only the (B, D_in, N)
    end-state; within a chunk the scan is still the parallel prefix (exact —
    the affine maps compose associatively across the chunk boundary), so
    live memory is O(c * D_in * N) regardless of L.
    """
    seq_len = u.shape[1]
    da = jnp.einsum("bld,dn->bldn", delta, A)  # (B, L, D, N)
    a = jnp.exp(da)
    b = jnp.einsum("bld,bln,bld->bldn", delta, B, u)

    if chunk is None or seq_len <= chunk:
        _, h = jax.lax.associative_scan(_combine, (a, b), axis=1)
    else:
        if seq_len % chunk:
            # Pad with the IDENTITY affine map (a=1, b=0): padded steps pass
            # the carried state through unchanged, so the valid prefix of the
            # output is exact.
            pad = chunk - seq_len % chunk
            a = jnp.pad(a, ((0, 0), (0, pad), (0, 0), (0, 0)), constant_values=1.0)
            b = jnp.pad(b, ((0, 0), (0, pad), (0, 0), (0, 0)))
        nb, d_in, n = a.shape[0], a.shape[2], a.shape[3]
        ac = a.reshape(nb, -1, chunk, d_in, n)
        bc = b.reshape(nb, -1, chunk, d_in, n)

        def step(h0, ab):
            ai, bi = ab  # (B, chunk, D, N)
            ca, cb = jax.lax.associative_scan(_combine, (ai, bi), axis=1)
            h = ca * h0[:, None] + cb
            return h[:, -1], h

        h0 = jnp.zeros((nb, d_in, n), a.dtype)
        _, hs = jax.lax.scan(step, h0, (ac.swapaxes(0, 1), bc.swapaxes(0, 1)))
        h = hs.swapaxes(0, 1).reshape(nb, -1, d_in, n)[:, :seq_len]

    y = jnp.einsum("bldn,bln->bld", h, C)
    return y + u * D[None, None, :]


def dispatch_selective_scan(u, delta, A, Bp, Cp, D, cfg, reverse: bool = False) -> jnp.ndarray:
    """Pick the scan implementation.

    On TPU the VMEM-resident Pallas kernel (ops/pallas_scan.py) runs the
    recurrence in one HBM pass — measured ~20x the associative-scan
    formulation, which materializes (B, L, D_in, N) affine maps and is
    HBM-bound (docs/performance.md). Off-TPU (and under
    DEEPCHOPPER_SCAN_IMPL=xla) the chunked associative scan runs instead.

    `reverse=True` scans right-to-left — the kernel reads chunks
    back-to-front (no flip copies); the XLA fallback flips around the scan.
    """
    import os

    if (
        jax.default_backend() == "tpu"
        and os.environ.get("DEEPCHOPPER_SCAN_IMPL", "pallas") == "pallas"
    ):
        from ..ops.pallas_scan import selective_scan_pallas

        return selective_scan_pallas(u, delta, A, Bp, Cp, D, reverse=reverse)
    if reverse:
        y = selective_scan(
            jnp.flip(u, 1), jnp.flip(delta, 1), A, jnp.flip(Bp, 1), jnp.flip(Cp, 1),
            D, chunk=cfg.scan_chunk,
        )  # fmt: skip
        return jnp.flip(y, 1)
    return selective_scan(u, delta, A, Bp, Cp, D, chunk=cfg.scan_chunk)


def short_depthwise_conv_rev(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Mirror of `short_depthwise_conv`: flip(conv(flip(x))) without flips.

    y[t] = sum_j k[j] * x[t + (taps-1) - j]  (anti-causal: right pad, taps
    mirrored). Used by the reverse direction of the bidirectional mixer so
    the whole reverse pass is flip-free end to end.
    x: (B, L, W), kernel: (taps, 1, W).
    """
    taps = kernel.shape[0]
    seq_len = x.shape[1]
    kernel = kernel.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (0, taps - 1), (0, 0)))
    out = xp[:, 0:seq_len, :] * kernel[taps - 1, 0][None, None, :]
    for m in range(1, taps):
        out = out + xp[:, m : m + seq_len, :] * kernel[taps - 1 - m, 0][None, None, :]
    return out + bias[None, None, :].astype(x.dtype)


class MambaMixer(nn.Module):
    """One Mamba selective-SSM mixer (d_model -> d_model).

    `reverse=True` runs the mixer as if on the flipped sequence WITHOUT any
    flips: the per-position ops (projections, gating) commute with flipping,
    so only the short conv (mirrored) and the scan (reverse kernel walk)
    differ — the two jnp.flip HBM passes per layer-direction disappear."""

    config: CaduceusConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, reverse: bool = False) -> jnp.ndarray:
        cfg = self.config
        d_inner = cfg.d_model * cfg.expand
        dtype = jnp.dtype(cfg.compute_dtype)

        xz = nn.Dense(2 * d_inner, use_bias=False, name="in_proj", dtype=dtype)(
            x.astype(dtype)
        ).astype(jnp.float32)
        xs, z = jnp.split(xz, 2, axis=-1)

        conv_k = self.param(
            "conv1d_kernel", nn.initializers.lecun_normal(), (cfg.d_conv, 1, d_inner), jnp.float32
        )
        conv_b = self.param("conv1d_bias", nn.initializers.zeros, (d_inner,), jnp.float32)
        conv = short_depthwise_conv_rev if reverse else short_depthwise_conv
        xs = jax.nn.silu(conv(xs, conv_k, conv_b))

        # Input-dependent SSM parameters.
        bcdt = nn.Dense(
            2 * cfg.d_state + cfg.dt_rank, use_bias=False, name="x_proj", dtype=dtype
        )(xs.astype(dtype)).astype(jnp.float32)
        dt, Bp, Cp = jnp.split(bcdt, [cfg.dt_rank, cfg.dt_rank + cfg.d_state], axis=-1)
        delta = nn.softplus(nn.Dense(d_inner, name="dt_proj", dtype=jnp.float32)(dt))

        # A is parameterized in log space (negative real spectrum).
        a_log = self.param(
            "A_log",
            lambda _rng, shape: jnp.log(
                jnp.broadcast_to(jnp.arange(1, shape[1] + 1, dtype=jnp.float32), shape)
            ),
            (d_inner, cfg.d_state),
        )
        A = -jnp.exp(a_log)
        D = self.param("D", nn.initializers.ones, (d_inner,), jnp.float32)

        y = dispatch_selective_scan(xs, delta, A, Bp, Cp, D, cfg, reverse=reverse)
        y = y * jax.nn.silu(z)
        return nn.Dense(cfg.d_model, use_bias=False, name="out_proj", dtype=dtype)(
            y.astype(dtype)
        ).astype(jnp.float32)


class BiMambaMixer(nn.Module):
    """Bidirectional Mamba: a mixer applied forward and to the flipped
    sequence, outputs summed.

    With `config.bidirectional_weight_tie` (the "ph", parameter-homologous
    variant) the SAME mixer weights run both directions; without it (the
    "ps" variant, reference family kuleshov-group/caduceus-ps_*,
    deepchopper/models/llm/caduceus.py:5-55) a SEPARATE `mixer_rev`
    parameterizes the reverse pass."""

    config: CaduceusConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mixer = MambaMixer(self.config, name="mixer")
        fwd = mixer(x)
        rev = (
            mixer
            if self.config.bidirectional_weight_tie
            else MambaMixer(self.config, name="mixer_rev")
        )
        # Flip-free reverse pass: mathematically flip(rev(flip(x))) — the
        # mirrored conv + reverse scan compute it without the two jnp.flip
        # HBM round trips per layer-direction.
        bwd = rev(x, reverse=True)
        return fwd + bwd


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(var + self.eps) * scale


class CaduceusBlock(nn.Module):
    config: CaduceusConfig

    @nn.compact
    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        h = RMSNorm(self.config.layer_norm_epsilon, name="norm")(r)
        return r + BiMambaMixer(self.config, name="bimamba")(h)


class CaduceusBackbone(nn.Module):
    """Embedding -> n_layer bidirectional Mamba blocks -> RMSNorm; (B, L, D)."""

    config: CaduceusConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        r = nn.Embed(cfg.padded_vocab_size, cfg.d_model, name="word_embeddings",
                     dtype=jnp.float32)(input_ids)
        for i in range(cfg.n_layer):
            r = CaduceusBlock(cfg, name=f"block_{i}")(r)
        return RMSNorm(cfg.layer_norm_epsilon, name="norm_f")(r)
