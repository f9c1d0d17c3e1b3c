"""Fused Pallas TPU kernel for the Hyena causal FFT convolution.

The XLA-level matmul FFT (`ops/fft.py`) is HBM-bound: every four-step stage
round-trips (B, N, D)-sized float32 intermediates through HBM (~12 GB of
traffic per call at the flagship shapes). This kernel performs the entire
pad -> FFT -> pointwise(k_hat) -> iFFT chain in VMEM, one channel per grid
step, so HBM traffic drops to reading v and writing y once (~270 MB per
call) and the MXU does the DFT matmuls from VMEM.

Mosaic constraints shape the math (established by probing on hardware):
* contractions lower only as standard (batched) matmuls — middle-axis
  einsums are rejected and `swapaxes` crashes the compiler when the
  resulting lane dimension is < 64. The four-step FFT is therefore written
  TRANSPOSE-FREE: the stage that contracts the middle axis left-multiplies
  by the DFT matrix broadcast over the batch, `(B, n2, h) @ (B, h, n1)`,
  keeping the minor digit n1 in the lane dimension throughout;
* the forward transform emits the frequency domain in SCRAMBLED digit order
  (k = k2 + n2*k1 stored at (k2, k1)) and the inverse consumes exactly that
  order, so no bit-reversal permutation is ever materialized — the filter
  spectrum `k_hat` is precomputed in the same scrambled layout;
* zero-padding from L to N=2L is never materialized: with n = j1 + n1*j2
  the padded half is exactly j2 >= n2/2, so the forward's first stage
  contracts only the first n2/2 columns of DFT_{n2} and the inverse's last
  stage computes only the first n2/2 output rows (halves both stages);
* the Hyena skip term y += v*bias is folded into the filter as a delta tap
  (k[0] += bias), which is exact for convolution.

Four-step factorization (N = n1*n2, input digit n = j1 + n1*j2, output
digit k = k2 + n2*k1; 1/N folded into the filter spectrum):

  X[k2 + n2*k1] = sum_j1 W_n1^{j1 k1} * W_N^{j1 k2} * sum_j2 W_n2^{j2 k2} x[j1 + n1*j2]
  y[j1 + n1*j2] = (1/N) sum_k2 W_n2^{-j2 k2} * W_N^{-j1 k2} * sum_k1 W_n1^{-j1 k1} Y[(k2,k1)]

Reference capability this accelerates: the HyenaDNA long-conv operator the
reference consumes via torch `AutoModel` (reference:
deepchopper/models/llm/hyena.py:8-41). The architecture is re-derived; this
file is TPU-native engineering with no reference counterpart.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Smallest padded length the kernel supports (bucket width 256); shorter
# inputs fall back to the XLA matmul FFT.
MIN_N = 512
# Largest: beyond this the per-channel DFT tables ((n2, n2/2) float32 pairs)
# outgrow VMEM; the 160k-1M context configs fall back to the matmul FFT.
MAX_N = 65536


# Read once at import: _tables() is lru_cached on n alone and jit caches
# ignore env vars entirely, so flipping the knob mid-process would silently
# mix factorizations between cached tables and freshly-traced kernels.
_FORCED_N1 = int(os.environ.get("DEEPCHOPPER_FFT_N1") or 0)

# Matmul precision for the in-kernel DFT stages. Read ONCE at import (flipping
# the env var mid-process would silently have no effect on already-traced
# kernels — see ADVICE r3); call sites may also pass `precision=` explicitly,
# which always wins. "bfloat16" (default) runs single-pass MXU matmuls — rel
# err ~5e-3 on the assembled conv, the same order as the bf16 activation
# stream the backbone already runs between ops, and measured 1.7x whole-model
# throughput; per-base labels on a trained model are unchanged (margins >>
# noise, and majority-vote smoothing absorbs isolated flips). "float32"
# forces multi-pass exact dots (~2e-7) for numerical debugging; Mosaic
# rejects intermediate precisions.
DEFAULT_PRECISION = os.environ.get("DEEPCHOPPER_FFT_PRECISION", "bfloat16")


def _split(n: int) -> tuple[int, int]:
    """Factor N = n1 * n2 with the minor digit n1 sized for the lane dim.

    The four-step math holds for ANY factorization, so N only needs to be a
    multiple of 512 (n1=64 with n2 a multiple of 8) — every bucket width
    (multiples of 256) runs an exact-length transform, no pow2 padding.
    n1 prefers 128 (the MXU contraction width; a 64-wide contraction runs at
    half utilization, outweighing its ~2x lower MAC count — measured on v5e),
    falling back to 64 when n2 = n/128 would not be a multiple of 8 (the
    f32 sublane tile — the kernel's table layouts assume 8-aligned n2).
    `DEEPCHOPPER_FFT_N1` (read once at import) forces a specific n1 for
    tuning.
    """
    if not (MIN_N <= n <= MAX_N) or n % 512 != 0:
        raise ValueError(
            f"pallas FFT conv requires {MIN_N} <= N <= {MAX_N} with N % 512 == 0, got {n}"
        )
    if _FORCED_N1:
        n1 = _FORCED_N1
        if n % n1 == 0 and (n // n1) % 2 == 0:
            return n1, n // n1
    if n % 128 == 0 and (n // 128) % 8 == 0:
        return 128, n // 128
    return 64, n // 64


@functools.lru_cache(maxsize=32)
def _tables(n: int) -> dict[str, np.ndarray]:
    """All DFT/twiddle tables for length-N forward+inverse, float32 numpy.

    Layouts match the kernel's batched-matmul orientation:
      c2h/s2h:   (n2, n2/2) forward stage 1 (left-mult), non-padded j2 only
      ctw/stw:   (n2, n1)   forward twiddle W_N^{j1 k2} at (k2, j1)
      c1/s1:     (n1, n1)   forward stage 2 DFT_{n1} (right-mult, [j1, k1])
      ic1/is1:   (n1, n1)   inverse stage 1 IDFT_{n1} (right-mult, [k1, j1])
      ictw/istw: (n2, n1)   inverse twiddle W_N^{-j1 k2} at (k2, j1)
      ic2h/is2h: (n2/2, n2) inverse stage 2 (left-mult), output j2 < n2/2
    """
    n1, n2 = _split(n)
    h = n2 // 2

    j2 = np.arange(n2)
    k2 = np.arange(n2)
    j1 = np.arange(n1)
    k1 = np.arange(n1)

    a2 = -2.0 * np.pi / n2 * (k2[:, None] * j2[None, :h])  # (n2, h)
    atw = -2.0 * np.pi / n * (k2[:, None] * j1[None, :])  # (n2, n1)
    a1 = -2.0 * np.pi / n1 * (j1[:, None] * k1[None, :])  # (n1, n1)
    ia1 = 2.0 * np.pi / n1 * (k1[:, None] * j1[None, :])  # (n1, n1)
    iatw = 2.0 * np.pi / n * (k2[:, None] * j1[None, :])  # (n2, n1)
    ia2 = 2.0 * np.pi / n2 * (j2[:h, None] * k2[None, :])  # (h, n2)

    return {
        "c2h": np.cos(a2).astype(np.float32),
        "s2h": np.sin(a2).astype(np.float32),
        "ctw": np.cos(atw).astype(np.float32),
        "stw": np.sin(atw).astype(np.float32),
        "c1": np.cos(a1).astype(np.float32),
        "s1": np.sin(a1).astype(np.float32),
        "ic1": np.cos(ia1).astype(np.float32),
        "is1": np.sin(ia1).astype(np.float32),
        "ictw": np.cos(iatw).astype(np.float32),
        "istw": np.sin(iatw).astype(np.float32),
        "ic2h": np.cos(ia2).astype(np.float32),
        "is2h": np.sin(ia2).astype(np.float32),
    }


def khat_scrambled(
    k: jnp.ndarray, n: int, bias: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Filter spectrum in the kernel's scrambled (k2, k1) layout, scaled 1/N.

    k: (L, D) float32 filter taps. Returns (kr, ki), each (D, n2, n1).
    Computed with the XLA matmul FFT (tiny: D rows), then digit-permuted:
    natural flat index k = k2 + n2*k1 lives at reshape(n1, n2)[k1, k2].

    `bias` (D,), if given, is folded in as a delta tap (k[0] += bias): the
    Hyena skip term y += v*bias is exactly convolution with bias*delta.
    """
    from .fft import matmul_fft

    n1, n2 = _split(n)
    seq_len, d = k.shape
    k32 = k.astype(jnp.float32)
    if bias is not None:
        k32 = k32.at[0].add(bias.astype(jnp.float32))
    kt = jnp.pad(k32.T, ((0, 0), (0, n - seq_len)))  # (D, N)
    fr, fi = matmul_fft(kt)
    fr = fr.reshape(d, n1, n2).swapaxes(-1, -2) / n
    fi = fi.reshape(d, n1, n2).swapaxes(-1, -2) / n
    return fr, fi


def _mm_helpers(b: int, precision: str):
    """The two Mosaic-safe matmul orientations (see module docstring).

    rmm: (B, n2, X) @ (X, Y) -> (B, n2, Y) — right-mult, contracts the lane dim.
    lmm: (Y, X) [left-broadcast over B] @ (B, X, n1) -> (B, Y, n1) — contracts
         the MIDDLE axis without any transpose.
    `precision` is passed explicitly (see DEFAULT_PRECISION).
    """

    def rmm(a, m):
        # Merge the leading (B, n2) dims so this is ONE (B*n2, X) @ (X, Y)
        # matmul instead of B batched small ones — Mosaic lowers the batched
        # form as per-batch matmul macros (slow to run AND to compile).
        bb, r, c = a.shape
        y = jax.lax.dot_general(
            a.reshape(bb * r, c), m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        return y.reshape(bb, r, m.shape[1])

    def lmm(m, a):
        mb = jnp.broadcast_to(m, (b, *m.shape))
        return jax.lax.dot_general(
            mb, a, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        )

    return rmm, lmm


def _conv_kernel(
    v_ref,
    kr_ref,
    ki_ref,
    c2h_ref,
    s2h_ref,
    ctw_ref,
    stw_ref,
    c1_ref,
    s1_ref,
    ic1_ref,
    is1_ref,
    ictw_ref,
    istw_ref,
    ic2h_ref,
    is2h_ref,
    out_ref,
    *,
    precision: str,
):
    """One channel: y = causal_conv(v, k + bias*delta)[:L], fully in VMEM.

    v_ref block is pre-shaped (1, B, n2/2, n1) OUTSIDE the kernel: Mosaic
    cannot lower an in-kernel reshape that narrows the lane dim below 128.
    """
    xh = v_ref[0]  # (B, h, n1) float32, [j2, j1]: n = j1 + n1*j2, pad is j2 >= h
    b, h, n1 = xh.shape
    n2 = 2 * h

    rmm, lmm = _mm_helpers(b, precision)

    # Forward stage 1: contract j2 over the non-padded half (left-mult).
    tr = lmm(c2h_ref[:], xh)  # (B, n2, n1) [k2, j1]
    ti = lmm(s2h_ref[:], xh)

    # Forward twiddle W_N^{j1 k2} at (k2, j1).
    ctw, stw = ctw_ref[:], stw_ref[:]
    tr, ti = tr * ctw - ti * stw, tr * stw + ti * ctw

    # Forward stage 2: contract j1 (right-mult) -> scrambled (B, n2, n1) [k2, k1].
    c1, s1 = c1_ref[:], s1_ref[:]
    xr = rmm(tr, c1) - rmm(ti, s1)
    xi = rmm(tr, s1) + rmm(ti, c1)

    # Pointwise filter product in scrambled order (1/N folded into k_hat).
    kr, ki = kr_ref[0], ki_ref[0]
    yr = xr * kr - xi * ki
    yi = xr * ki + xi * kr

    # Inverse stage 1: contract k1 (right-mult) -> (B, n2, n1) [k2, j1].
    ic1, is1 = ic1_ref[:], is1_ref[:]
    sr = rmm(yr, ic1) - rmm(yi, is1)
    si = rmm(yr, is1) + rmm(yi, ic1)

    # Inverse twiddle W_N^{-j1 k2} at (k2, j1).
    ictw, istw = ictw_ref[:], istw_ref[:]
    sr, si = sr * ictw - si * istw, sr * istw + si * ictw

    # Inverse stage 2: contract k2 (left-mult), real part, output rows j2 < h
    # only -> (B, h, n1) [j2, j1] = natural order (reshaped to (B, L) outside).
    out_ref[0] = lmm(ic2h_ref[:], sr) - lmm(is2h_ref[:], si)


def fft_causal_conv_pallas(
    v: jnp.ndarray,
    k: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    interpret: bool | None = None,
    precision: str | None = None,
) -> jnp.ndarray:
    """Causal long conv y = (v * k)[:L] + v*bias as one fused Pallas kernel.

    v: (B, L, D) float32, k: (L, D), bias: (D,) — the same contract as
    `models.hyena.fft_causal_conv` / `ops.fft.fft_causal_conv_matmul`.
    L must be a power of two >= 256 (bucket widths are). Grid is one step
    per channel; each step's working set lives in VMEM and Mosaic
    double-buffers the HBM reads/writes across steps.

    Differentiable: a custom VJP (below) backprops through the conv math
    directly — Pallas kernels have no automatic reverse rule, which would
    otherwise break training on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _conv_autodiff(v, k, bias, interpret, precision or DEFAULT_PRECISION)


def _fft_causal_conv_pallas_impl(
    v: jnp.ndarray,
    k: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    interpret: bool | None = None,
    precision: str = "bfloat16",
) -> jnp.ndarray:
    batch, seq_len, d_model = v.shape
    n = 2 * seq_len
    n1, n2 = _split(n)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    h = n2 // 2
    v32 = v.astype(jnp.float32)

    # Tile the batch so each grid step's VMEM working set stays bounded:
    # the kernel holds ~6 (bt, n2, n1) f32 intermediates plus 3-pass matmul
    # scratch, so cap bt*n elements (f32[512-row, n=512] batches blew the
    # 16MB scoped-vmem limit once f32-precision dots landed).
    import os

    cap = int(os.environ.get("DEEPCHOPPER_FFT_BT_CAP", "65536"))
    bt = max(1, min(batch, cap // n))
    padded_batch = ((batch + bt - 1) // bt) * bt
    if padded_batch != batch:
        v32 = jnp.pad(v32, ((0, padded_batch - batch), (0, 0), (0, 0)))
    nb = padded_batch // bt

    # (D, B, h, n1): the digit split is pre-shaped host-side (free row-major
    # view) because Mosaic rejects in-kernel reshapes to lane dims < 128.
    vt = jnp.moveaxis(v32, -1, 0).reshape(d_model, padded_batch, h, n1)
    kr, ki = khat_scrambled(k, n, bias)  # (D, n2, n1) each

    t = _tables(n)
    tables = [
        t["c2h"], t["s2h"], t["ctw"], t["stw"], t["c1"], t["s1"],
        t["ic1"], t["is1"], t["ictw"], t["istw"], t["ic2h"], t["is2h"],
    ]  # fmt: skip

    per_block = pl.BlockSpec(
        (1, bt, h, n1), lambda d, b: (d, b, 0, 0), memory_space=pltpu.VMEM
    )
    khat_spec = pl.BlockSpec((1, n2, n1), lambda d, b: (d, 0, 0), memory_space=pltpu.VMEM)
    table_spec = [
        pl.BlockSpec(a.shape, lambda d, b: (0, 0), memory_space=pltpu.VMEM) for a in tables
    ]

    # MACs: fwd s1 2*(B*n2*h*n1) + fwd s2 4*(B*n2*n1*n1) + inv s1 4 + inv s2 2.
    flops_fft = 2 * d_model * padded_batch * n * (n2 // 2 + 4 * n1)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, precision=precision),
        # b is the fast axis so each channel's filter/tables stay resident
        # across its batch tiles.
        grid=(d_model, nb),
        in_specs=[per_block, khat_spec, khat_spec, *table_spec],
        out_specs=per_block,
        out_shape=jax.ShapeDtypeStruct((d_model, padded_batch, h, n1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_fft,
            bytes_accessed=2 * d_model * padded_batch * seq_len * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(vt, kr, ki, *[jnp.asarray(a) for a in tables])

    y = jnp.moveaxis(out.reshape(d_model, padded_batch, seq_len), 0, -1)  # (B', L, D)
    return y[:batch]


# ---------------------------------------------------------------------------
# Custom VJP: forward = fused Pallas kernel; backward = FFT correlations.
# y_i = sum_{j<=i} v_j k_{i-j} + v_i b  gives
#   dv_j = sum_{i>=j} dy_i k_{i-j} + dy_j b     (correlation with k)
#   dk_t = sum_{B, i>=t} dy_i v_{i-t}           (correlation with v)
#   db_d = sum_{B, L} dy * v
# Both correlations are exact via zero-padded FFTs with a conjugated factor
# (wraparound terms land on the zero padding since k, v are supported on
# [0, L) and N = 2L).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv_autodiff(v, k, bias, interpret, precision):
    return _fft_causal_conv_pallas_impl(v, k, bias, interpret=interpret, precision=precision)


def _conv_fwd(v, k, bias, interpret, precision):
    return (
        _fft_causal_conv_pallas_impl(v, k, bias, interpret=interpret, precision=precision),
        (v, k, bias),
    )


def _conv_bwd(interpret, precision, res, dy):
    v, k, bias = res
    seq_len = v.shape[1]
    n = 2 * seq_len
    dy32 = dy.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    k_f = jnp.fft.rfft(k.astype(jnp.float32), n=n, axis=0)  # (F, D)
    dy_f = jnp.fft.rfft(dy32, n=n, axis=1)  # (B, F, D)
    v_f = jnp.fft.rfft(v32, n=n, axis=1)
    dv = (
        jnp.fft.irfft(dy_f * jnp.conj(k_f)[None], n=n, axis=1)[:, :seq_len]
        + dy32 * bias[None, None, :]
    )
    dk = jnp.fft.irfft(jnp.sum(dy_f * jnp.conj(v_f), axis=0), n=n, axis=0)[:seq_len]
    dbias = jnp.sum(dy32 * v32, axis=(0, 1))
    return dv.astype(v.dtype), dk.astype(k.dtype), dbias.astype(bias.dtype)


_conv_autodiff.defvjp(_conv_fwd, _conv_bwd)


# ---------------------------------------------------------------------------
# Fused gated conv, channel-major: y = (conv((v*x1), k) + (v*x1)*bias) * x2.
#
# The round-3 kernel fused only the FFT conv; the pre-gate (v*x1), post-gate
# (y*x2), the float32 casts, and the channel-major transposes each round-
# tripped a (B, L, D) activation through HBM per layer on an HBM-bound model.
# This kernel takes the short-conv output `uc` ALREADY channel-major
# ((3D, B, L) — the backbone produces that layout natively, see
# models/hyena.py) in the compute dtype (bf16 on the fast path), performs
# gate -> FFT conv -> gate entirely in VMEM, and writes the gated output in
# the compute dtype: HBM traffic for the whole gated-conv stage drops from
# ~9 KB/token/layer (f32 transposes + 3 elementwise passes + f32 kernel IO)
# to ~2 KB/token/layer (bf16 in x3 slices, bf16 out).
#
# Reference capability this accelerates: the HyenaDNA gated long-conv
# operator (reference: deepchopper/models/llm/hyena.py:29-41). TPU-native
# engineering with no reference counterpart.
# ---------------------------------------------------------------------------


def _gated_kernel(
    x2_ref,
    x1_ref,
    v_ref,
    kr_ref,
    ki_ref,
    c2h_ref,
    s2h_ref,
    ctw_ref,
    stw_ref,
    c1_ref,
    s1_ref,
    ic1_ref,
    is1_ref,
    ictw_ref,
    istw_ref,
    ic2h_ref,
    is2h_ref,
    out_ref,
    *,
    precision: str,
):
    """One channel: out = (causal_conv(v*x1, k + bias*delta)[:L]) * x2.

    Refs are (1, B, h, n1) blocks of the channel-major digit layout; the
    gates run on the VPU in float32, the DFT stages on the MXU.
    """
    n_group = v_ref.shape[0]
    for g in range(n_group):  # static unroll: one FFT-conv per grouped channel
        xh = (v_ref[g] * x1_ref[g]).astype(jnp.float32)  # (B, h, n1)
        b, h, n1 = xh.shape

        rmm, lmm = _mm_helpers(b, precision)

        tr = lmm(c2h_ref[:], xh)
        ti = lmm(s2h_ref[:], xh)

        ctw, stw = ctw_ref[:], stw_ref[:]
        tr, ti = tr * ctw - ti * stw, tr * stw + ti * ctw

        c1, s1 = c1_ref[:], s1_ref[:]
        xr = rmm(tr, c1) - rmm(ti, s1)
        xi = rmm(tr, s1) + rmm(ti, c1)

        kr, ki = kr_ref[g], ki_ref[g]
        yr = xr * kr - xi * ki
        yi = xr * ki + xi * kr

        ic1, is1 = ic1_ref[:], is1_ref[:]
        sr = rmm(yr, ic1) - rmm(yi, is1)
        si = rmm(yr, is1) + rmm(yi, ic1)

        ictw, istw = ictw_ref[:], istw_ref[:]
        sr, si = sr * ictw - si * istw, sr * istw + si * ictw

        y = lmm(ic2h_ref[:], sr) - lmm(is2h_ref[:], si)  # (B, h, n1) natural order
        out_ref[g] = (y * x2_ref[g].astype(jnp.float32)).astype(out_ref.dtype)


def _gated_conv_cm_impl(
    uc: jnp.ndarray,
    k: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    interpret: bool,
    precision: str,
) -> jnp.ndarray:
    """uc: (3D, B, L) channel-major [x2 | x1 | v], k: (L, D), bias: (D,).

    Returns (D, B, L) in uc's dtype. The (B, L) -> (B, h, n1) digit split is
    a free row-major reshape in this layout — no transpose passes at all.
    DEEPCHOPPER_FFT_LAYOUT=v2 selects the (C, h, B, n1) block layout
    (single-matmul stages, whole-tile bf16 blocks) instead.
    """
    if os.environ.get("DEEPCHOPPER_FFT_LAYOUT", "v1") == "v2":
        # v2 blocks tile (bt, n1): bt < 8 (large widths at the default cap)
        # violates the sublane rule — stay on v1 there. Measured on v5e the
        # v2 transpose passes outweigh its matmul savings (7.9 vs 5.9 ms at
        # (256, 1024)), so v2 remains an experiment knob, not the default.
        cap = int(os.environ.get("DEEPCHOPPER_FFT_BT_CAP", "65536"))
        if min(uc.shape[1], cap // (2 * uc.shape[2])) >= 8:
            return _gated_conv_cm_impl_v2(
                uc, k, bias, interpret=interpret, precision=precision
            )
    width, batch, seq_len = uc.shape
    d_model = width // 3
    n = 2 * seq_len
    n1, n2 = _split(n)
    h = n2 // 2

    cap = int(os.environ.get("DEEPCHOPPER_FFT_BT_CAP", "65536"))
    bt = max(1, min(batch, cap // n))
    padded_batch = ((batch + bt - 1) // bt) * bt
    if padded_batch != batch:
        uc = jnp.pad(uc, ((0, 0), (0, padded_batch - batch), (0, 0)))
    nb = padded_batch // bt

    # Channel grouping: each grid step DMAs and processes `cg` channels, so
    # per-step dispatch/DMA-latency overhead amortizes over cg FFT convs
    # (the per-channel VMEM intermediates are unchanged — the unrolled loop
    # reuses them).
    cg = int(os.environ.get("DEEPCHOPPER_FFT_CG", "8"))
    while d_model % cg:
        cg //= 2
    cg = max(cg, 1)

    ucd = uc.reshape(width, padded_batch, h, n1)  # free: row-major digit split
    kr, ki = khat_scrambled(k, n, bias)  # (D, n2, n1) each

    t = _tables(n)
    tables = [
        t["c2h"], t["s2h"], t["ctw"], t["stw"], t["c1"], t["s1"],
        t["ic1"], t["is1"], t["ictw"], t["istw"], t["ic2h"], t["is2h"],
    ]  # fmt: skip

    blk = (cg, bt, h, n1)
    x2_spec = pl.BlockSpec(blk, lambda d, b: (d, b, 0, 0), memory_space=pltpu.VMEM)
    x1_spec = pl.BlockSpec(
        blk, lambda d, b, _G=d_model // cg: (d + _G, b, 0, 0), memory_space=pltpu.VMEM
    )
    v_spec = pl.BlockSpec(
        blk, lambda d, b, _G=d_model // cg: (d + 2 * _G, b, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(blk, lambda d, b: (d, b, 0, 0), memory_space=pltpu.VMEM)
    khat_spec = pl.BlockSpec((cg, n2, n1), lambda d, b: (d, 0, 0), memory_space=pltpu.VMEM)
    table_spec = [
        pl.BlockSpec(a.shape, lambda d, b: (0, 0), memory_space=pltpu.VMEM) for a in tables
    ]

    flops_fft = 2 * d_model * padded_batch * n * (n2 // 2 + 4 * n1)
    itemsize = jnp.dtype(uc.dtype).itemsize
    out = pl.pallas_call(
        functools.partial(_gated_kernel, precision=precision),
        grid=(d_model // cg, nb),
        in_specs=[x2_spec, x1_spec, v_spec, khat_spec, khat_spec, *table_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((d_model, padded_batch, h, n1), uc.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_fft,
            bytes_accessed=4 * d_model * padded_batch * seq_len * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ucd, ucd, ucd, kr, ki, *[jnp.asarray(a) for a in tables])

    return out.reshape(d_model, padded_batch, seq_len)[:, :batch]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gated_autodiff(uc, k, bias, interpret, precision):
    return _gated_conv_cm_impl(uc, k, bias, interpret=interpret, precision=precision)


def _gated_fwd(uc, k, bias, interpret, precision):
    y = _gated_conv_cm_impl(uc, k, bias, interpret=interpret, precision=precision)
    return y, (uc, k, bias)


def _gated_bwd(interpret, precision, res, dy):
    """Backward through gate -> conv -> gate via FFT correlations (XLA).

    With w = v*x1 and z = conv_k(w) + w*bias (all f32):
      dz  = dy * x2            dx2 = dy * z   (z recomputed, not saved)
      dw  = corr_k(dz) + dz*b  dv  = dw * x1  dx1 = dw * v
      dk  = corr over (B) of (dz, w)          db  = sum dz * w
    """
    uc, k, bias = res
    d_model = k.shape[1]
    seq_len = uc.shape[2]
    n = 2 * seq_len
    x2 = uc[:d_model].astype(jnp.float32)
    x1 = uc[d_model : 2 * d_model].astype(jnp.float32)
    v = uc[2 * d_model :].astype(jnp.float32)
    dy32 = dy.astype(jnp.float32)

    w = v * x1  # (D, B, L)
    k_f = jnp.fft.rfft(k.astype(jnp.float32).T, n=n, axis=-1)  # (D, F)
    w_f = jnp.fft.rfft(w, n=n, axis=-1)  # (D, B, F)
    z = (
        jnp.fft.irfft(w_f * k_f[:, None, :], n=n, axis=-1)[..., :seq_len]
        + w * bias[:, None, None]
    )
    dz = dy32 * x2
    dx2 = dy32 * z
    dz_f = jnp.fft.rfft(dz, n=n, axis=-1)
    dw = (
        jnp.fft.irfft(dz_f * jnp.conj(k_f)[:, None, :], n=n, axis=-1)[..., :seq_len]
        + dz * bias[:, None, None]
    )
    dv = dw * x1
    dx1 = dw * v
    dk = jnp.fft.irfft(jnp.sum(dz_f * jnp.conj(w_f), axis=1), n=n, axis=-1)[..., :seq_len]
    dbias = jnp.sum(dz * w, axis=(1, 2))
    duc = jnp.concatenate([dx2, dx1, dv], axis=0).astype(uc.dtype)
    return duc, dk.T.astype(k.dtype), dbias.astype(bias.dtype)


_gated_autodiff.defvjp(_gated_fwd, _gated_bwd)


def gated_fft_conv_cm(
    uc: jnp.ndarray,
    k: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    interpret: bool | None = None,
    precision: str | None = None,
) -> jnp.ndarray:
    """Fused gate+conv+gate, channel-major (see _gated_conv_cm_impl).

    uc: (3D, B, L) [x2 | x1 | v] in compute dtype, k: (L, D), bias: (D,).
    Returns (D, B, L) in uc's dtype. Differentiable (custom VJP above).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _gated_autodiff(uc, k, bias, interpret, precision or DEFAULT_PRECISION)


# ---------------------------------------------------------------------------
# Full mixer-conv fusion: short depthwise conv + gate + FFT conv + gate.
#
# One further HBM round-trip eliminated: the kernel consumes the in_proj
# output `proj` DIRECTLY (pre-short-conv) and applies the 3-tap depthwise
# conv in VMEM. A sequence shift in the (j2, j1) digit layout is a lane roll
# plus a row roll for the lanes that wrap a row boundary:
#   x[n-s] at (j2, j1):  j1 >= s -> (j2, j1-s);  j1 < s -> (j2-1, n1-s+j1)
# i.e. roll(lane, s) everywhere, and additionally roll(row, 1) for lanes
# < s; positions n < s read zero padding. Enabled in the backbone with
# DEEPCHOPPER_FUSE_SHORT=1 (off by default until measured faster on the
# target chip).
# ---------------------------------------------------------------------------


def _shifted(x, s: int):
    """x[n-s] in digit layout (..., rows, lanes); zero for n < s."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=x.ndim - 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=x.ndim - 2)
    r = pltpu.roll(x, s, axis=x.ndim - 1)
    rr = pltpu.roll(r, 1, axis=x.ndim - 2)
    y = jnp.where(lane < s, rr, r)
    return jnp.where((row == 0) & (lane < s), jnp.zeros_like(y), y)


def _mixer_kernel(
    p2_ref,
    p1_ref,
    pv_ref,
    ks_ref,
    bs_ref,
    kr_ref,
    ki_ref,
    c2h_ref,
    s2h_ref,
    ctw_ref,
    stw_ref,
    c1_ref,
    s1_ref,
    ic1_ref,
    is1_ref,
    ictw_ref,
    istw_ref,
    ic2h_ref,
    is2h_ref,
    out_ref,
    *,
    precision: str,
    batch_major: bool = False,
):
    """Per grouped channel: short conv (3 gates) -> gate -> FFT conv -> gate.

    p*_ref: (cg, B, h, n1) raw in_proj digits for x2/x1/v channels — or
    (B, cg, h, n1) when `batch_major` (the layout XLA's surrounding matmul
    fusions prefer; see _mixer_impl). ks_ref: (3, cg, 3) taps
    [gate, channel, tap] (tap t multiplies x[n-(2-t)] for taps=3, matching
    short_depthwise_conv). bs_ref: (3, cg) biases.
    """
    n_group = pv_ref.shape[1] if batch_major else pv_ref.shape[0]
    taps = ks_ref.shape[2]

    def sconv(ref, gate: int, g: int):
        x = (ref[:, g] if batch_major else ref[g]).astype(jnp.float32)  # (B, h, n1)
        out = x * ks_ref[gate, g, taps - 1]
        for t in range(taps - 1):
            out = out + _shifted(x, taps - 1 - t) * ks_ref[gate, g, t]
        return out + bs_ref[gate, g, 0]

    for g in range(n_group):
        x2 = sconv(p2_ref, 0, g)
        x1 = sconv(p1_ref, 1, g)
        v = sconv(pv_ref, 2, g)
        xh = v * x1
        b, h, n1 = xh.shape

        rmm, lmm = _mm_helpers(b, precision)

        tr = lmm(c2h_ref[:], xh)
        ti = lmm(s2h_ref[:], xh)
        ctw, stw = ctw_ref[:], stw_ref[:]
        tr, ti = tr * ctw - ti * stw, tr * stw + ti * ctw
        c1, s1 = c1_ref[:], s1_ref[:]
        xr = rmm(tr, c1) - rmm(ti, s1)
        xi = rmm(tr, s1) + rmm(ti, c1)
        kr, ki = kr_ref[g], ki_ref[g]
        yr = xr * kr - xi * ki
        yi = xr * ki + xi * kr
        ic1, is1 = ic1_ref[:], is1_ref[:]
        sr = rmm(yr, ic1) - rmm(yi, is1)
        si = rmm(yr, is1) + rmm(yi, ic1)
        ictw, istw = ictw_ref[:], istw_ref[:]
        sr, si = sr * ictw - si * istw, sr * istw + si * ictw
        y = lmm(ic2h_ref[:], sr) - lmm(is2h_ref[:], si)
        if batch_major:
            out_ref[:, g] = (y * x2).astype(out_ref.dtype)
        else:
            out_ref[g] = (y * x2).astype(out_ref.dtype)


def mixer_reference_xla(proj, k_short, b_short, k_long, bias):
    """Composed XLA reference of the fused mixer conv (same float32 math).

    proj: (3D, B, L) [x2|x1|v] raw in_proj output; k_short: (taps, 1, 3D);
    b_short: (3D,); k_long: (L, D); bias: (D,). Returns (D, B, L) in
    proj's dtype. Also the autodiff body for the fused kernel's VJP.
    """
    d_model = k_long.shape[1]
    seq_len = proj.shape[2]
    n = 2 * seq_len
    taps = k_short.shape[0]
    p32 = proj.astype(jnp.float32)
    xp = jnp.pad(p32, ((0, 0), (0, 0), (taps - 1, 0)))
    uc = xp[:, :, 0:seq_len] * k_short[0, 0][:, None, None]
    for t in range(1, taps):
        uc = uc + xp[:, :, t : t + seq_len] * k_short[t, 0][:, None, None]
    uc = uc + b_short[:, None, None]
    x2, x1, v = uc[:d_model], uc[d_model : 2 * d_model], uc[2 * d_model :]
    w = v * x1
    k_f = jnp.fft.rfft(k_long.astype(jnp.float32).T, n=n, axis=-1)  # (D, F)
    w_f = jnp.fft.rfft(w, n=n, axis=-1)
    z = (
        jnp.fft.irfft(w_f * k_f[:, None, :], n=n, axis=-1)[..., :seq_len]
        + w * bias[:, None, None]
    )
    return (z * x2).astype(proj.dtype)


def mixer_reference_mm(proj, k_short, b_short, k_long, bias):
    """Same math as `mixer_reference_xla` with the long conv on the MXU
    four-step (ops.fft.fft_causal_conv_matmul) instead of jnp.fft.

    This is the TRAINING backward's recompute body: autodiff through it is
    all dot_generals (MXU) — measured much faster than differentiating the
    jnp.fft formulation on TPU (see TRAIN_PROFILE.json). The jnp.fft
    reference stays as the precision oracle for tests.
    """
    from .fft import fft_causal_conv_matmul

    d_model = k_long.shape[1]
    taps = k_short.shape[0]
    p32 = proj.astype(jnp.float32)
    xp = jnp.pad(p32, ((0, 0), (0, 0), (taps - 1, 0)))
    seq_len = proj.shape[2]
    uc = xp[:, :, 0:seq_len] * k_short[0, 0][:, None, None]
    for t in range(1, taps):
        uc = uc + xp[:, :, t : t + seq_len] * k_short[t, 0][:, None, None]
    uc = uc + b_short[:, None, None]
    x2, x1, v = uc[:d_model], uc[d_model : 2 * d_model], uc[2 * d_model :]
    w = v * x1  # (D, B, L)
    z = fft_causal_conv_matmul(jnp.moveaxis(w, 0, -1), k_long.astype(jnp.float32), bias)
    return (jnp.moveaxis(z, -1, 0) * x2).astype(proj.dtype)


def _mixer_impl(proj, k_short, b_short, k_long, bias, *, interpret, precision, batch_major=False):
    if batch_major:
        batch, width, seq_len = proj.shape
    else:
        width, batch, seq_len = proj.shape
    d_model = width // 3
    taps = k_short.shape[0]
    n = 2 * seq_len
    n1, n2 = _split(n)
    h = n2 // 2

    # Tighter defaults than the gated kernel: the unrolled channel loop
    # holds the shift temporaries of every iteration live (Mosaic does not
    # reuse them), so cg*bt must stay smaller — bt cap 65536 with cg=8
    # blew the 16MB scoped-vmem limit at n1=64 widths (bt=42, h=12).
    cap = int(os.environ.get("DEEPCHOPPER_MIXER_BT_CAP", "32768"))
    bt = max(1, min(batch, cap // n))
    padded_batch = ((batch + bt - 1) // bt) * bt
    if padded_batch != batch:
        pad_b = padded_batch - batch
        pad_spec = ((0, pad_b), (0, 0), (0, 0)) if batch_major else ((0, 0), (0, pad_b), (0, 0))
        proj = jnp.pad(proj, pad_spec)
    nb = padded_batch // bt

    # cg stays 8: the tap-table blocks (3, cg, taps) need cg divisible by 8
    # (sublane rule); VMEM pressure is controlled via the bt cap instead.
    cg = int(os.environ.get("DEEPCHOPPER_MIXER_CG", "8"))
    while d_model % cg:
        cg //= 2
    cg = max(cg, 1)

    if batch_major:
        pd = proj.reshape(padded_batch, width, h, n1)
    else:
        pd = proj.reshape(width, padded_batch, h, n1)
    kr, ki = khat_scrambled(k_long, n, bias)

    # Taps regrouped [gate, channel, tap]; biases [gate, channel].
    ks = jnp.moveaxis(k_short[:, 0, :].astype(jnp.float32), 0, -1).reshape(3, d_model, taps)
    bs = b_short.astype(jnp.float32).reshape(3, d_model, 1)

    t = _tables(n)
    tables = [
        t["c2h"], t["s2h"], t["ctw"], t["stw"], t["c1"], t["s1"],
        t["ic1"], t["is1"], t["ictw"], t["istw"], t["ic2h"], t["is2h"],
    ]  # fmt: skip

    _G = d_model // cg
    if batch_major:
        # Block (bt, cg, h, n1) over (B, 3D, h, n1): the array XLA's matmul
        # fusions already produce PHYSICALLY (their preferred {2,0,1} layout
        # on the logical (3D, B, L) output is batch-major), so the logical
        # transpose feeding this kernel is a free bitcast instead of the
        # two ~1.2ms copy passes per layer the channel-major entry paid.
        blk = (bt, cg, h, n1)
        p2_spec = pl.BlockSpec(blk, lambda d, b: (b, d, 0, 0), memory_space=pltpu.VMEM)
        p1_spec = pl.BlockSpec(blk, lambda d, b: (b, d + _G, 0, 0), memory_space=pltpu.VMEM)
        pv_spec = pl.BlockSpec(blk, lambda d, b: (b, d + 2 * _G, 0, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec(blk, lambda d, b: (b, d, 0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((padded_batch, d_model, h, n1), proj.dtype)
    else:
        blk = (cg, bt, h, n1)
        p2_spec = pl.BlockSpec(blk, lambda d, b: (d, b, 0, 0), memory_space=pltpu.VMEM)
        p1_spec = pl.BlockSpec(blk, lambda d, b: (d + _G, b, 0, 0), memory_space=pltpu.VMEM)
        pv_spec = pl.BlockSpec(blk, lambda d, b: (d + 2 * _G, b, 0, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec(blk, lambda d, b: (d, b, 0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((d_model, padded_batch, h, n1), proj.dtype)
    ks_spec = pl.BlockSpec((3, cg, taps), lambda d, b: (0, d, 0), memory_space=pltpu.VMEM)
    bs_spec = pl.BlockSpec((3, cg, 1), lambda d, b: (0, d, 0), memory_space=pltpu.VMEM)
    khat_spec = pl.BlockSpec((cg, n2, n1), lambda d, b: (d, 0, 0), memory_space=pltpu.VMEM)
    table_spec = [
        pl.BlockSpec(a.shape, lambda d, b: (0, 0), memory_space=pltpu.VMEM) for a in tables
    ]

    flops_fft = 2 * d_model * padded_batch * n * (n2 // 2 + 4 * n1)
    itemsize = jnp.dtype(proj.dtype).itemsize
    out = pl.pallas_call(
        functools.partial(_mixer_kernel, precision=precision, batch_major=batch_major),
        grid=(d_model // cg, nb),
        in_specs=[p2_spec, p1_spec, pv_spec, ks_spec, bs_spec, khat_spec, khat_spec, *table_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_fft,
            bytes_accessed=4 * d_model * padded_batch * seq_len * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pd, pd, pd, ks, bs, kr, ki, *[jnp.asarray(a) for a in tables])

    if batch_major:
        return out.reshape(padded_batch, d_model, seq_len)[:batch]
    return out.reshape(d_model, padded_batch, seq_len)[:, :batch]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _mixer_autodiff(proj, k_short, b_short, k_long, bias, interpret, precision):
    return _mixer_impl(proj, k_short, b_short, k_long, bias, interpret=interpret, precision=precision)


def _mixer_fwd(proj, k_short, b_short, k_long, bias, interpret, precision):
    y = _mixer_impl(proj, k_short, b_short, k_long, bias, interpret=interpret, precision=precision)
    return y, (proj, k_short, b_short, k_long, bias)


def _mixer_bwd(interpret, precision, res, dy):
    # Autodiff through the composed MXU-matmul-FFT reference (recomputes the
    # forward — cheap relative to keeping gated intermediates alive in HBM;
    # the jnp.fft body measured ~12x the forward step on TPU, the matmul
    # body keeps the backward on the MXU).
    _, vjp = jax.vjp(mixer_reference_mm, *res)
    return vjp(dy)


_mixer_autodiff.defvjp(_mixer_fwd, _mixer_bwd)


def mixer_fft_conv_cm(
    proj: jnp.ndarray,
    k_short: jnp.ndarray,
    b_short: jnp.ndarray,
    k_long: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    interpret: bool | None = None,
    precision: str | None = None,
) -> jnp.ndarray:
    """Fully fused Hyena mixer conv: short conv + gate + FFT conv + gate.

    See _mixer_kernel / mixer_reference_xla for the contract. Differentiable.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _mixer_autodiff(proj, k_short, b_short, k_long, bias, interpret, precision or DEFAULT_PRECISION)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _mixer_autodiff_bm(proj_bm, k_short, b_short, k_long, bias, interpret, precision):
    return _mixer_impl(
        proj_bm, k_short, b_short, k_long, bias,
        interpret=interpret, precision=precision, batch_major=True,
    )  # fmt: skip


def _mixer_bm_fwd(proj_bm, k_short, b_short, k_long, bias, interpret, precision):
    y = _mixer_impl(
        proj_bm, k_short, b_short, k_long, bias,
        interpret=interpret, precision=precision, batch_major=True,
    )  # fmt: skip
    return y, (proj_bm, k_short, b_short, k_long, bias)


def _mixer_bm_bwd(interpret, precision, res, dy):
    proj_bm, k_short, b_short, k_long, bias = res
    if not interpret and os.environ.get("DEEPCHOPPER_MIXER_BWD", "pallas") == "pallas":
        # VMEM backward kernel: forward recompute + data cotangents in one
        # pass; measured ~10x faster than differentiating the composed XLA
        # reference at (32, 8192) (TRAIN_PROFILE.json).
        return mixer_bwd_pallas(
            proj_bm, dy, k_short, b_short, k_long, bias, precision=precision
        )

    def _ref_bm(p_bm, ks, bs, kl, b):
        return jnp.transpose(
            mixer_reference_mm(jnp.transpose(p_bm, (1, 0, 2)), ks, bs, kl, b), (1, 0, 2)
        )

    _, vjp = jax.vjp(_ref_bm, proj_bm, k_short, b_short, k_long, bias)
    return vjp(dy)


_mixer_autodiff_bm.defvjp(_mixer_bm_fwd, _mixer_bm_bwd)


def mixer_fft_conv_bm(
    proj_bm: jnp.ndarray,
    k_short: jnp.ndarray,
    b_short: jnp.ndarray,
    k_long: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    interpret: bool | None = None,
    precision: str | None = None,
) -> jnp.ndarray:
    """Batch-major fused mixer conv: proj_bm (B, 3D, L) -> (B, D, L).

    Same math as `mixer_fft_conv_cm` on transposed tensors, but the kernel's
    required default layout on (B, 3D, L) is PHYSICALLY the {2,0,1} layout
    XLA already chooses for the in_proj matmul's (3D, B, L) output — so the
    surrounding logical transposes lower to bitcasts and the ~2.4 ms/layer of
    layout-copy passes the channel-major entry pays disappear (measured on
    the 256x1024 flagship step; see docs/performance.md). Differentiable.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _mixer_autodiff_bm(
        proj_bm, k_short, b_short, k_long, bias, interpret, precision or DEFAULT_PRECISION
    )


# ---------------------------------------------------------------------------
# in_proj-fused mixer: the matmul moves INTO the kernel.
#
# Even with the batch-major entry, each layer pays one XLA in_proj matmul
# (~0.9 ms) plus a ~1.2 ms re-tiling copy of its 3d-wide output into the
# kernel's (8seq, 128seq) digit tiles, plus a 0.4 ms reshape on the way out
# (profiled, docs/performance.md). This kernel takes the NORM OUTPUT
# x (B, D, L) directly: the grid runs batch-tile OUTER / channel-group
# INNER, so the x block's index map depends only on b and Mosaic keeps it
# RESIDENT across all channel groups — the in_proj contraction happens on
# the MXU in VMEM per group (a (D, cg) x (bt, D, h, n1) 4-D dot), and the
# 3d-wide proj tensor never exists in HBM at all.
# ---------------------------------------------------------------------------


def _mixer_inproj_kernel(
    x_ref,
    w2_ref,
    w1_ref,
    wv_ref,
    bin_ref,
    ks_ref,
    bs_ref,
    kr_ref,
    ki_ref,
    c2h_ref,
    s2h_ref,
    ctw_ref,
    stw_ref,
    c1_ref,
    s1_ref,
    ic1_ref,
    is1_ref,
    ictw_ref,
    istw_ref,
    ic2h_ref,
    is2h_ref,
    out_ref,
    *,
    precision: str,
):
    """x_ref: (bt, D, h, n1) resident across the channel-group grid dim;
    w*_ref: (1, cg, D) per-gate in_proj row blocks (from the (3, Dout, Din)
    pre-transposed weight); bin_ref: (3, cg) in_proj bias. Output
    (bt, cg, h, n1) as the bm kernel."""
    x = x_ref[...]
    n_group = w2_ref.shape[1]
    taps = ks_ref.shape[2]

    def proj(w_ref, gate: int):
        y = jax.lax.dot_general(
            w_ref[0], x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (cg, bt, h, n1) f32
        return y + bin_ref[gate, :, 0][:, None, None, None]

    p2 = proj(w2_ref, 0)
    p1 = proj(w1_ref, 1)
    pv = proj(wv_ref, 2)

    def sconv(parr, gate: int, g: int):
        xg = parr[g]  # (bt, h, n1) f32
        out = xg * ks_ref[gate, g, taps - 1]
        for t in range(taps - 1):
            out = out + _shifted(xg, taps - 1 - t) * ks_ref[gate, g, t]
        return out + bs_ref[gate, g, 0]

    for g in range(n_group):
        x2 = sconv(p2, 0, g)
        x1 = sconv(p1, 1, g)
        v = sconv(pv, 2, g)
        xh = v * x1
        b, h, n1 = xh.shape
        rmm, lmm = _mm_helpers(b, precision)
        tr = lmm(c2h_ref[:], xh)
        ti = lmm(s2h_ref[:], xh)
        ctw, stw = ctw_ref[:], stw_ref[:]
        tr, ti = tr * ctw - ti * stw, tr * stw + ti * ctw
        c1, s1 = c1_ref[:], s1_ref[:]
        xr = rmm(tr, c1) - rmm(ti, s1)
        xi = rmm(tr, s1) + rmm(ti, c1)
        kr, ki = kr_ref[g], ki_ref[g]
        yr = xr * kr - xi * ki
        yi = xr * ki + xi * kr
        ic1, is1 = ic1_ref[:], is1_ref[:]
        sr = rmm(yr, ic1) - rmm(yi, is1)
        si = rmm(yr, is1) + rmm(yi, ic1)
        ictw, istw = ictw_ref[:], istw_ref[:]
        sr, si = sr * ictw - si * istw, sr * istw + si * ictw
        y = lmm(ic2h_ref[:], sr) - lmm(is2h_ref[:], si)
        out_ref[:, g] = (y * x2).astype(out_ref.dtype)


def _mixer_inproj_impl(x_bm, w_in, b_in, k_short, b_short, k_long, bias, *, interpret, precision):
    batch, d_model, seq_len = x_bm.shape
    width = w_in.shape[1]
    assert width == 3 * d_model
    taps = k_short.shape[0]
    n = 2 * seq_len
    n1, n2 = _split(n)
    h = n2 // 2

    cap = int(os.environ.get("DEEPCHOPPER_MIXER_IP_BT_CAP", "16384"))
    bt = max(1, min(batch, cap // n))
    padded_batch = ((batch + bt - 1) // bt) * bt
    if padded_batch != batch:
        x_bm = jnp.pad(x_bm, ((0, padded_batch - batch), (0, 0), (0, 0)))
    nb = padded_batch // bt

    cg = int(os.environ.get("DEEPCHOPPER_MIXER_IP_CG", "8"))
    while d_model % cg:
        cg //= 2
    cg = max(cg, 1)

    xd = x_bm.reshape(padded_batch, d_model, h, n1)
    # (Din, 3D) -> (3, Dout, Din): per-gate row blocks with Din in lanes.
    w16 = jnp.transpose(w_in, (1, 0)).reshape(3, d_model, d_model).astype(x_bm.dtype)
    bin3 = b_in.astype(jnp.float32).reshape(3, d_model, 1)
    kr, ki = khat_scrambled(k_long, n, bias)
    ks = jnp.moveaxis(k_short[:, 0, :].astype(jnp.float32), 0, -1).reshape(3, d_model, taps)
    bs = b_short.astype(jnp.float32).reshape(3, d_model, 1)

    t = _tables(n)
    tables = [
        t["c2h"], t["s2h"], t["ctw"], t["stw"], t["c1"], t["s1"],
        t["ic1"], t["is1"], t["ictw"], t["istw"], t["ic2h"], t["is2h"],
    ]  # fmt: skip

    _G = d_model // cg
    # Grid: b OUTER, d INNER — x's index map depends on b only, so the block
    # stays resident across the d sweep (no per-group re-fetch).
    x_spec = pl.BlockSpec((bt, d_model, h, n1), lambda b, d: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((1, cg, d_model), lambda b, d: (0, d, 0), memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((1, cg, d_model), lambda b, d: (1, d, 0), memory_space=pltpu.VMEM)
    wv_spec = pl.BlockSpec((1, cg, d_model), lambda b, d: (2, d, 0), memory_space=pltpu.VMEM)
    bin_spec = pl.BlockSpec((3, cg, 1), lambda b, d: (0, d, 0), memory_space=pltpu.VMEM)
    ks_spec = pl.BlockSpec((3, cg, taps), lambda b, d: (0, d, 0), memory_space=pltpu.VMEM)
    bs_spec = pl.BlockSpec((3, cg, 1), lambda b, d: (0, d, 0), memory_space=pltpu.VMEM)
    khat_spec = pl.BlockSpec((cg, n2, n1), lambda b, d: (d, 0, 0), memory_space=pltpu.VMEM)
    table_spec = [
        pl.BlockSpec(a.shape, lambda b, d: (0, 0), memory_space=pltpu.VMEM) for a in tables
    ]
    out_spec = pl.BlockSpec((bt, cg, h, n1), lambda b, d: (b, d, 0, 0), memory_space=pltpu.VMEM)

    flops = 2 * width * d_model * padded_batch * seq_len + 2 * d_model * padded_batch * n * (
        n2 // 2 + 4 * n1
    )
    itemsize = jnp.dtype(x_bm.dtype).itemsize
    out = pl.pallas_call(
        functools.partial(_mixer_inproj_kernel, precision=precision),
        grid=(nb, d_model // cg),
        in_specs=[x_spec, w2_spec, w1_spec, wv_spec, bin_spec, ks_spec, bs_spec, khat_spec, khat_spec, *table_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((padded_batch, d_model, h, n1), x_bm.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * d_model * padded_batch * seq_len * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xd, w16, w16, w16, bin3, ks, bs, kr, ki, *[jnp.asarray(a) for a in tables])

    return out.reshape(padded_batch, d_model, seq_len)[:batch]


def _inproj_composed(x_bm, w_in, b_in, k_short, b_short, k_long, bias, dtype):
    """JAX-level composition (DenseCM math + bm mixer) — the VJP body: its
    backward reuses the Pallas mixer backward plus XLA's matmul VJPs."""
    proj = (
        jax.lax.dot_general(
            x_bm.astype(dtype), w_in.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
        )  # (B, L?, ...) -> dims: (B, L) x ... careful below
    )
    # dot_general((B, D, L) x (D, F)) contracting D gives (B, L, F); we want
    # (B, F, L) — transpose the non-contracting dims.
    proj = jnp.transpose(proj, (0, 2, 1)) + b_in.astype(dtype)[None, :, None]
    return mixer_fft_conv_bm(proj, k_short, b_short, k_long, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _mixer_inproj_autodiff(x_bm, w_in, b_in, k_short, b_short, k_long, bias, interpret, precision):
    return _mixer_inproj_impl(
        x_bm, w_in, b_in, k_short, b_short, k_long, bias,
        interpret=interpret, precision=precision,
    )  # fmt: skip


def _mixer_inproj_fwd(x_bm, w_in, b_in, k_short, b_short, k_long, bias, interpret, precision):
    y = _mixer_inproj_impl(
        x_bm, w_in, b_in, k_short, b_short, k_long, bias,
        interpret=interpret, precision=precision,
    )  # fmt: skip
    return y, (x_bm, w_in, b_in, k_short, b_short, k_long, bias)


def _mixer_inproj_bwd(interpret, precision, res, dy):
    dtype = res[0].dtype
    _, vjp = jax.vjp(lambda *a: _inproj_composed(*a, dtype), *res)
    return vjp(dy)


_mixer_inproj_autodiff.defvjp(_mixer_inproj_fwd, _mixer_inproj_bwd)


def mixer_fft_conv_inproj(
    x_bm: jnp.ndarray,
    w_in: jnp.ndarray,
    b_in: jnp.ndarray,
    k_short: jnp.ndarray,
    b_short: jnp.ndarray,
    k_long: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    interpret: bool | None = None,
    precision: str | None = None,
) -> jnp.ndarray:
    """in_proj + short conv + gate + FFT conv + gate, ONE kernel.

    x_bm: (B, D, L) normalized stream (batch-major); w_in: (D, 3D) in_proj
    kernel (nn.Dense layout); b_in: (3D,). Returns (B, D, L) in x's dtype.
    Differentiable (backward composes the Pallas mixer backward with XLA's
    matmul VJP).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _mixer_inproj_autodiff(
        x_bm, w_in, b_in, k_short, b_short, k_long, bias, interpret, precision or DEFAULT_PRECISION
    )


# ---------------------------------------------------------------------------
# Mixer BACKWARD kernel: the training path's heavy gradients in VMEM.
#
# Autodiff through the composed XLA reference recomputes the forward with
# full-size f32 HBM tensors and materializes every four-step FFT stage —
# measured ~10x the forward step at (32, 8192) (TRAIN_PROFILE.json). This
# kernel recomputes the forward IN VMEM (like the forward kernel) and
# produces the data-side cotangents in the same pass.
#
# Math (exact with the kernel's own tables): with the scaled spectrum
# K̂ = F(k)/n (khat_scrambled) and the kernel's table pair
# M = F (restricted to the length-L support), N = conj(F) read back on the
# first L samples, the forward is y = x2 ⊙ N(K̂ ⊙ M(v⊙x1)). Since all DFT
# tables are symmetric, the adjoints are:
#     dz        = dy ⊙ x2,          dx2 = dy ⊙ N(K̂ ⊙ M(w))
#     (er, ei)  = M(dz)             (cotangent of the spectrum Z = K̂⊙ŵ)
#     dŵ        = conj(K̂) ⊙ (er,ei),  dw = N(dŵ)     (circular correlation)
#     dv = dw ⊙ x1,  dx1 = dw ⊙ v
#     dK̂        = conj(ŵ) ⊙ (er,ei), summed over batch (accumulated across
#                 the sequential batch grid dim into a (cg, n2, n1) block)
# dK̂ converts to (dk_long, dbias) host-side via jax.vjp(khat_scrambled).
# The cheap short-conv adjoint (3-tap shifted FMAs) and its tap/bias grads
# stay in XLA — they are bandwidth-trivial next to the FFT work.
# ---------------------------------------------------------------------------


def _mixer_bwd_kernel(
    p2_ref,
    p1_ref,
    pv_ref,
    dy_ref,
    ks_ref,
    bs_ref,
    kr_ref,
    ki_ref,
    c2h_ref,
    s2h_ref,
    ctw_ref,
    stw_ref,
    c1_ref,
    s1_ref,
    ic1_ref,
    is1_ref,
    ictw_ref,
    istw_ref,
    ic2h_ref,
    is2h_ref,
    dx2_ref,
    dx1_ref,
    dv_ref,
    dkr_ref,
    dki_ref,
    *,
    precision: str,
):
    """Batch-major blocks (bt, cg, h, n1); dk̂ accumulated over the b grid."""
    lc = pl.program_id(1)

    @pl.when(lc == 0)
    def _init():
        dkr_ref[...] = jnp.zeros_like(dkr_ref)
        dki_ref[...] = jnp.zeros_like(dki_ref)

    n_group = pv_ref.shape[1]
    taps = ks_ref.shape[2]

    def sconv(ref, gate: int, g: int):
        x = ref[:, g].astype(jnp.float32)
        out = x * ks_ref[gate, g, taps - 1]
        for t in range(taps - 1):
            out = out + _shifted(x, taps - 1 - t) * ks_ref[gate, g, t]
        return out + bs_ref[gate, g, 0]

    for g in range(n_group):
        x2 = sconv(p2_ref, 0, g)
        x1 = sconv(p1_ref, 1, g)
        v = sconv(pv_ref, 2, g)
        w = v * x1
        b, h, n1 = w.shape
        rmm, lmm = _mm_helpers(b, precision)

        def fft4(x):
            tr = lmm(c2h_ref[:], x)
            ti = lmm(s2h_ref[:], x)
            ctw, stw = ctw_ref[:], stw_ref[:]
            tr, ti = tr * ctw - ti * stw, tr * stw + ti * ctw
            c1, s1 = c1_ref[:], s1_ref[:]
            return rmm(tr, c1) - rmm(ti, s1), rmm(tr, s1) + rmm(ti, c1)

        def ifft4(yr, yi):
            ic1, is1 = ic1_ref[:], is1_ref[:]
            sr = rmm(yr, ic1) - rmm(yi, is1)
            si = rmm(yr, is1) + rmm(yi, ic1)
            ictw, istw = ictw_ref[:], istw_ref[:]
            sr, si = sr * ictw - si * istw, sr * istw + si * ictw
            return lmm(ic2h_ref[:], sr) - lmm(is2h_ref[:], si)

        wr, wi = fft4(w)
        kr, ki = kr_ref[g], ki_ref[g]
        z = ifft4(wr * kr - wi * ki, wr * ki + wi * kr)
        dy = dy_ref[:, g].astype(jnp.float32)
        dz = dy * x2
        dx2_ref[:, g] = (dy * z).astype(dx2_ref.dtype)
        dzr, dzi = fft4(dz)
        dw = ifft4(kr * dzr + ki * dzi, kr * dzi - ki * dzr)
        dx1_ref[:, g] = (dw * v).astype(dx1_ref.dtype)
        dv_ref[:, g] = (dw * x1).astype(dv_ref.dtype)
        dkr_ref[g] += jnp.sum(wr * dzr + wi * dzi, axis=0)
        dki_ref[g] += jnp.sum(wr * dzi - wi * dzr, axis=0)


def _short_conv_adjoint(dx, ks_g):
    """Adjoint of the in-kernel short conv along the last axis.

    Forward: out[t] = sum_j ks[j] * x[t + j - (taps-1)] (x zero for idx < 0).
    Adjoint: dxin[s] = sum_j ks[j] * dx[s + (taps-1) - j] (zero past end).
    dx: (B, C, L) f32; ks_g: (C, taps). Returns same shape as dx.
    """
    taps = ks_g.shape[-1]
    seq_len = dx.shape[-1]
    xp = jnp.pad(dx, ((0, 0), (0, 0), (0, taps - 1)))
    out = xp[:, :, 0:seq_len] * ks_g[:, taps - 1][None, :, None]
    for m in range(1, taps):
        out = out + xp[:, :, m : m + seq_len] * ks_g[:, taps - 1 - m][None, :, None]
    return out


def mixer_bwd_pallas(proj_bm, dy_bm, k_short, b_short, k_long, bias, *, precision=None, interpret=False):
    """Pallas backward for the batch-major fused mixer.

    proj_bm: (B, 3D, L) saved input; dy_bm: (B, D, L) cotangent.
    Returns (dproj_bm, dk_short, db_short, dk_long, dbias).
    """
    precision = precision or DEFAULT_PRECISION
    batch, width, seq_len = proj_bm.shape
    d_model = width // 3
    taps = k_short.shape[0]
    n = 2 * seq_len
    n1, n2 = _split(n)
    h = n2 // 2

    cap = int(os.environ.get("DEEPCHOPPER_MIXER_BWD_BT_CAP", "8192"))
    bt = max(1, min(batch, cap // n))
    padded_batch = ((batch + bt - 1) // bt) * bt
    dy32 = dy_bm
    if padded_batch != batch:
        pad_b = padded_batch - batch
        proj_bm = jnp.pad(proj_bm, ((0, pad_b), (0, 0), (0, 0)))
        dy32 = jnp.pad(dy_bm, ((0, pad_b), (0, 0), (0, 0)))
    nb = padded_batch // bt

    # cg stays 8 (like the forward): the (3, cg, taps) tap-table blocks need
    # cg divisible by 8. The ~2x temporary pressure of the backward is
    # absorbed by the smaller bt cap instead.
    cg = int(os.environ.get("DEEPCHOPPER_MIXER_BWD_CG", "8"))
    while d_model % cg:
        cg //= 2
    cg = max(cg, 1)

    pd = proj_bm.reshape(padded_batch, width, h, n1)
    dyd = dy32.reshape(padded_batch, d_model, h, n1)
    kr, ki = khat_scrambled(k_long, n, bias)
    ks = jnp.moveaxis(k_short[:, 0, :].astype(jnp.float32), 0, -1).reshape(3, d_model, taps)
    bs = b_short.astype(jnp.float32).reshape(3, d_model, 1)

    t = _tables(n)
    tables = [
        t["c2h"], t["s2h"], t["ctw"], t["stw"], t["c1"], t["s1"],
        t["ic1"], t["is1"], t["ictw"], t["istw"], t["ic2h"], t["is2h"],
    ]  # fmt: skip

    _G = d_model // cg
    blk = (bt, cg, h, n1)
    p2_spec = pl.BlockSpec(blk, lambda d, b: (b, d, 0, 0), memory_space=pltpu.VMEM)
    p1_spec = pl.BlockSpec(blk, lambda d, b: (b, d + _G, 0, 0), memory_space=pltpu.VMEM)
    pv_spec = pl.BlockSpec(blk, lambda d, b: (b, d + 2 * _G, 0, 0), memory_space=pltpu.VMEM)
    dy_spec = pl.BlockSpec(blk, lambda d, b: (b, d, 0, 0), memory_space=pltpu.VMEM)
    ks_spec = pl.BlockSpec((3, cg, taps), lambda d, b: (0, d, 0), memory_space=pltpu.VMEM)
    bs_spec = pl.BlockSpec((3, cg, 1), lambda d, b: (0, d, 0), memory_space=pltpu.VMEM)
    khat_spec = pl.BlockSpec((cg, n2, n1), lambda d, b: (d, 0, 0), memory_space=pltpu.VMEM)
    table_spec = [
        pl.BlockSpec(a.shape, lambda d, b: (0, 0), memory_space=pltpu.VMEM) for a in tables
    ]
    dx_spec = pl.BlockSpec(blk, lambda d, b: (b, d, 0, 0), memory_space=pltpu.VMEM)
    dkhat_spec = pl.BlockSpec((cg, n2, n1), lambda d, b: (d, 0, 0), memory_space=pltpu.VMEM)

    out_dtype = dy_bm.dtype
    flops_fft = 4 * d_model * padded_batch * n * (n2 // 2 + 4 * n1)
    itemsize = jnp.dtype(proj_bm.dtype).itemsize
    dx2, dx1, dv, dkr, dki = pl.pallas_call(
        functools.partial(_mixer_bwd_kernel, precision=precision),
        grid=(d_model // cg, nb),
        in_specs=[p2_spec, p1_spec, pv_spec, dy_spec, ks_spec, bs_spec, khat_spec, khat_spec, *table_spec],
        out_specs=[dx_spec, dx_spec, dx_spec, dkhat_spec, dkhat_spec],
        out_shape=[
            jax.ShapeDtypeStruct((padded_batch, d_model, h, n1), out_dtype),
            jax.ShapeDtypeStruct((padded_batch, d_model, h, n1), out_dtype),
            jax.ShapeDtypeStruct((padded_batch, d_model, h, n1), out_dtype),
            jax.ShapeDtypeStruct((d_model, n2, n1), jnp.float32),
            jax.ShapeDtypeStruct((d_model, n2, n1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_fft,
            bytes_accessed=8 * d_model * padded_batch * seq_len * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pd, pd, pd, dyd, ks, bs, kr, ki, *[jnp.asarray(a) for a in tables])

    dx2 = dx2.reshape(padded_batch, d_model, seq_len)[:batch].astype(jnp.float32)
    dx1 = dx1.reshape(padded_batch, d_model, seq_len)[:batch].astype(jnp.float32)
    dv = dv.reshape(padded_batch, d_model, seq_len)[:batch].astype(jnp.float32)

    # (dk_long, dbias) from the accumulated spectrum cotangent.
    _, khat_vjp = jax.vjp(lambda k, b: khat_scrambled(k, n, b), k_long, bias)
    dk_long, dbias = khat_vjp((dkr, dki))

    # Short-conv adjoint + tap/bias grads in XLA (bandwidth-trivial).
    ksg = jnp.moveaxis(k_short[:, 0, :].astype(jnp.float32), 0, -1)  # (3D, taps)
    dgates = jnp.concatenate([dx2, dx1, dv], axis=1)  # (B, 3D, L) f32
    dproj = _short_conv_adjoint(dgates, ksg)

    # dk_short[t, 0, c] = sum_{b,s} dgate[b,c,s] * p[b,c,s + t - (taps-1)]
    p32 = proj_bm[:batch].astype(jnp.float32)
    pp = jnp.pad(p32, ((0, 0), (0, 0), (taps - 1, 0)))
    dks = jnp.stack(
        [jnp.sum(dgates * pp[:, :, tp : tp + seq_len], axis=(0, 2)) for tp in range(taps)],
        axis=0,
    )[:, None, :]  # (taps, 1, 3D)
    db_short = jnp.sum(dgates, axis=(0, 2))

    return (
        dproj.astype(proj_bm.dtype),
        dks.astype(k_short.dtype),
        db_short.astype(b_short.dtype),
        dk_long.astype(k_long.dtype),
        dbias.astype(bias.dtype),
    )


# ---------------------------------------------------------------------------
# v2 block layout: (channel, h, B, n1) — single-matmul FFT stages.
#
# The v1 layout (channel, B, h, n1) forces the j2-contraction to run as B
# batched (n2, h) @ (h, n1) matmuls per channel (~1000 matmul macros per
# grid step at bt=32) and gives bf16 blocks h=8 sublanes — half the bf16
# tile. Putting the h digit AHEAD of the batch makes the j2-contraction ONE
# leading-axis matmul per channel ((n2, h) @ (h, bt*n1)) and the tiled
# minor dims (bt, n1) = (32, 128) a whole number of tiles for every dtype.
# The cost is one XLA transpose pass on the way in and out of the kernel
# ((C, B, h, n1) <-> (C, h, B, n1)); selected with DEEPCHOPPER_FFT_LAYOUT=v2.
# ---------------------------------------------------------------------------


def _gated_kernel_v2(
    x2_ref,
    x1_ref,
    v_ref,
    kr_ref,
    ki_ref,
    c2h_ref,
    s2h_ref,
    ctw_ref,
    stw_ref,
    c1_ref,
    s1_ref,
    ic1_ref,
    is1_ref,
    ictw_ref,
    istw_ref,
    ic2h_ref,
    is2h_ref,
    out_ref,
    *,
    precision: str,
):
    """Per grouped channel, blocks (cg, h, B, n1): gate -> FFT conv -> gate."""
    n_group = v_ref.shape[0]

    def mm(a, b2):
        return jax.lax.dot_general(
            a, b2, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    for g in range(n_group):
        xh = (v_ref[g] * x1_ref[g]).astype(jnp.float32)  # (h, bt, n1)
        h, bt, n1 = xh.shape
        n2 = 2 * h

        # Forward stage 1: ONE matmul contracting the leading h digit:
        # (n2, h) @ (h, bt*n1) -> (n2, bt, n1).
        xf = xh.reshape(h, bt * n1)
        tr = mm(c2h_ref[:], xf).reshape(n2, bt, n1)
        ti = mm(s2h_ref[:], xf).reshape(n2, bt, n1)

        # Twiddle (n2, n1), broadcast over the middle batch dim.
        ctw = ctw_ref[:][:, None, :]
        stw = stw_ref[:][:, None, :]
        tr, ti = tr * ctw - ti * stw, tr * stw + ti * ctw

        # Forward stage 2: contract the lane digit, merged over (n2, bt).
        def rmm(a, m):
            return mm(a.reshape(n2 * bt, n1), m).reshape(n2, bt, n1)

        c1, s1 = c1_ref[:], s1_ref[:]
        xr = rmm(tr, c1) - rmm(ti, s1)
        xi = rmm(tr, s1) + rmm(ti, c1)

        kr = kr_ref[g][:, None, :]
        ki = ki_ref[g][:, None, :]
        yr = xr * kr - xi * ki
        yi = xr * ki + xi * kr

        ic1, is1 = ic1_ref[:], is1_ref[:]
        sr = rmm(yr, ic1) - rmm(yi, is1)
        si = rmm(yr, is1) + rmm(yi, ic1)

        ictw = ictw_ref[:][:, None, :]
        istw = istw_ref[:][:, None, :]
        sr, si = sr * ictw - si * istw, sr * istw + si * ictw

        # Inverse stage 2: ONE matmul contracting k2: (h, n2) @ (n2, bt*n1).
        y = mm(ic2h_ref[:], sr.reshape(n2, bt * n1)) - mm(
            is2h_ref[:], si.reshape(n2, bt * n1)
        )
        y = y.reshape(h, bt, n1)
        out_ref[g] = (y * x2_ref[g].astype(jnp.float32)).astype(out_ref.dtype)


def _gated_conv_cm_impl_v2(uc, k, bias, *, interpret, precision):
    """v2-layout driver: uc (3D, B, L) -> (D, B, L), same math as v1."""
    width, batch, seq_len = uc.shape
    d_model = width // 3
    n = 2 * seq_len
    n1, n2 = _split(n)
    h = n2 // 2

    cap = int(os.environ.get("DEEPCHOPPER_FFT_BT_CAP", "65536"))
    bt = max(1, min(batch, cap // n))
    padded_batch = ((batch + bt - 1) // bt) * bt
    if padded_batch != batch:
        uc = jnp.pad(uc, ((0, 0), (0, padded_batch - batch), (0, 0)))
    nb = padded_batch // bt

    cg = int(os.environ.get("DEEPCHOPPER_FFT_CG", "8"))
    while d_model % cg:
        cg //= 2
    cg = max(cg, 1)

    # (3D, h, B, n1): the one transpose pass this layout costs on the way in.
    ucd = jnp.transpose(uc.reshape(width, padded_batch, h, n1), (0, 2, 1, 3))
    kr, ki = khat_scrambled(k, n, bias)

    t = _tables(n)
    tables = [
        t["c2h"], t["s2h"], t["ctw"], t["stw"], t["c1"], t["s1"],
        t["ic1"], t["is1"], t["ictw"], t["istw"], t["ic2h"], t["is2h"],
    ]  # fmt: skip

    blk = (cg, h, bt, n1)
    x2_spec = pl.BlockSpec(blk, lambda d, b: (d, 0, b, 0), memory_space=pltpu.VMEM)
    x1_spec = pl.BlockSpec(
        blk, lambda d, b, _G=d_model // cg: (d + _G, 0, b, 0), memory_space=pltpu.VMEM
    )
    v_spec = pl.BlockSpec(
        blk, lambda d, b, _G=d_model // cg: (d + 2 * _G, 0, b, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(blk, lambda d, b: (d, 0, b, 0), memory_space=pltpu.VMEM)
    khat_spec = pl.BlockSpec((cg, n2, n1), lambda d, b: (d, 0, 0), memory_space=pltpu.VMEM)
    table_spec = [
        pl.BlockSpec(a.shape, lambda d, b: (0, 0), memory_space=pltpu.VMEM) for a in tables
    ]

    flops_fft = 2 * d_model * padded_batch * n * (n2 // 2 + 4 * n1)
    itemsize = jnp.dtype(uc.dtype).itemsize
    out = pl.pallas_call(
        functools.partial(_gated_kernel_v2, precision=precision),
        grid=(d_model // cg, nb),
        in_specs=[x2_spec, x1_spec, v_spec, khat_spec, khat_spec, *table_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((d_model, h, padded_batch, n1), uc.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_fft,
            bytes_accessed=4 * d_model * padded_batch * seq_len * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ucd, ucd, ucd, kr, ki, *[jnp.asarray(a) for a in tables])

    # (D, h, B, n1) -> (D, B, L): the transpose pass on the way out.
    y = jnp.transpose(out, (0, 2, 1, 3)).reshape(d_model, padded_batch, seq_len)
    return y[:, :batch]
