"""Matmul-based FFT for TPU (four-step Cooley-Tukey on the MXU).

XLA's generic FFT lowering on TPU runs on the VPU and dominates the Hyena
long-conv runtime. A length-N DFT factored as N = n1*n2 becomes two batched
(n, n) matmuls plus an elementwise twiddle — exactly the shape the MXU wants.
For the model's bucket widths (N = 2L, powers of two up to 65536) this is an
order-of-magnitude win over the stock lowering.

Math (decimation in time): with n = j1 + n1*j2 and k = k2 + n2*k1,
  X[k2 + n2*k1] = sum_{j1} W_N^{j1 k2} W_{n1}^{j1 k1} (sum_{j2} x[j1 + n1 j2] W_{n2}^{j2 k2})
Step 1 contracts j2 (matmul with DFT_{n2}), step 2 multiplies the N twiddles,
step 3 contracts j1 (matmul with DFT_{n1}), step 4 is a transpose-reshape.

All matmuls run in float32 (precision ~sqrt(N)*eps, ample for the conv);
weights are built host-side once per (N,) and closed over as constants so XLA
hoists them.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _split(n: int) -> tuple[int, int]:
    """Factor N = n1 * n2 for the four-step transform.

    The math works for ANY factorization (DFT matrices of size n1/n2, twiddle
    W_N) — not just powers of two. n1 (the lane dim downstream) picks the
    largest of 128/64/32 that divides N with n2 staying a multiple of 8, so
    every bucket width (multiples of 256 -> N multiples of 512) runs an
    exact-length transform instead of padding to the next power of two.
    """
    for n1 in (128, 64, 32, 16, 8):
        n2, rem = divmod(n, n1)
        if rem == 0 and n2 % 8 == 0 and n2 >= 8:
            # Prefer balanced-ish stages: per-element MACs scale with n1 + n2
            # across the two contractions, so avoid a huge n1 for small N.
            if n1 * n1 <= 4 * n:
                return n1, n2
    raise ValueError(f"matmul FFT needs N = n1*n2 with n2 a multiple of 8, got {n}")


@functools.lru_cache(maxsize=32)
def _dft_consts(n: int, inverse: bool) -> tuple[np.ndarray, ...]:
    """(cos/sin of DFT_{n2}, twiddles W_N, DFT_{n1}) as float32 numpy."""
    n1, n2 = _split(n)
    sign = 2.0 * np.pi / n if inverse else -2.0 * np.pi / n

    ang2 = (2.0 * np.pi / n2) * (1.0 if inverse else -1.0) * (np.arange(n2)[:, None] * np.arange(n2)[None, :])
    ang_tw = sign * (np.arange(n2)[:, None] * np.arange(n1)[None, :])  # W_N^{k2 j1}
    ang1 = (2.0 * np.pi / n1) * (1.0 if inverse else -1.0) * (np.arange(n1)[:, None] * np.arange(n1)[None, :])
    return (
        np.cos(ang2).astype(np.float32),
        np.sin(ang2).astype(np.float32),
        np.cos(ang_tw).astype(np.float32),
        np.sin(ang_tw).astype(np.float32),
        np.cos(ang1).astype(np.float32),
        np.sin(ang1).astype(np.float32),
    )


def _fft_core(
    xr: jnp.ndarray, xi: jnp.ndarray | None, n: int, inverse: bool
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Complex FFT over the LAST axis via two matmuls + twiddle.

    xr/xi: (..., N) float32 (xi may be None for real input).
    Returns (real, imag), each (..., N).
    """
    n1, n2 = _split(n)
    c2, s2, ctw, stw, c1, s1 = (jnp.asarray(a) for a in _dft_consts(n, inverse))

    # n = j1 + n1*j2  ->  reshape (..., n2, n1) indexed [j2, j1].
    ar = xr.reshape(*xr.shape[:-1], n2, n1)
    ai = xi.reshape(*xi.shape[:-1], n2, n1) if xi is not None else None

    # Step 1: contract j2 -> B[k2, j1]  (einsum jk,...ji->...ki).
    # Precision note: TPU matmuls default to bf16 passes (rel err ~5e-3 on the
    # assembled FFT — enough to flip argmax at near-tie logits). "float32"
    # (3-pass) costs only ~18% more here and lands at ~2e-7.
    def mm_j2(m, a):
        return jnp.einsum(
            "jk,...ji->...ki", m, a,
            preferred_element_type=jnp.float32, precision="float32",
        )

    br = mm_j2(c2, ar)
    bi = mm_j2(s2, ar)
    if ai is not None:
        br = br - mm_j2(s2, ai)
        bi = bi + mm_j2(c2, ai)

    # Step 2: twiddle by W_N^{k2 j1} (elementwise over the last two axes).
    tr = br * ctw - bi * stw
    ti = br * stw + bi * ctw

    # Step 3: contract j1 -> C[k2, k1]  (einsum il,...ki->...kl).
    def mm_j1(m, a):
        return jnp.einsum(
            "il,...ki->...kl", m, a,
            preferred_element_type=jnp.float32, precision="float32",
        )

    cr = mm_j1(c1, tr) - mm_j1(s1, ti)
    ci = mm_j1(s1, tr) + mm_j1(c1, ti)

    # Step 4: k = k2 + n2*k1 -> (..., n1, n2) indexed [k1, k2] -> flatten.
    yr = cr.swapaxes(-1, -2).reshape(*xr.shape[:-1], n)
    yi = ci.swapaxes(-1, -2).reshape(*xr.shape[:-1], n)
    if inverse:
        yr = yr / n
        yi = yi / n
    return yr, yi


def matmul_fft(xr: jnp.ndarray, xi: jnp.ndarray | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward complex FFT over the last axis; input real (xi=None) or complex."""
    return _fft_core(xr, xi, xr.shape[-1], inverse=False)


def matmul_ifft(xr: jnp.ndarray, xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse complex FFT over the last axis (normalized by 1/N)."""
    return _fft_core(xr, xi, xr.shape[-1], inverse=True)


def fft_causal_conv_matmul(v: jnp.ndarray, k: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Causal long conv y = (v * k)[:L] + v*bias with matmul FFTs.

    v: (B, L, D) float32, k: (L, D), bias: (D,) — same contract as
    models.hyena.fft_causal_conv. FFT length is 2L (linear convolution).
    """
    seq_len = v.shape[1]
    n = 2 * seq_len
    v32 = v.astype(jnp.float32)

    # FFT over the sequence axis: move L last -> (B, D, L).
    vt = jnp.moveaxis(v32, 1, -1)
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, n - seq_len)))
    vr, vi = matmul_fft(vt)

    kt = jnp.pad(k.T, ((0, 0), (0, n - seq_len)))  # (D, N)
    kr, ki = matmul_fft(kt)

    # Pointwise complex product, then inverse.
    yr = vr * kr[None] - vi * ki[None]
    yi = vr * ki[None] + vi * kr[None]
    out_r, _out_i = matmul_ifft(yr, yi)

    y = jnp.moveaxis(out_r[..., :seq_len], -1, 1)  # (B, L, D)
    return y + v32 * bias[None, None, :]
