"""Matmul-FFT (MXU four-step Cooley-Tukey) vs stock FFT parity."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepchopper_tpu.models.hyena import fft_causal_conv, short_depthwise_conv
from deepchopper_tpu.ops.fft import fft_causal_conv_matmul, matmul_fft, matmul_ifft


@pytest.mark.parametrize("n", [64, 128, 512, 2048, 8192])
def test_matmul_fft_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((2, n)).astype(np.float32)
    yr, yi = matmul_fft(jnp.asarray(x))
    ref = np.fft.fft(x, axis=-1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(yr), ref.real, atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(yi), ref.imag, atol=2e-5 * scale)


def test_matmul_fft_complex_roundtrip():
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((3, 256)).astype(np.float32)
    xi = rng.standard_normal((3, 256)).astype(np.float32)
    fr, fi = matmul_fft(jnp.asarray(xr), jnp.asarray(xi))
    br, bi = matmul_ifft(fr, fi)
    np.testing.assert_allclose(np.asarray(br), xr, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bi), xi, atol=1e-4)


def test_matmul_fft_rejects_non_pow2():
    with pytest.raises(ValueError):
        matmul_fft(jnp.zeros((2, 100), jnp.float32))


def test_causal_conv_matmul_matches_fft():
    rng = np.random.default_rng(1)
    B, L, D = 3, 256, 8
    v = rng.standard_normal((B, L, D)).astype(np.float32)
    k = (rng.standard_normal((L, D)) * np.exp(-np.arange(L) / 40.0)[:, None]).astype(np.float32)
    bias = rng.standard_normal(D).astype(np.float32)
    ref = np.asarray(fft_causal_conv(jnp.asarray(v), jnp.asarray(k), jnp.asarray(bias)))
    got = np.asarray(fft_causal_conv_matmul(jnp.asarray(v), jnp.asarray(k), jnp.asarray(bias)))
    np.testing.assert_allclose(got, ref, atol=3e-4 * max(1.0, np.abs(ref).max()))


def test_short_depthwise_conv_matches_lax():
    rng = np.random.default_rng(2)
    B, L, W, K = 2, 64, 24, 3
    x = rng.standard_normal((B, L, W)).astype(np.float32)
    kern = rng.standard_normal((K, 1, W)).astype(np.float32)
    bias = rng.standard_normal(W).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kern), (1,), [(K - 1, 0)],
        dimension_numbers=("NLC", "LIO", "NLC"), feature_group_count=W,
    ) + bias[None, None, :]
    got = short_depthwise_conv(jnp.asarray(x), jnp.asarray(kern), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_backbone_argmax_invariant_to_conv_impl():
    """The classification decision must not flip between conv impls."""
    import dataclasses

    from deepchopper_tpu.models import HeadConfig, HyenaConfig, HyenaTokenClassifier, init_params

    cfg = HyenaConfig(d_model=64, n_layer=2, d_inner=128, max_seq_len=1024, conv_impl="matmul_fft")
    head = HeadConfig(input_size=64, lin1_size=96, lin2_size=96, compute_dtype="float32")
    m1 = HyenaTokenClassifier(backbone_config=cfg, head_config=head)
    params = init_params(m1, seq_len=128)
    m2 = HyenaTokenClassifier(
        backbone_config=dataclasses.replace(cfg, conv_impl="fft"), head_config=head
    )
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(7, 12, (2, 128)), jnp.int32)
    quals = jnp.asarray(rng.random((2, 128)), jnp.float32)
    l1 = np.asarray(m1.apply({"params": params}, ids, quals))
    l2 = np.asarray(m2.apply({"params": params}, ids, quals))
    np.testing.assert_allclose(l1, l2, atol=5e-3 * max(1.0, np.abs(l2).max()))
    np.testing.assert_array_equal(l1.argmax(-1), l2.argmax(-1))
