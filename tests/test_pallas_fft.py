"""Fused Pallas FFT-conv kernel vs the stock FFT conv (interpret mode on CPU)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from deepchopper_tpu.models.hyena import fft_causal_conv
from deepchopper_tpu.ops.pallas_fft import _split, _tables, fft_causal_conv_pallas, khat_scrambled


@pytest.mark.parametrize("shape", [(4, 256, 8), (2, 1024, 4), (3, 512, 16), (2, 4096, 4)])
def test_pallas_conv_matches_fft(shape):
    batch, seq_len, d_model = shape
    rng = np.random.default_rng(seq_len)
    v = rng.standard_normal((batch, seq_len, d_model)).astype(np.float32)
    k = (
        rng.standard_normal((seq_len, d_model)) * np.exp(-np.arange(seq_len) / 40.0)[:, None]
    ).astype(np.float32)
    bias = rng.standard_normal(d_model).astype(np.float32)
    ref = np.asarray(fft_causal_conv(jnp.asarray(v), jnp.asarray(k), jnp.asarray(bias)))
    # precision pinned: the default ("bfloat16") runs the DFT matmuls at
    # ~5e-3 rel err on TPU hardware, which this exact-comparison tolerance
    # would reject (see ADVICE r3 / validate_fft_precision.py).
    got = np.asarray(
        fft_causal_conv_pallas(
            jnp.asarray(v), jnp.asarray(k), jnp.asarray(bias), precision="float32"
        )
    )
    np.testing.assert_allclose(got, ref, atol=5e-5 * max(1.0, np.abs(ref).max()))


@pytest.mark.parametrize("shape", [(4, 256, 8), (2, 1024, 4), (2, 2048, 6)])
def test_gated_conv_cm_matches_composed_reference(shape):
    """Fused gate+conv+gate kernel vs the op math composed from stock pieces."""
    from deepchopper_tpu.ops.pallas_fft import gated_fft_conv_cm

    batch, seq_len, d_model = shape
    rng = np.random.default_rng(seq_len + 1)
    uc = rng.standard_normal((3 * d_model, batch, seq_len)).astype(np.float32)
    k = (
        rng.standard_normal((seq_len, d_model)) * np.exp(-np.arange(seq_len) / 40.0)[:, None]
    ).astype(np.float32)
    bias = rng.standard_normal(d_model).astype(np.float32)

    x2, x1, v = uc[:d_model], uc[d_model : 2 * d_model], uc[2 * d_model :]
    w = jnp.moveaxis(jnp.asarray(v * x1), 0, -1)  # (B, L, D)
    z = fft_causal_conv(w, jnp.asarray(k), jnp.asarray(bias))
    ref = np.asarray(jnp.moveaxis(z, -1, 0)) * x2

    got = np.asarray(
        gated_fft_conv_cm(
            jnp.asarray(uc), jnp.asarray(k), jnp.asarray(bias),
            interpret=True, precision="float32",
        )
    )
    assert got.shape == (d_model, batch, seq_len)
    np.testing.assert_allclose(got, ref, atol=5e-5 * max(1.0, np.abs(ref).max()))


def test_gated_conv_cm_bf16_io_roundtrip():
    """bf16-in/bf16-out (the fast path's dtypes) stays within bf16 noise."""
    from deepchopper_tpu.ops.pallas_fft import gated_fft_conv_cm

    rng = np.random.default_rng(7)
    d_model, batch, seq_len = 4, 2, 512
    uc32 = rng.standard_normal((3 * d_model, batch, seq_len)).astype(np.float32)
    k = (
        rng.standard_normal((seq_len, d_model)) * np.exp(-np.arange(seq_len) / 40.0)[:, None]
    ).astype(np.float32)
    bias = rng.standard_normal(d_model).astype(np.float32)
    uc16 = jnp.asarray(uc32, jnp.bfloat16)

    x2, x1, v = uc32[:d_model], uc32[d_model : 2 * d_model], uc32[2 * d_model :]
    z = fft_causal_conv(
        jnp.moveaxis(jnp.asarray(v * x1), 0, -1), jnp.asarray(k), jnp.asarray(bias)
    )
    ref = np.asarray(jnp.moveaxis(z, -1, 0)) * x2

    got = gated_fft_conv_cm(uc16, jnp.asarray(k), jnp.asarray(bias), interpret=True)
    assert got.dtype == jnp.bfloat16
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got, np.float32), ref, atol=0.1 * scale)


def test_gated_conv_cm_grad_matches_composed_reference():
    """Custom VJP of the fused op vs autodiff through the composed math."""
    import jax

    from deepchopper_tpu.ops.pallas_fft import gated_fft_conv_cm

    rng = np.random.default_rng(3)
    d_model, batch, seq_len = 3, 2, 256
    uc = jnp.asarray(rng.standard_normal((3 * d_model, batch, seq_len)), jnp.float32)
    k = jnp.asarray(
        rng.standard_normal((seq_len, d_model)) * np.exp(-np.arange(seq_len) / 40.0)[:, None],
        jnp.float32,
    )
    bias = jnp.asarray(rng.standard_normal(d_model), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((d_model, batch, seq_len)), jnp.float32)

    def loss_ref(uc, k, b):
        x2, x1, v = uc[:d_model], uc[d_model : 2 * d_model], uc[2 * d_model :]
        z = fft_causal_conv(jnp.moveaxis(v * x1, 0, -1), k, b)
        return jnp.sum(jnp.moveaxis(z, -1, 0) * x2 * cot)

    def loss_fused(uc, k, b):
        return jnp.sum(
            gated_fft_conv_cm(uc, k, b, interpret=True, precision="float32") * cot
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(uc, k, bias)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(uc, k, bias)
    for a, b_, name in zip(g_ref, g_fus, "uc k bias".split()):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=3e-4 * scale, err_msg=name
        )


def test_pallas_conv_rejects_non_pow2():
    with pytest.raises(ValueError):
        fft_causal_conv_pallas(
            jnp.zeros((2, 100, 4), jnp.float32),
            jnp.zeros((100, 4), jnp.float32),
            jnp.zeros((4,), jnp.float32),
        )


def test_split_lane_rules():
    # n1 is the lane dim: 128 when affordable, 64 below N=2048; h >= 4 always.
    for n in (512, 1024, 2048, 4096, 65536):
        n1, n2 = _split(n)
        assert n1 * n2 == n
        assert n1 in (64, 128)
        assert n2 // 2 >= 4
    with pytest.raises(ValueError):
        _split(256)


def test_khat_scrambled_layout():
    """Scrambled spectrum must be the digit permutation of the natural FFT."""
    n = 512
    n1, n2 = _split(n)
    rng = np.random.default_rng(0)
    k = rng.standard_normal((n // 2, 3)).astype(np.float32)
    kr, ki = khat_scrambled(jnp.asarray(k), n)
    ref = np.fft.fft(np.pad(k, ((0, n - n // 2), (0, 0))), axis=0).T / n  # (D, N)
    # scrambled[d, k2, k1] == natural[d, k2 + n2*k1]
    nat = np.asarray(kr) + 1j * np.asarray(ki)
    for k1 in range(0, n1, 17):
        for k2 in range(0, n2, 3):
            np.testing.assert_allclose(
                nat[:, k2, k1], ref[:, k2 + n2 * k1], atol=2e-4 * np.abs(ref).max()
            )


def test_khat_bias_fold_is_delta_tap():
    n = 512
    rng = np.random.default_rng(1)
    k = rng.standard_normal((n // 2, 2)).astype(np.float32)
    bias = np.asarray([0.5, -2.0], np.float32)
    r0, i0 = khat_scrambled(jnp.asarray(k), n)
    kb = k.copy()
    kb[0] += bias
    r1, i1 = khat_scrambled(jnp.asarray(kb), n)
    r2, i2 = khat_scrambled(jnp.asarray(k), n, jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(i2), np.asarray(i1), atol=1e-6)
    assert np.abs(np.asarray(r2) - np.asarray(r0)).max() > 1e-4  # bias actually changed it


def test_tables_orthogonality():
    """Forward followed by inverse tables must reconstruct the identity."""
    n = 1024
    n1, n2 = _split(n)
    t = _tables(n)
    # DFT_{n1} then IDFT_{n1} (scaled by n1) is identity.
    f1 = t["c1"] + 1j * t["s1"]
    i1 = t["ic1"] + 1j * t["is1"]
    np.testing.assert_allclose((f1 @ i1).real / n1, np.eye(n1), atol=1e-5)


def test_pallas_conv_custom_vjp_matches_fft_grad():
    """Training on TPU backprops through the Pallas conv via the custom VJP;
    gradients must match autodiff through the stock-FFT implementation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepchopper_tpu.models.hyena import fft_causal_conv
    from deepchopper_tpu.ops.pallas_fft import fft_causal_conv_pallas

    rng = np.random.default_rng(0)
    B, L, D = 2, 256, 4
    v = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    k = jnp.asarray(
        rng.standard_normal((L, D)) * np.exp(-np.arange(L) / 40.0)[:, None], jnp.float32
    )
    bias = jnp.asarray(rng.standard_normal(D), jnp.float32)
    w = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)  # cotangent mixer

    def loss_ref(v, k, b):
        return jnp.sum(fft_causal_conv(v, k, b) * w)

    def loss_pallas(v, k, b):
        return jnp.sum(fft_causal_conv_pallas(v, k, b, interpret=True) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(v, k, bias)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(v, k, bias)
    for a, b_, name in zip(g_ref, g_pal, "v k bias".split()):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=3e-4 * scale, err_msg=name
        )


@pytest.mark.parametrize("shape", [(4, 256, 8), (2, 512, 4)])
def test_mixer_conv_cm_matches_composed_reference(shape):
    """Fully fused short-conv+gate+conv+gate kernel (interpret mode) vs the
    composed XLA reference — exercises the digit-space sequence shifts."""
    from deepchopper_tpu.ops.pallas_fft import mixer_fft_conv_cm, mixer_reference_xla

    batch, seq_len, d_model = shape
    rng = np.random.default_rng(seq_len + 3)
    proj = rng.standard_normal((3 * d_model, batch, seq_len)).astype(np.float32)
    k_short = rng.standard_normal((3, 1, 3 * d_model)).astype(np.float32)
    b_short = rng.standard_normal(3 * d_model).astype(np.float32)
    k_long = (
        rng.standard_normal((seq_len, d_model)) * np.exp(-np.arange(seq_len) / 40.0)[:, None]
    ).astype(np.float32)
    bias = rng.standard_normal(d_model).astype(np.float32)

    args = tuple(
        jnp.asarray(a) for a in (proj, k_short, b_short, k_long, bias)
    )
    ref = np.asarray(mixer_reference_xla(*args))
    got = np.asarray(mixer_fft_conv_cm(*args, interpret=True, precision="float32"))
    assert got.shape == (d_model, batch, seq_len)
    np.testing.assert_allclose(got, ref, atol=1e-4 * max(1.0, np.abs(ref).max()))


@pytest.mark.parametrize("shape", [(4, 256, 8), (2, 512, 4)])
def test_mixer_conv_bm_matches_composed_reference(shape):
    """Batch-major kernel entry (B, 3D, L) -> (B, D, L): same math as the
    channel-major reference on transposed tensors."""
    from deepchopper_tpu.ops.pallas_fft import mixer_fft_conv_bm, mixer_reference_xla

    batch, seq_len, d_model = shape
    rng = np.random.default_rng(seq_len + 5)
    proj = rng.standard_normal((3 * d_model, batch, seq_len)).astype(np.float32)
    k_short = rng.standard_normal((3, 1, 3 * d_model)).astype(np.float32)
    b_short = rng.standard_normal(3 * d_model).astype(np.float32)
    k_long = (
        rng.standard_normal((seq_len, d_model)) * np.exp(-np.arange(seq_len) / 40.0)[:, None]
    ).astype(np.float32)
    bias = rng.standard_normal(d_model).astype(np.float32)

    args = tuple(jnp.asarray(a) for a in (proj, k_short, b_short, k_long, bias))
    ref = np.asarray(mixer_reference_xla(*args))  # (D, B, L)
    got = np.asarray(
        mixer_fft_conv_bm(
            jnp.transpose(args[0], (1, 0, 2)), *args[1:], interpret=True, precision="float32"
        )
    )
    assert got.shape == (batch, d_model, seq_len)
    np.testing.assert_allclose(
        got.transpose(1, 0, 2), ref, atol=1e-4 * max(1.0, np.abs(ref).max())
    )


def test_mixer_conv_bm_grad_matches_composed_reference():
    import jax

    from deepchopper_tpu.ops.pallas_fft import mixer_fft_conv_bm, mixer_reference_xla

    rng = np.random.default_rng(13)
    d_model, batch, seq_len = 3, 2, 256
    proj_bm = jnp.asarray(rng.standard_normal((batch, 3 * d_model, seq_len)), jnp.float32)
    k_short = jnp.asarray(rng.standard_normal((3, 1, 3 * d_model)), jnp.float32)
    b_short = jnp.asarray(rng.standard_normal(3 * d_model), jnp.float32)
    k_long = jnp.asarray(
        rng.standard_normal((seq_len, d_model)) * np.exp(-np.arange(seq_len) / 40.0)[:, None],
        jnp.float32,
    )
    bias = jnp.asarray(rng.standard_normal(d_model), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((batch, d_model, seq_len)), jnp.float32)

    def loss_ref(*a):
        return jnp.sum(
            jnp.transpose(mixer_reference_xla(jnp.transpose(a[0], (1, 0, 2)), *a[1:]), (1, 0, 2))
            * cot
        )

    def loss_fused(*a):
        return jnp.sum(mixer_fft_conv_bm(*a, interpret=True, precision="float32") * cot)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(5)))(proj_bm, k_short, b_short, k_long, bias)
    g_fus = jax.grad(loss_fused, argnums=tuple(range(5)))(proj_bm, k_short, b_short, k_long, bias)
    for a, b_, name in zip(g_ref, g_fus, "proj k_short b_short k_long bias".split()):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=3e-4 * scale, err_msg=name
        )


@pytest.mark.parametrize("shape", [(4, 256, 8), (3, 512, 4)])
def test_mixer_inproj_matches_bm_composition(shape):
    """The in_proj-fused kernel == (einsum in_proj) -> bm mixer, exactly
    (same precision): the in_proj contraction moved in-kernel unchanged."""
    from deepchopper_tpu.ops.pallas_fft import mixer_fft_conv_bm, mixer_fft_conv_inproj

    batch, seq_len, d_model = shape
    rng = np.random.default_rng(seq_len + 9)
    x = jnp.asarray(rng.standard_normal((batch, d_model, seq_len)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d_model, 3 * d_model)) * 0.3, jnp.float32)
    b_in = jnp.asarray(rng.standard_normal(3 * d_model) * 0.1, jnp.float32)
    k_short = jnp.asarray(rng.standard_normal((3, 1, 3 * d_model)), jnp.float32)
    b_short = jnp.asarray(rng.standard_normal(3 * d_model), jnp.float32)
    k_long = jnp.asarray(
        rng.standard_normal((seq_len, d_model)) * np.exp(-np.arange(seq_len) / 40.0)[:, None],
        jnp.float32,
    )
    bias = jnp.asarray(rng.standard_normal(d_model), jnp.float32)

    proj = jnp.transpose(jnp.einsum("bdl,df->bfl", x, w), (0, 1, 2)) + b_in[None, :, None]
    want = mixer_fft_conv_bm(proj, k_short, b_short, k_long, bias, interpret=True, precision="float32")
    got = mixer_fft_conv_inproj(
        x, w, b_in, k_short, b_short, k_long, bias, interpret=True, precision="float32"
    )
    scale = max(1.0, float(jnp.abs(want).max()))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5 * scale)

    # gradients flow (backward composes the Pallas mixer backward + matmul VJP)
    import jax

    cot = jnp.asarray(rng.standard_normal(got.shape), jnp.float32)
    g = jax.grad(
        lambda *a: jnp.sum(
            mixer_fft_conv_inproj(*a, interpret=True, precision="float32") * cot
        ),
        argnums=(0, 1, 2),
    )(x, w, b_in, k_short, b_short, k_long, bias)
    g_ref = jax.grad(
        lambda xx, ww, bb: jnp.sum(
            mixer_fft_conv_bm(
                jnp.einsum("bdl,df->bfl", xx, ww) + bb[None, :, None],
                k_short, b_short, k_long, bias, interpret=True, precision="float32",
            )
            * cot
        ),
        argnums=(0, 1, 2),
    )(x, w, b_in)
    for a, b_, name in zip(g_ref, g, "x w b_in".split()):
        s = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=5e-5 * s, err_msg=name)


def test_mixer_bwd_pallas_matches_reference_grads():
    """The VMEM backward kernel's five gradients (dproj, dk_short, db_short,
    dk_long, dbias) match autodiff of the composed reference to f32
    rounding — the adjoint identities dw = IFFT(conj(K)*FFT(dz)) and
    dK = conj(W)*FFT(dz) are exact with the kernel's own tables."""
    import jax

    from deepchopper_tpu.ops.pallas_fft import mixer_bwd_pallas, mixer_reference_xla

    rng = np.random.default_rng(3)
    d_model, batch, seq_len = 8, 3, 256  # batch 3: exercises bt padding
    proj = jnp.asarray(rng.standard_normal((batch, 3 * d_model, seq_len)), jnp.float32)
    ksh = jnp.asarray(rng.standard_normal((3, 1, 3 * d_model)), jnp.float32)
    bsh = jnp.asarray(rng.standard_normal(3 * d_model), jnp.float32)
    kl = jnp.asarray(
        rng.standard_normal((seq_len, d_model)) * np.exp(-np.arange(seq_len) / 40.0)[:, None],
        jnp.float32,
    )
    bias = jnp.asarray(rng.standard_normal(d_model), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((batch, d_model, seq_len)), jnp.float32)

    def loss(*a):
        y = mixer_reference_xla(jnp.transpose(a[0], (1, 0, 2)), *a[1:])
        return jnp.sum(jnp.transpose(y, (1, 0, 2)) * cot)

    g_ref = jax.grad(loss, argnums=tuple(range(5)))(proj, ksh, bsh, kl, bias)
    g_pal = mixer_bwd_pallas(proj, cot, ksh, bsh, kl, bias, precision="float32", interpret=True)
    for a, b_, name in zip(g_ref, g_pal, "proj k_short b_short k_long bias".split()):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=5e-5 * scale, err_msg=name
        )


def test_mixer_conv_cm_grad_matches_composed_reference():
    import jax

    from deepchopper_tpu.ops.pallas_fft import mixer_fft_conv_cm, mixer_reference_xla

    rng = np.random.default_rng(11)
    d_model, batch, seq_len = 3, 2, 256
    proj = jnp.asarray(rng.standard_normal((3 * d_model, batch, seq_len)), jnp.float32)
    k_short = jnp.asarray(rng.standard_normal((3, 1, 3 * d_model)), jnp.float32)
    b_short = jnp.asarray(rng.standard_normal(3 * d_model), jnp.float32)
    k_long = jnp.asarray(
        rng.standard_normal((seq_len, d_model)) * np.exp(-np.arange(seq_len) / 40.0)[:, None],
        jnp.float32,
    )
    bias = jnp.asarray(rng.standard_normal(d_model), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((d_model, batch, seq_len)), jnp.float32)

    def loss_ref(*a):
        return jnp.sum(mixer_reference_xla(*a) * cot)

    def loss_fused(*a):
        return jnp.sum(mixer_fft_conv_cm(*a, interpret=True, precision="float32") * cot)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(5)))(proj, k_short, b_short, k_long, bias)
    g_fus = jax.grad(loss_fused, argnums=tuple(range(5)))(proj, k_short, b_short, k_long, bias)
    for a, b_, name in zip(g_ref, g_fus, "proj k_short b_short k_long bias".split()):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=3e-4 * scale, err_msg=name
        )
