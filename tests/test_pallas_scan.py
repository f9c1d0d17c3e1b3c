"""Pallas selective-scan kernel vs the XLA associative-scan reference."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepchopper_tpu.models.caduceus import selective_scan
from deepchopper_tpu.ops.pallas_scan import selective_scan_pallas


def _inputs(batch, seq_len, d_in, n, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((batch, seq_len, d_in)).astype(np.float32)
    delta = np.abs(rng.standard_normal((batch, seq_len, d_in))).astype(np.float32) * 0.1
    A = -np.abs(rng.standard_normal((d_in, n))).astype(np.float32)
    Bp = rng.standard_normal((batch, seq_len, n)).astype(np.float32)
    Cp = rng.standard_normal((batch, seq_len, n)).astype(np.float32)
    D = rng.standard_normal(d_in).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (u, delta, A, Bp, Cp, D))


@pytest.mark.parametrize("shape", [(2, 96, 8, 4), (1, 256, 16, 8), (3, 130, 8, 4)])
def test_scan_kernel_matches_reference(shape):
    batch, seq_len, d_in, n = shape
    args = _inputs(batch, seq_len, d_in, n, seed=seq_len)
    ref = np.asarray(selective_scan(*args))
    got = np.asarray(selective_scan_pallas(*args, chunk=64, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-4 * max(1.0, np.abs(ref).max()))


def test_scan_kernel_reverse_matches_flipped_reference():
    args = _inputs(2, 96, 8, 4, seed=7)
    u, delta, A, Bp, Cp, D = args
    ref = jnp.flip(
        selective_scan(jnp.flip(u, 1), jnp.flip(delta, 1), A, jnp.flip(Bp, 1), jnp.flip(Cp, 1), D),
        1,
    )
    got = selective_scan_pallas(*args, chunk=64, reverse=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4 * max(1.0, float(jnp.abs(ref).max()))
    )


def test_scan_kernel_batch_tiling_and_ragged_length():
    # seq_len not a multiple of chunk AND batch not a multiple of the tile.
    args = _inputs(5, 100, 8, 4, seed=3)
    ref = np.asarray(selective_scan(*args))
    got = np.asarray(selective_scan_pallas(*args, chunk=32, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-4 * max(1.0, np.abs(ref).max()))


def test_scan_kernel_grad_matches_reference():
    args = _inputs(1, 64, 4, 4, seed=1)
    cot = jnp.asarray(np.random.default_rng(2).standard_normal((1, 64, 4)), jnp.float32)

    def loss_ref(*a):
        return jnp.sum(selective_scan(*a) * cot)

    def loss_pal(*a):
        return jnp.sum(selective_scan_pallas(*a, chunk=32, interpret=True) * cot)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_pal = jax.grad(loss_pal, argnums=tuple(range(6)))(*args)
    for a, b, name in zip(g_ref, g_pal, "u delta A Bp Cp D".split()):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-4 * scale, err_msg=name
        )


def test_dispatch_selects_xla_off_tpu():
    """Off-TPU the mixer must use the chunked associative scan (the Pallas
    kernel's interpret mode is test-only — too slow for CPU inference)."""
    from deepchopper_tpu.models import caduceus as cad

    assert jax.default_backend() != "tpu"  # CPU test environment
    args = _inputs(1, 64, 4, 4, seed=9)

    class Cfg:
        scan_chunk = 32

    out = cad.dispatch_selective_scan(*args, Cfg())
    ref = cad.selective_scan(*args, chunk=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_scan_bwd_pallas_matches_reference_grads(reverse):
    """The two-pass VMEM backward (chunk checkpoints + reverse cotangent
    walk) matches autodiff of the associative-scan reference to f32
    rounding for all six gradients, both scan directions, with chunk AND
    batch padding exercised."""
    import jax

    from deepchopper_tpu.ops.pallas_scan import (
        _scan_reference_xla,
        selective_scan_pallas_bwd,
    )

    rng = np.random.default_rng(7)
    B, L, Din, N = 3, 200, 12, 4  # L=200, chunk=64: padded tail; B=3: bt pad
    u = jnp.asarray(rng.standard_normal((B, L, Din)), jnp.float32)
    delta = jnp.asarray(rng.uniform(0.01, 0.3, (B, L, Din)), jnp.float32)
    A = jnp.asarray(-rng.uniform(0.1, 2.0, (Din, N)), jnp.float32)
    Bp = jnp.asarray(rng.standard_normal((B, L, N)), jnp.float32)
    Cp = jnp.asarray(rng.standard_normal((B, L, N)), jnp.float32)
    Dsk = jnp.asarray(rng.standard_normal(Din), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((B, L, Din)), jnp.float32)

    g_ref = jax.grad(
        lambda *a: jnp.sum(_scan_reference_xla(*a, reverse) * dy), argnums=tuple(range(6))
    )(u, delta, A, Bp, Cp, Dsk)
    g_pal = selective_scan_pallas_bwd(
        u, delta, A, Bp, Cp, Dsk, dy, chunk=64, reverse=reverse, interpret=True
    )
    for a, b_, name in zip(g_ref, g_pal, "u delta A Bp Cp D".split()):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=1e-5 * scale, err_msg=name
        )
