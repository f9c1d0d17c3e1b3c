"""Caduceus bidirectional-Mamba backbone: scan correctness + model contract.

(reference capability: deepchopper/models/llm/caduceus.py:5-55)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deepchopper_tpu.models import selective_scan
from deepchopper_tpu.models.registry import DeepChopper


def sequential_scan_reference(u, delta, A, B, C, D):
    """O(L) literal recurrence: the ground truth for the parallel scan."""
    Bsz, L, Din = u.shape
    N = A.shape[1]
    y = np.zeros_like(u)
    for b in range(Bsz):
        h = np.zeros((Din, N), np.float64)
        for t in range(L):
            a = np.exp(delta[b, t][:, None] * A)  # (Din, N)
            h = a * h + delta[b, t][:, None] * B[b, t][None, :] * u[b, t][:, None]
            y[b, t] = (h * C[b, t][None, :]).sum(-1) + D * u[b, t]
    return y


def test_selective_scan_matches_sequential():
    rng = np.random.default_rng(0)
    Bsz, L, Din, N = 2, 17, 6, 4
    u = rng.standard_normal((Bsz, L, Din)).astype(np.float32)
    delta = rng.uniform(0.01, 0.3, (Bsz, L, Din)).astype(np.float32)
    A = -rng.uniform(0.1, 2.0, (Din, N)).astype(np.float32)
    B = rng.standard_normal((Bsz, L, N)).astype(np.float32)
    C = rng.standard_normal((Bsz, L, N)).astype(np.float32)
    D = rng.standard_normal(Din).astype(np.float32)
    got = np.asarray(
        selective_scan(*(jnp.asarray(x) for x in (u, delta, A, B, C, D)))
    )
    ref = sequential_scan_reference(u, delta, A, B, C, D)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_chunked_scan_matches_flat():
    """The O(chunk)-memory lax.scan formulation is exact vs the flat parallel
    scan — including a carried-state boundary mid-sequence and identity-map
    tail padding when L is not a chunk multiple."""
    rng = np.random.default_rng(3)
    Bsz, L, Din, N = 2, 53, 6, 4
    u = rng.standard_normal((Bsz, L, Din)).astype(np.float32)
    delta = rng.uniform(0.01, 0.3, (Bsz, L, Din)).astype(np.float32)
    A = -rng.uniform(0.1, 2.0, (Din, N)).astype(np.float32)
    B = rng.standard_normal((Bsz, L, N)).astype(np.float32)
    C = rng.standard_normal((Bsz, L, N)).astype(np.float32)
    D = rng.standard_normal(Din).astype(np.float32)
    args = tuple(jnp.asarray(x) for x in (u, delta, A, B, C, D))
    flat = np.asarray(selective_scan(*args))
    for chunk in (8, 16, 53, 64):  # divides, doesn't, exact, larger-than-L
        got = np.asarray(selective_scan(*args, chunk=chunk))
        np.testing.assert_allclose(got, flat, atol=1e-5, err_msg=f"chunk={chunk}")
    # gradients flow through the chunked path
    g = jax.grad(lambda v: jnp.sum(selective_scan(v, *args[1:], chunk=16)))(args[0])
    assert np.isfinite(np.asarray(g)).all()


def test_reverse_mixer_matches_flip_formulation():
    """MambaMixer(reverse=True) == flip(mixer(flip(x))) with shared params —
    the flip-free reverse pass of the bidirectional mixer is exact."""
    from deepchopper_tpu.models.caduceus import MambaMixer
    from deepchopper_tpu.models.config import CADUCEUS_TINY

    import dataclasses

    cfg = dataclasses.replace(CADUCEUS_TINY, compute_dtype="float32")
    mixer = MambaMixer(cfg)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 33, cfg.d_model)), jnp.float32)
    params = mixer.init(jax.random.PRNGKey(0), x)["params"]
    want = jnp.flip(mixer.apply({"params": params}, jnp.flip(x, axis=1)), axis=1)
    got = mixer.apply({"params": params}, x, reverse=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_reverse_short_conv_matches_flip():
    from deepchopper_tpu.models.caduceus import short_depthwise_conv_rev
    from deepchopper_tpu.models.hyena import short_depthwise_conv

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 19, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((4, 1, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(8), jnp.float32)
    want = jnp.flip(short_depthwise_conv(jnp.flip(x, axis=1), k, b), axis=1)
    got = short_depthwise_conv_rev(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_caduceus_forward_shape_and_grad():
    bundle = DeepChopper.new("caduceus-tiny", seed=0)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(7, 12, (2, 64)), jnp.int32)
    quals = jnp.asarray(rng.random((2, 64)), jnp.float32)
    logits = bundle.apply(ids, quals)
    assert logits.shape == (2, 64, 2)
    assert np.isfinite(np.asarray(logits)).all()

    def loss(params):
        out = bundle.module.apply({"params": params}, ids, quals)
        return jnp.mean(out**2)

    grads = jax.grad(loss)(bundle.params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)


def test_caduceus_bidirectional_sees_future_context():
    """A causal model's logits at position t can't depend on tokens after t;
    the bidirectional Caduceus must."""
    bundle = DeepChopper.new("caduceus-tiny", seed=0)
    rng = np.random.default_rng(2)
    ids = rng.integers(7, 12, (1, 64)).astype(np.int32)
    quals = np.zeros((1, 64), np.float32)
    base = np.asarray(bundle.apply(jnp.asarray(ids), jnp.asarray(quals)))
    ids2 = ids.copy()
    ids2[0, 16] = (ids2[0, 16] - 7 + 1) % 5 + 7  # mutate a LATER token
    out2 = np.asarray(bundle.apply(jnp.asarray(ids2), jnp.asarray(quals)))
    # Positions a few steps earlier must change (future context flows
    # backward; the SSM state decays, so probe nearby).
    assert np.abs(base[0, 10:16] - out2[0, 10:16]).max() > 0


def test_caduceus_registry_names_match_reference():
    from deepchopper_tpu.models import MODEL_REGISTRY

    # (reference: deepchopper/models/llm/caduceus.py:5-14 BACKBONES list)
    for name in [
        "hyenadna-tiny-1k-seqlen",
        "hyenadna-small-32k-seqlen",
        "caduceus-ph_seqlen-131k_d_model-256_n_layer-16",
        "caduceus-ps_seqlen-131k_d_model-256_n_layer-16",
    ]:
        assert name in MODEL_REGISTRY
