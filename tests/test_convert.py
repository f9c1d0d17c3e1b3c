"""Torch->JAX checkpoint conversion (reference weight layouts).

Builds a synthetic torch state dict in the reference's Lightning/HF-hyenadna
key layout (reference: deepchopper/models/dc_hg.py:90-163 — `net.backbone` =
HF hyenadna port, `net.head` = MLP head) and validates the mapping into the
flax pytree, plus head-math parity against a NumPy re-implementation of the
torch head forward (reference: deepchopper/models/llm/head.py:95-102).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from deepchopper_tpu.models.convert import convert_torch_state_dict
from deepchopper_tpu.models.registry import DeepChopper


def synth_torch_ckpt(path, params):
    """Torch state dict mirroring the shapes of our flax template."""
    rng = np.random.default_rng(0)
    sd = {}

    def t(shape):
        return torch.tensor(rng.standard_normal(shape).astype(np.float32))

    bb = params["backbone"]
    emb = bb["word_embeddings"]["embedding"]
    sd["net.backbone.backbone.embeddings.word_embeddings.weight"] = t(emb.shape)

    n_layer = sum(1 for k in bb if k.startswith("block_"))
    for i in range(n_layer):
        blk = bb[f"block_{i}"]
        pt = f"net.backbone.backbone.layers.{i}"
        for norm in ("norm1", "norm2"):
            sd[f"{pt}.{norm}.weight"] = t(blk[norm]["scale"].shape)
            sd[f"{pt}.{norm}.bias"] = t(blk[norm]["bias"].shape)
        for fc in ("fc1", "fc2"):
            k = blk["mlp"][fc]["kernel"]
            sd[f"{pt}.mlp.{fc}.weight"] = t((k.shape[1], k.shape[0]))
            sd[f"{pt}.mlp.{fc}.bias"] = t(blk["mlp"][fc]["bias"].shape)
        mixer = blk["mixer"]
        for proj in ("in_proj", "out_proj"):
            k = mixer[proj]["kernel"]
            sd[f"{pt}.mixer.{proj}.weight"] = t((k.shape[1], k.shape[0]))
            sd[f"{pt}.mixer.{proj}.bias"] = t(mixer[proj]["bias"].shape)
        ks = mixer["short_filter_kernel"]  # ours (k, 1, W); torch (W, 1, k)
        sd[f"{pt}.mixer.short_filter.weight"] = t((ks.shape[2], 1, ks.shape[0]))
        sd[f"{pt}.mixer.short_filter.bias"] = t(mixer["short_filter_bias"].shape)
        filt = mixer["filter_fn"]
        sd[f"{pt}.mixer.filter_fn.bias"] = t(filt["bias"].shape)
        # implicit_filter Sequential: 0=Linear, 1=Sin, 2=Linear, 3=Sin, 4=Linear, 5=Sin, 6=Linear(out)
        lins = ["mlp_in"] + sorted(k for k in filt if k.startswith("mlp_") and k[4:].isdigit())
        seq_idx = 0
        for li, name in enumerate(lins):
            k = filt[name]["kernel"]
            sd[f"{pt}.mixer.filter_fn.implicit_filter.{seq_idx}.weight"] = t(
                (k.shape[1], k.shape[0])
            )
            sd[f"{pt}.mixer.filter_fn.implicit_filter.{seq_idx}.bias"] = t(
                filt[name]["bias"].shape
            )
            seq_idx += 1
            sd[f"{pt}.mixer.filter_fn.implicit_filter.{seq_idx}.freq"] = t(
                filt[f"sin_freq_{li}"].shape
            )
            seq_idx += 1
        k = filt["mlp_out"]["kernel"]
        sd[f"{pt}.mixer.filter_fn.implicit_filter.{seq_idx}.weight"] = t(
            (k.shape[1], k.shape[0])
        )

    sd["net.backbone.backbone.ln_f.weight"] = t(bb["ln_f"]["scale"].shape)
    sd["net.backbone.backbone.ln_f.bias"] = t(bb["ln_f"]["bias"].shape)

    head = params["head"]
    for lin in ("linear1", "linear2", "linear3"):
        k = head[lin]["kernel"]
        sd[f"net.head.{lin}.weight"] = t((k.shape[1], k.shape[0]))
        sd[f"net.head.{lin}.bias"] = t(head[lin]["bias"].shape)

    torch.save({"state_dict": sd}, path)
    return sd


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen", seed=0)
    path = tmp_path_factory.mktemp("ckpt") / "ref.ckpt"
    sd = synth_torch_ckpt(path, bundle.params)
    params = convert_torch_state_dict(path, bundle.params)
    return bundle, sd, params


def test_convert_maps_all_expected_leaves(converted):
    bundle, sd, params = converted
    bb = params["backbone"]
    np.testing.assert_allclose(
        bb["word_embeddings"]["embedding"],
        sd["net.backbone.backbone.embeddings.word_embeddings.weight"].numpy()[
            : bb["word_embeddings"]["embedding"].shape[0]
        ],
    )
    blk = bb["block_0"]
    np.testing.assert_allclose(
        blk["mlp"]["fc1"]["kernel"],
        sd["net.backbone.backbone.layers.0.mlp.fc1.weight"].numpy().T,
    )
    np.testing.assert_allclose(
        blk["mixer"]["short_filter_kernel"],
        np.transpose(sd["net.backbone.backbone.layers.0.mixer.short_filter.weight"].numpy(), (2, 1, 0)),
    )
    np.testing.assert_allclose(
        params["head"]["linear3"]["kernel"], sd["net.head.linear3.weight"].numpy().T
    )


def test_convert_forward_runs(converted):
    import jax.numpy as jnp

    bundle, _sd, params = converted
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(7, 12, (2, 64)), jnp.int32)
    quals = jnp.asarray(rng.random((2, 64)), jnp.float32)
    logits = bundle.module.apply({"params": params}, ids, quals)
    assert logits.shape == (2, 64, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_head_math_matches_torch_reference(converted):
    """Our head with converted weights == literal torch head forward."""
    import jax.numpy as jnp

    bundle, sd, params = converted
    head_p = params["head"]
    rng = np.random.default_rng(2)
    d_in = head_p["linear1"]["kernel"].shape[0]
    x = rng.standard_normal((2, 16, d_in)).astype(np.float32)
    quals = rng.random((2, 16)).astype(np.float32)

    # Literal torch math (reference: head.py:95-102), identity qual layer.
    def relu(a):
        return np.maximum(a, 0)

    w1, b1 = sd["net.head.linear1.weight"].numpy(), sd["net.head.linear1.bias"].numpy()
    w2, b2 = sd["net.head.linear2.weight"].numpy(), sd["net.head.linear2.bias"].numpy()
    w3, b3 = sd["net.head.linear3.weight"].numpy(), sd["net.head.linear3.bias"].numpy()
    out = relu(x @ w1.T + b1)
    residual = out + quals[..., None]
    out = relu(residual @ w2.T + b2 + residual)
    expected = out @ w3.T + b3

    import dataclasses

    from deepchopper_tpu.models.head import TokenClassificationHead

    # Pin f32 for the exactness check (prod default is bf16 matmuls; argmax
    # stability under bf16 is covered by test_torch_parity.py).
    cfg32 = dataclasses.replace(bundle.module.head_config, compute_dtype="float32")
    module = TokenClassificationHead(cfg32)
    got = np.asarray(module.apply({"params": head_p}, jnp.asarray(x), jnp.asarray(quals)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)
