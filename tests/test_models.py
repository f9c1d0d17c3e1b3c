"""Model-plane tests: shapes, jit, numerics, checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepchopper_tpu.models import (
    DeepChopper,
    HeadConfig,
    HyenaConfig,
    HyenaTokenClassifier,
    TokenClassificationHead,
    build_model,
    fft_causal_conv,
    init_params,
    load_checkpoint,
    save_checkpoint,
)

TINY = HyenaConfig(d_model=64, n_layer=2, d_inner=128, max_seq_len=2048)
# Numeric-property tests run in f32: bf16 matmul rounding varies with padding
# shape (XLA tiling) at the ~1e-2 level, which is mixed-precision noise, not an
# architecture property.
TINY_F32 = HyenaConfig(
    d_model=64, n_layer=2, d_inner=128, max_seq_len=2048, compute_dtype="float32"
)
TINY_HEAD = HeadConfig(input_size=64, lin1_size=96, lin2_size=96, num_class=2)


@pytest.fixture(scope="module")
def tiny_bundle():
    module = HyenaTokenClassifier(backbone_config=TINY, head_config=TINY_HEAD)
    params = init_params(module, seed=0, seq_len=128, batch=1)
    return module, params


@pytest.fixture(scope="module")
def tiny_bundle_f32():
    module = HyenaTokenClassifier(backbone_config=TINY_F32, head_config=TINY_HEAD)
    params = init_params(module, seed=0, seq_len=128, batch=1)
    return module, params


class TestHyena:
    def test_forward_shape(self, tiny_bundle):
        module, params = tiny_bundle
        ids = jnp.zeros((2, 256), dtype=jnp.int32)
        quals = jnp.zeros((2, 256), dtype=jnp.float32)
        logits = module.apply({"params": params}, ids, quals)
        assert logits.shape == (2, 256, 2)
        assert logits.dtype == jnp.float32

    def test_jit_and_length_generalization(self, tiny_bundle):
        module, params = tiny_bundle
        fwd = jax.jit(lambda p, i, q: module.apply({"params": p}, i, q))
        for L in (64, 512):
            out = fwd(params, jnp.zeros((1, L), jnp.int32), jnp.zeros((1, L), jnp.float32))
            assert out.shape == (1, L, 2)

    def test_causality(self, tiny_bundle_f32):
        """Future bases must not change past logits (causal conv stack)."""
        module, params = tiny_bundle_f32
        rng = np.random.default_rng(0)
        ids = rng.integers(7, 12, (1, 128)).astype(np.int32)
        quals = rng.random((1, 128)).astype(np.float32)
        out1 = module.apply({"params": params}, jnp.asarray(ids), jnp.asarray(quals))
        ids2 = ids.copy()
        ids2[0, 100:] = 7  # mutate the tail
        out2 = module.apply({"params": params}, jnp.asarray(ids2), jnp.asarray(quals))
        np.testing.assert_allclose(out1[0, :100], out2[0, :100], atol=2e-4)
        assert not np.allclose(out1[0, 100:], out2[0, 100:])

    def test_padding_invariance_with_right_pad(self, tiny_bundle_f32):
        """Right padding must not change logits at valid positions — the
        property that makes bucketed fixed shapes safe on TPU."""
        module, params = tiny_bundle_f32
        rng = np.random.default_rng(1)
        ids = rng.integers(7, 12, (1, 100)).astype(np.int32)
        quals = rng.random((1, 100)).astype(np.float32)
        out = module.apply({"params": params}, jnp.asarray(ids), jnp.asarray(quals))
        padded_ids = np.concatenate([ids, np.full((1, 28), 4, np.int32)], axis=1)
        padded_quals = np.concatenate([quals, np.zeros((1, 28), np.float32)], axis=1)
        out_p = module.apply({"params": params}, jnp.asarray(padded_ids), jnp.asarray(padded_quals))
        np.testing.assert_allclose(out[0], out_p[0, :100], atol=2e-4)


class TestFftConv:
    def test_matches_direct_convolution(self):
        rng = np.random.default_rng(0)
        L, D = 64, 4
        v = rng.standard_normal((2, L, D)).astype(np.float32)
        k = rng.standard_normal((L, D)).astype(np.float32)
        bias = rng.standard_normal(D).astype(np.float32)
        out = np.asarray(fft_causal_conv(jnp.asarray(v), jnp.asarray(k), jnp.asarray(bias)))
        # direct causal conv: y[t] = sum_{s<=t} v[s] k[t-s]
        expect = np.zeros_like(v)
        for b in range(2):
            for d in range(D):
                expect[b, :, d] = np.convolve(v[b, :, d], k[:, d])[:L]
        expect += v * bias[None, None, :]
        np.testing.assert_allclose(out, expect, atol=1e-3)


class TestHead:
    def test_identity_qual_residual_matches_torch_semantics(self):
        """With identity qual layer, the qual is broadcast-added to the lin1
        output — mirror of head.py:75-102 in the reference."""
        import torch

        cfg = HeadConfig(input_size=8, lin1_size=16, lin2_size=16, num_class=2, compute_dtype="float32")
        head = TokenClassificationHead(cfg)
        rng = np.random.default_rng(0)
        hidden = rng.standard_normal((1, 10, 8)).astype(np.float32)
        quals = rng.random((1, 10)).astype(np.float32)
        params = head.init(jax.random.PRNGKey(0), jnp.asarray(hidden), jnp.asarray(quals))["params"]
        mine = head.apply({"params": params}, jnp.asarray(hidden), jnp.asarray(quals))

        # Torch reference computation with the same weights
        w1 = torch.tensor(np.asarray(params["linear1"]["kernel"]).T)
        b1 = torch.tensor(np.asarray(params["linear1"]["bias"]))
        w2 = torch.tensor(np.asarray(params["linear2"]["kernel"]).T)
        b2 = torch.tensor(np.asarray(params["linear2"]["bias"]))
        w3 = torch.tensor(np.asarray(params["linear3"]["kernel"]).T)
        b3 = torch.tensor(np.asarray(params["linear3"]["bias"]))
        x = torch.tensor(hidden)
        q = torch.tensor(quals)
        out = torch.relu(x @ w1.T + b1)
        residual = out + q.unsqueeze(-1)
        out = torch.relu(residual @ w2.T + b2 + residual)
        out = out @ w3.T + b3
        np.testing.assert_allclose(np.asarray(mine), out.numpy(), atol=1e-5)


class TestHeadCM:
    def test_cm_head_matches_bld_head(self):
        """Channel-major head: same params, same math — logits equal the
        (B, L, D) head's (transposed) to f32 tolerance."""
        from deepchopper_tpu.models.head import TokenClassificationHeadCM

        cfg = HeadConfig(
            input_size=8, lin1_size=16, lin2_size=16, num_class=2, compute_dtype="float32"
        )
        head = TokenClassificationHead(cfg)
        head_cm = TokenClassificationHeadCM(cfg)
        rng = np.random.default_rng(1)
        hidden = rng.standard_normal((3, 10, 8)).astype(np.float32)
        quals = rng.random((3, 10)).astype(np.float32)
        params = head.init(jax.random.PRNGKey(0), jnp.asarray(hidden), jnp.asarray(quals))["params"]
        # identical param tree consumable by both variants
        params_cm = head_cm.init(
            jax.random.PRNGKey(0), jnp.asarray(hidden).transpose(2, 0, 1), jnp.asarray(quals)
        )["params"]
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_cm)
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params_cm)):
            assert a.shape == b.shape

        want = head.apply({"params": params}, jnp.asarray(hidden), jnp.asarray(quals))
        got = head_cm.apply(
            {"params": params}, jnp.asarray(hidden).transpose(2, 0, 1), jnp.asarray(quals)
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(1, 2, 0), np.asarray(want), atol=1e-5
        )

    def test_classifier_cm_head_default_matches_bld_path(self, monkeypatch):
        """The flagship classifier's CM-head default produces the same logits
        (f32 path) as DEEPCHOPPER_CM_HEAD=0, from the same checkpoint."""
        import dataclasses

        from deepchopper_tpu.models import HyenaTokenClassifier, init_params
        from deepchopper_tpu.models.config import TINY_1K

        cfg = dataclasses.replace(TINY_1K, compute_dtype="float32", conv_impl="fft")
        hcfg = HeadConfig(
            input_size=cfg.d_model, lin1_size=64, lin2_size=64, compute_dtype="float32"
        )
        module = HyenaTokenClassifier(backbone_config=cfg, head_config=hcfg)
        rng = np.random.default_rng(2)
        ids = jnp.asarray(rng.integers(7, 11, (2, 64)), jnp.int32)
        quals = jnp.asarray(rng.random((2, 64)), jnp.float32)

        monkeypatch.setenv("DEEPCHOPPER_CM_HEAD", "1")
        params = init_params(module, seq_len=64)
        out_cm = module.apply({"params": params}, ids, quals)
        monkeypatch.setenv("DEEPCHOPPER_CM_HEAD", "0")
        out_bld = module.apply({"params": params}, ids, quals)
        assert out_cm.shape == out_bld.shape == (2, 64, 2)
        np.testing.assert_allclose(np.asarray(out_cm), np.asarray(out_bld), atol=2e-5)


class TestHeadBf16:
    def test_bf16_head_matches_f32_argmax(self):
        """The default bf16 head must stay argmax-stable vs the f32 head.

        bf16 matmuls accumulate in f32 on the MXU; the only deltas are input
        rounding (~3 decimal digits), so per-base decisions agree except for
        exact near-ties. We require logits close at bf16 tolerance, float32
        output dtype, and >=99% argmax agreement on random (worst-case:
        near-zero-logit) inputs — a trained model's confident logits agree
        exactly."""
        import dataclasses

        cfg32 = HeadConfig(
            input_size=64, lin1_size=128, lin2_size=128, num_class=2, compute_dtype="float32"
        )
        cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
        rng = np.random.default_rng(42)
        hidden = rng.standard_normal((8, 256, 64)).astype(np.float32)
        quals = rng.random((8, 256)).astype(np.float32)
        h32 = TokenClassificationHead(cfg32)
        params = h32.init(jax.random.PRNGKey(1), jnp.asarray(hidden), jnp.asarray(quals))["params"]
        out32 = np.asarray(h32.apply({"params": params}, jnp.asarray(hidden), jnp.asarray(quals)))
        h16 = TokenClassificationHead(cfg16)
        out16 = np.asarray(h16.apply({"params": params}, jnp.asarray(hidden), jnp.asarray(quals)))
        assert out16.dtype == np.float32
        scale = max(1.0, float(np.abs(out32).max()))
        np.testing.assert_allclose(out16, out32, atol=0.03 * scale)
        agree = (out16.argmax(-1) == out32.argmax(-1)).mean()
        assert agree >= 0.99, agree


class TestRegistryAndCheckpoints:
    def test_build_known_models(self):
        for name in ("transformer", "cnn", "hyenadna-tiny-1k-seqlen"):
            assert build_model(name) is not None

    def test_unknown_model_raises(self):
        with pytest.raises(KeyError):
            build_model("nope")

    def test_checkpoint_roundtrip(self, tiny_bundle, tmp_path):
        module, params = tiny_bundle
        save_checkpoint(tmp_path / "ckpt.dc", params, {"name": "tiny"})
        loaded, meta = load_checkpoint(tmp_path / "ckpt.dc", params)
        assert meta["name"] == "tiny"
        flat1 = jax.tree_util.tree_leaves(params)
        flat2 = jax.tree_util.tree_leaves(loaded)
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_head_overrides_survive_checkpoint_rebuild(self, tmp_path):
        """A sweep trial with a non-default head must reload through
        from_checkpoint (the test-on-best path) with the SAME overrides;
        dropping them collides the saved 96-wide head with the 1024-wide
        registry default."""
        over = {"lin1_size": 96}
        bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen", head_overrides=over)
        save_checkpoint(tmp_path / "t.dc", bundle.params, {})
        re = DeepChopper.from_checkpoint(
            tmp_path / "t.dc", "hyenadna-tiny-1k-seqlen", head_overrides=over
        )
        assert re.module.head_config.lin1_size == 96
        ids = jnp.zeros((1, 64), jnp.int32)
        quals = jnp.zeros((1, 64), jnp.float32)
        assert re.apply(ids, quals).shape == (1, 64, 2)
        with pytest.raises(Exception):  # default-head template mismatches
            DeepChopper.from_checkpoint(tmp_path / "t.dc", "hyenadna-tiny-1k-seqlen")

    def test_from_pretrained_without_ckpt_is_hard_error(self):
        # Silent random init produced garbage predictions; it must raise now
        # unless random_init is explicitly requested.
        with pytest.raises(FileNotFoundError, match="random-init"):
            DeepChopper.from_pretrained("hyenadna-tiny-1k-seqlen")

    def test_from_pretrained_random_init_escape_hatch(self):
        bundle = DeepChopper.from_pretrained("hyenadna-tiny-1k-seqlen", random_init=True)
        ids = jnp.zeros((1, 64), jnp.int32)
        quals = jnp.zeros((1, 64), jnp.float32)
        assert bundle.apply(ids, quals).shape == (1, 64, 2)


class TestPretrainedDir:
    """HF-hub-style local save_pretrained/from_pretrained round trip."""

    def test_roundtrip(self, tmp_path):
        import numpy as np

        bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen", seed=1)
        out = DeepChopper.save_pretrained(bundle, tmp_path / "model_dir")
        assert (out / "config.json").exists() and (out / "model.dc").exists()

        loaded = DeepChopper.from_pretrained(str(out))
        for a, b in zip(
            jax.tree_util.tree_leaves(bundle.params),
            jax.tree_util.tree_leaves(loaded.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_to_hub_writes_upload_folder(self, tmp_path):
        bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen")
        out = DeepChopper.to_hub(bundle, "user/model", tmp_path / "hub")
        assert (out / "config.json").exists()
