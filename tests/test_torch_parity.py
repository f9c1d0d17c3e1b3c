"""Backbone numerical parity: torch HyenaDNA oracle -> converter -> JAX.

A literal torch re-implementation of the HyenaDNA token classifier (state-dict
key layout identical to the reference's Lightning checkpoint: `net.backbone`
is the HF hyenadna port with its inner `.backbone` LM, `net.head` the MLP head
— reference: deepchopper/models/dc_hg.py:140-162, deepchopper/models/llm/
hyena.py:8-41, head.py:39-102, and the public LongSafari hyenadna-*-hf module)
serves as the conversion oracle: its state_dict goes through
models.convert.convert_torch_state_dict and the JAX forward must match the
torch forward within float32 tolerance — and exactly in per-base argmax.

This validates the converter's key mapping AND every operator re-derivation
(implicit filter MLP, sine activations, decay modulation, short-conv padding,
FFT conv, gate order, head residuals) end-to-end.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from deepchopper_tpu.models.classifier import HyenaTokenClassifier  # noqa: E402
from deepchopper_tpu.models.config import HeadConfig, HyenaConfig  # noqa: E402
from deepchopper_tpu.models.convert import convert_torch_state_dict  # noqa: E402
from deepchopper_tpu.models.registry import init_params  # noqa: E402

# ---------------------------------------------------------------------------
# Torch oracle (HF hyenadna-compatible key layout)
# ---------------------------------------------------------------------------


class Sin(tnn.Module):
    """Sine activation with trainable per-feature frequency (HF hyenadna Sin)."""

    def __init__(self, dim: int, w: float = 10.0):
        super().__init__()
        self.freq = tnn.Parameter(w * torch.ones(1, dim))

    def forward(self, x):
        return torch.sin(self.freq * x)


class PositionalEmbedding(tnn.Module):
    def __init__(self, emb_dim: int, seq_len: int):
        super().__init__()
        self.seq_len = seq_len
        t = torch.linspace(0, 1, seq_len)[None, :, None]  # (1, L, 1)
        bands = (emb_dim - 1) // 2
        t_rescaled = torch.linspace(0, seq_len - 1, seq_len)[None, :, None]
        w = 2 * math.pi * t_rescaled / seq_len
        f = torch.linspace(1e-4, bands - 1, bands)[None, None]
        z = torch.exp(-1j * f * w)
        z = torch.cat([t, z.real, z.imag], dim=-1)
        self.register_buffer("z", z.float())
        self.register_buffer("t", t.float())

    def forward(self, L):
        return self.z[:, :L], self.t[:, :L]


class ExponentialModulation(tnn.Module):
    def __init__(self, d_model, fast_decay_pct=0.3, slow_decay_pct=1.5, target=1e-2, shift=0.0):
        super().__init__()
        self.shift = shift
        max_decay = math.log(target) / fast_decay_pct
        min_decay = math.log(target) / slow_decay_pct
        deltas = torch.linspace(min_decay, max_decay, d_model)[None, None]
        self.register_buffer("deltas", deltas)

    def forward(self, t, x):
        decay = torch.exp(-t * self.deltas.abs())
        return x * (decay + self.shift)


class HyenaFilter(tnn.Module):
    def __init__(self, cfg: HyenaConfig):
        super().__init__()
        d_filter = cfg.d_model * (cfg.hyena_order - 1)
        self.d_filter = d_filter
        self.pos_emb = PositionalEmbedding(cfg.emb_dim, cfg.max_seq_len)
        act = lambda: Sin(cfg.filter_order, cfg.activation_freq)  # noqa: E731
        layers = [tnn.Linear(cfg.emb_dim, cfg.filter_order), act()]
        for _ in range(cfg.num_inner_mlps):
            layers += [tnn.Linear(cfg.filter_order, cfg.filter_order), act()]
        layers += [tnn.Linear(cfg.filter_order, d_filter, bias=False)]
        self.implicit_filter = tnn.Sequential(*layers)
        self.modulation = ExponentialModulation(
            d_filter,
            cfg.modulation_fast_decay_pct,
            cfg.modulation_slow_decay_pct,
            cfg.modulation_target,
            cfg.modulation_shift,
        )
        self.bias = tnn.Parameter(torch.randn(d_filter))

    def filter(self, L):
        z, t = self.pos_emb(L)
        h = self.implicit_filter(z)
        return self.modulation(t, h)  # (1, L, d_filter)


def fftconv(v, k, bias):
    """v: (B, D, L), k: (D, L), bias: (D,) -> causal conv (B, D, L)."""
    L = v.shape[-1]
    fft_size = 2 * L
    k_f = torch.fft.rfft(k.float(), n=fft_size) / fft_size
    v_f = torch.fft.rfft(v.float(), n=fft_size)
    y = torch.fft.irfft(v_f * k_f, n=fft_size, norm="forward")[..., :L]
    return y + v * bias.unsqueeze(-1)


class HyenaOperator(tnn.Module):
    def __init__(self, cfg: HyenaConfig):
        super().__init__()
        d = cfg.d_model
        width = (cfg.hyena_order + 1) * d
        self.d_model = d
        self.in_proj = tnn.Linear(d, width)
        self.out_proj = tnn.Linear(d, d)
        self.short_filter = tnn.Conv1d(width, width, cfg.short_filter_order, groups=width, padding=2)
        self.filter_fn = HyenaFilter(cfg)

    def forward(self, u):
        L = u.shape[1]
        u = self.in_proj(u).transpose(1, 2)  # (B, 3d, L)
        uc = self.short_filter(u)[..., :L]
        x2, x1, v = uc.split(self.d_model, dim=1)
        k = self.filter_fn.filter(L)[0].transpose(0, 1)  # (d, L)
        v = v * x1
        v = fftconv(v, k, self.filter_fn.bias)
        y = (v * x2).transpose(1, 2)
        return self.out_proj(y)


class Mlp(tnn.Module):
    def __init__(self, cfg: HyenaConfig):
        super().__init__()
        self.fc1 = tnn.Linear(cfg.d_model, cfg.d_inner)
        self.act = tnn.GELU(approximate="tanh")
        self.fc2 = tnn.Linear(cfg.d_inner, cfg.d_model)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class Block(tnn.Module):
    def __init__(self, cfg: HyenaConfig):
        super().__init__()
        self.norm1 = tnn.LayerNorm(cfg.d_model, eps=cfg.layer_norm_epsilon)
        self.mixer = HyenaOperator(cfg)
        self.norm2 = tnn.LayerNorm(cfg.d_model, eps=cfg.layer_norm_epsilon)
        self.mlp = Mlp(cfg)

    def forward(self, x):
        x = x + self.mixer(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class Embeddings(tnn.Module):
    def __init__(self, cfg: HyenaConfig):
        super().__init__()
        self.word_embeddings = tnn.Embedding(cfg.padded_vocab_size, cfg.d_model)

    def forward(self, ids):
        return self.word_embeddings(ids)


class LMBackbone(tnn.Module):
    def __init__(self, cfg: HyenaConfig):
        super().__init__()
        self.embeddings = Embeddings(cfg)
        self.layers = tnn.ModuleList(Block(cfg) for _ in range(cfg.n_layer))
        self.ln_f = tnn.LayerNorm(cfg.d_model, eps=cfg.layer_norm_epsilon)

    def forward(self, ids):
        x = self.embeddings(ids)
        for layer in self.layers:
            x = layer(x)
        return self.ln_f(x)


class HyenaDNAModel(tnn.Module):
    """≙ the AutoModel the reference loads (hyenadna-*-hf)."""

    def __init__(self, cfg: HyenaConfig):
        super().__init__()
        self.backbone = LMBackbone(cfg)

    def forward(self, ids):
        return self.backbone(ids)


class Head(tnn.Module):
    """≙ reference TokenClassificationHead (identity qual path)."""

    def __init__(self, head: HeadConfig):
        super().__init__()
        self.linear1 = tnn.Linear(head.input_size, head.lin1_size)
        self.linear2 = tnn.Linear(head.lin1_size, head.lin2_size)
        self.linear3 = tnn.Linear(head.lin2_size, head.num_class)
        if not head.use_identity_layer_for_qual:
            self.qual_linear1 = tnn.Linear(1, head.lin1_size)
        self.identity_qual = head.use_identity_layer_for_qual

    def forward(self, hidden, quals):
        out = torch.relu(self.linear1(hidden))
        if self.identity_qual:
            qual_term = quals.unsqueeze(-1)
        else:
            qual_term = self.qual_linear1(quals.unsqueeze(-1))
        residual = out + qual_term
        out = torch.relu(self.linear2(residual) + residual)
        return self.linear3(out)


class TorchTokenClassifier(tnn.Module):
    """≙ reference TokenClassificationModule (net.backbone + net.head)."""

    def __init__(self, cfg: HyenaConfig, head: HeadConfig):
        super().__init__()
        self.backbone = HyenaDNAModel(cfg)
        self.head = Head(head)

    def forward(self, ids, quals):
        return self.head(self.backbone(ids), quals)


# ---------------------------------------------------------------------------
# Parity tests
# ---------------------------------------------------------------------------


def _configs(identity_qual: bool = True):
    cfg = HyenaConfig(
        d_model=64,
        n_layer=2,
        d_inner=128,
        emb_dim=5,
        filter_order=32,
        num_inner_mlps=2,
        max_seq_len=1026,
        compute_dtype="float32",
        conv_impl="fft",
    )
    head = HeadConfig(
        input_size=64,
        lin1_size=96,
        lin2_size=96,
        use_identity_layer_for_qual=identity_qual,
        compute_dtype="float32",  # oracle comparison at f32 tolerance
    )
    return cfg, head


@pytest.mark.parametrize("seq_len", [64, 200, 256])
@pytest.mark.parametrize("identity_qual", [True, False])
def test_hyena_forward_parity(tmp_path, seq_len, identity_qual):
    cfg, head = _configs(identity_qual)
    torch.manual_seed(0)
    tmodel = TorchTokenClassifier(cfg, head).eval()
    # Non-trivially initialized state (default init + noise on norms).
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if "norm" in name or "ln_f" in name:
                p.add_(0.05 * torch.randn_like(p))

    ckpt = tmp_path / "oracle.pt"
    # Save with the Lightning prefix the converter strips (net.*).
    torch.save({"state_dict": {f"net.{k}": v for k, v in tmodel.state_dict().items()}}, ckpt)

    rng = np.random.default_rng(seq_len)
    ids = rng.integers(7, 12, (2, seq_len))
    quals = (rng.random((2, seq_len)) * 0.1).astype(np.float32)

    with torch.no_grad():
        t_logits = tmodel(torch.tensor(ids), torch.tensor(quals)).numpy()

    module = HyenaTokenClassifier(backbone_config=cfg, head_config=head)
    template = init_params(module, seed=0, seq_len=64)
    params = convert_torch_state_dict(ckpt, template)
    j_logits = np.asarray(
        module.apply({"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(quals))
    )

    scale = np.abs(t_logits).max()
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-4 * max(1.0, scale))
    np.testing.assert_array_equal(j_logits.argmax(-1), t_logits.argmax(-1))


def test_hyena_backbone_hidden_parity(tmp_path):
    """Hidden states (pre-head) match too — isolates backbone math."""
    cfg, head = _configs()
    torch.manual_seed(1)
    tmodel = TorchTokenClassifier(cfg, head).eval()
    ckpt = tmp_path / "oracle.pt"
    torch.save(tmodel.state_dict(), ckpt)

    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, (1, 128))
    with torch.no_grad():
        t_hidden = tmodel.backbone(torch.tensor(ids)).numpy()

    from deepchopper_tpu.models.hyena import HyenaBackbone

    module = HyenaBackbone(cfg)
    import jax

    template = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64), jnp.int32))["params"]
    full = init_params(HyenaTokenClassifier(backbone_config=cfg, head_config=head), seed=0, seq_len=64)
    converted = convert_torch_state_dict(ckpt, full)
    j_hidden = np.asarray(module.apply({"params": converted["backbone"]}, jnp.asarray(ids, jnp.int32)))

    scale = np.abs(t_hidden).max()
    np.testing.assert_allclose(j_hidden, t_hidden, atol=2e-4 * max(1.0, scale))


# ---------------------------------------------------------------------------
# Caduceus (bidirectional weight-tied Mamba) oracle
# ---------------------------------------------------------------------------


class TorchMamba(tnn.Module):
    """Literal Mamba mixer mirroring the HF caduceus module's key layout
    (in_proj/conv1d/x_proj/dt_proj/A_log/D/out_proj) and math."""

    def __init__(self, d_model, d_state, d_conv, expand, dt_rank):
        super().__init__()
        d_inner = d_model * expand
        self.d_inner, self.d_state, self.dt_rank = d_inner, d_state, dt_rank
        self.in_proj = tnn.Linear(d_model, 2 * d_inner, bias=False)
        self.conv1d = tnn.Conv1d(d_inner, d_inner, d_conv, groups=d_inner, padding=d_conv - 1)
        self.x_proj = tnn.Linear(d_inner, dt_rank + 2 * d_state, bias=False)
        self.dt_proj = tnn.Linear(dt_rank, d_inner)
        self.A_log = tnn.Parameter(
            torch.log(torch.arange(1, d_state + 1, dtype=torch.float32)).repeat(d_inner, 1)
        )
        self.D = tnn.Parameter(torch.ones(d_inner))
        self.out_proj = tnn.Linear(d_inner, d_model, bias=False)

    def forward(self, x):
        B_, L, _ = x.shape
        xz = self.in_proj(x)
        xs, z = xz.chunk(2, dim=-1)
        xs = self.conv1d(xs.transpose(1, 2))[..., :L].transpose(1, 2)
        xs = torch.nn.functional.silu(xs)
        bcdt = self.x_proj(xs)
        dt, Bp, Cp = torch.split(bcdt, [self.dt_rank, self.d_state, self.d_state], dim=-1)
        delta = torch.nn.functional.softplus(self.dt_proj(dt))  # (B, L, D_in)
        A = -torch.exp(self.A_log)  # (D_in, N)
        # sequential scan: h[t] = exp(delta A) h[t-1] + delta B u;  y = C.h + D u
        h = torch.zeros(B_, self.d_inner, self.d_state)
        ys = []
        for t in range(L):
            a = torch.exp(delta[:, t, :, None] * A[None])
            h = a * h + delta[:, t, :, None] * Bp[:, t, None, :] * xs[:, t, :, None]
            ys.append((h * Cp[:, t, None, :]).sum(-1))
        y = torch.stack(ys, dim=1) + xs * self.D[None, None]
        y = y * torch.nn.functional.silu(z)
        return self.out_proj(y)


class TorchBiMamba(tnn.Module):
    """'ph' weight tying: same mamba_fwd applied to x and flip(x)."""

    def __init__(self, *args):
        super().__init__()
        self.mamba_fwd = TorchMamba(*args)

    def forward(self, x):
        fwd = self.mamba_fwd(x)
        bwd = self.mamba_fwd(torch.flip(x, dims=(1,))).flip(dims=(1,))
        return fwd + bwd


class TorchRMSNorm(tnn.Module):
    def __init__(self, d, eps=1e-5):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(d))
        self.eps = eps

    def forward(self, x):
        return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + self.eps) * self.weight


class TorchCaduceusBackbone(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.embeddings = tnn.Module()
        self.embeddings.word_embeddings = tnn.Embedding(cfg.padded_vocab_size, cfg.d_model)
        self.layers = tnn.ModuleList()
        for _ in range(cfg.n_layer):
            block = tnn.Module()
            block.norm = TorchRMSNorm(cfg.d_model, cfg.layer_norm_epsilon)
            block.mixer = TorchBiMamba(cfg.d_model, cfg.d_state, cfg.d_conv, cfg.expand, cfg.dt_rank)
            self.layers.append(block)
        self.norm_f = TorchRMSNorm(cfg.d_model, cfg.layer_norm_epsilon)

    def forward(self, ids):
        x = self.embeddings.word_embeddings(ids)
        for blk in self.layers:
            x = x + blk.mixer(blk.norm(x))
        return self.norm_f(x)


def test_caduceus_backbone_parity(tmp_path):
    import dataclasses

    from deepchopper_tpu.models.caduceus import CaduceusBackbone
    from deepchopper_tpu.models.config import CADUCEUS_TINY

    cfg = dataclasses.replace(CADUCEUS_TINY, compute_dtype="float32")
    torch.manual_seed(0)
    tmodel = tnn.Module()
    tmodel.backbone = TorchCaduceusBackbone(cfg)
    tmodel = tmodel.eval()
    ckpt = tmp_path / "cad.pt"
    # Wrap as the Lightning layout the converter strips/matches.
    torch.save({f"net.backbone.{k}": v for k, v in tmodel.backbone.state_dict().items()}, ckpt)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 96))
    with torch.no_grad():
        t_hidden = tmodel.backbone(torch.tensor(ids)).numpy()

    import jax

    module = CaduceusBackbone(cfg)
    template = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32), jnp.int32))["params"]
    from deepchopper_tpu.models.convert import _convert_caduceus, _load_torch_state_dict, _strip_prefixes

    sd = _strip_prefixes(_load_torch_state_dict(ckpt))
    p = {"backbone": jax.tree_util.tree_map(np.asarray, template)}
    converted = _convert_caduceus(sd, p, cfg.n_layer)
    j_hidden = np.asarray(
        module.apply({"params": converted["backbone"]}, jnp.asarray(ids, jnp.int32))
    )
    scale = max(1.0, float(np.abs(t_hidden).max()))
    np.testing.assert_allclose(j_hidden, t_hidden, atol=3e-4 * scale)


class TorchBiMambaUntied(tnn.Module):
    """'ps' variant: SEPARATE mamba_fwd / mamba_rev parameters
    (reference family: kuleshov-group/caduceus-ps_*,
    deepchopper/models/llm/caduceus.py:5-55)."""

    def __init__(self, *args):
        super().__init__()
        self.mamba_fwd = TorchMamba(*args)
        self.mamba_rev = TorchMamba(*args)

    def forward(self, x):
        fwd = self.mamba_fwd(x)
        bwd = self.mamba_rev(torch.flip(x, dims=(1,))).flip(dims=(1,))
        return fwd + bwd


def test_caduceus_ps_untied_backbone_parity(tmp_path):
    """The ps (untied) backbone converts a mamba_fwd+mamba_rev torch state
    dict and matches it numerically; untied params must actually differ in
    effect (flip-symmetry broken)."""
    import dataclasses

    from deepchopper_tpu.models.caduceus import CaduceusBackbone
    from deepchopper_tpu.models.config import CADUCEUS_TINY_PS

    cfg = dataclasses.replace(CADUCEUS_TINY_PS, compute_dtype="float32")
    torch.manual_seed(3)
    tmodel = tnn.Module()
    tmodel.backbone = TorchCaduceusBackbone.__new__(TorchCaduceusBackbone)
    tnn.Module.__init__(tmodel.backbone)
    tmodel.backbone.embeddings = tnn.Module()
    tmodel.backbone.embeddings.word_embeddings = tnn.Embedding(cfg.padded_vocab_size, cfg.d_model)
    tmodel.backbone.layers = tnn.ModuleList()
    for _ in range(cfg.n_layer):
        block = tnn.Module()
        block.norm = TorchRMSNorm(cfg.d_model, cfg.layer_norm_epsilon)
        block.mixer = TorchBiMambaUntied(
            cfg.d_model, cfg.d_state, cfg.d_conv, cfg.expand, cfg.dt_rank
        )
        tmodel.backbone.layers.append(block)
    tmodel.backbone.norm_f = TorchRMSNorm(cfg.d_model, cfg.layer_norm_epsilon)
    tmodel = tmodel.eval()

    ckpt = tmp_path / "cad_ps.pt"
    torch.save({f"net.backbone.{k}": v for k, v in tmodel.backbone.state_dict().items()}, ckpt)

    rng = np.random.default_rng(4)
    ids = rng.integers(0, cfg.vocab_size, (2, 96))
    with torch.no_grad():
        t_hidden = tmodel.backbone(torch.tensor(ids)).numpy()

    import jax

    module = CaduceusBackbone(cfg)
    template = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32), jnp.int32))["params"]
    # the untied module must own separate reverse-mixer params
    assert "mixer_rev" in template["block_0"]["bimamba"]

    from deepchopper_tpu.models.convert import (
        _convert_caduceus,
        _load_torch_state_dict,
        _strip_prefixes,
    )

    sd = _strip_prefixes(_load_torch_state_dict(ckpt))
    p = {"backbone": jax.tree_util.tree_map(np.asarray, template)}
    converted = _convert_caduceus(sd, p, cfg.n_layer)
    j_hidden = np.asarray(
        module.apply({"params": converted["backbone"]}, jnp.asarray(ids, jnp.int32))
    )
    scale = max(1.0, float(np.abs(t_hidden).max()))
    np.testing.assert_allclose(j_hidden, t_hidden, atol=3e-4 * scale)


def test_caduceus_ps_converter_requires_rev_keys(tmp_path):
    """Feeding a ph (tied) checkpoint into the ps (untied) model is a hard
    error, not a silent half-initialized model."""
    import dataclasses

    import jax
    import pytest

    from deepchopper_tpu.models.caduceus import CaduceusBackbone
    from deepchopper_tpu.models.config import CADUCEUS_TINY_PS

    cfg = dataclasses.replace(CADUCEUS_TINY_PS, compute_dtype="float32")
    torch.manual_seed(5)
    tb = TorchCaduceusBackbone(dataclasses.replace(cfg, bidirectional_weight_tie=True))
    ckpt = tmp_path / "cad_ph_only.pt"
    torch.save({f"net.backbone.{k}": v for k, v in tb.state_dict().items()}, ckpt)

    module = CaduceusBackbone(cfg)
    template = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32), jnp.int32))["params"]
    from deepchopper_tpu.models.convert import (
        _convert_caduceus,
        _load_torch_state_dict,
        _strip_prefixes,
    )

    sd = _strip_prefixes(_load_torch_state_dict(ckpt))
    p = {"backbone": jax.tree_util.tree_map(np.asarray, template)}
    with pytest.raises(KeyError):
        _convert_caduceus(sd, p, cfg.n_layer)


def test_caduceus_full_classifier_parity(tmp_path):
    import dataclasses

    from deepchopper_tpu.models.classifier import CaduceusTokenClassifier
    from deepchopper_tpu.models.config import CADUCEUS_TINY

    cfg = dataclasses.replace(CADUCEUS_TINY, compute_dtype="float32")
    head = HeadConfig(input_size=cfg.d_model, lin1_size=96, lin2_size=96, compute_dtype="float32")
    torch.manual_seed(2)

    class TorchCadClassifier(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = tnn.Module()
            self.backbone.backbone = TorchCaduceusBackbone(cfg)
            self.head = Head(head)

        def forward(self, ids, quals):
            return self.head(self.backbone.backbone(ids), quals)

    tmodel = TorchCadClassifier().eval()
    ckpt = tmp_path / "cadc.pt"
    torch.save({"state_dict": {f"net.{k}": v for k, v in tmodel.state_dict().items()}}, ckpt)

    rng = np.random.default_rng(5)
    ids = rng.integers(7, 12, (2, 80))
    quals = (rng.random((2, 80)) * 0.1).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.tensor(ids), torch.tensor(quals)).numpy()

    module = CaduceusTokenClassifier(backbone_config=cfg, head_config=head)
    template = init_params(module, seed=0, seq_len=32)
    params = convert_torch_state_dict(ckpt, template)
    j_logits = np.asarray(
        module.apply({"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(quals))
    )
    scale = max(1.0, float(np.abs(t_logits).max()))
    np.testing.assert_allclose(j_logits, t_logits, atol=3e-4 * scale)
    np.testing.assert_array_equal(j_logits.argmax(-1), t_logits.argmax(-1))
