"""Model configurations.

`HyenaConfig` mirrors the public HyenaDNA architecture hyperparameters the
reference depends on via `AutoModel.from_pretrained("LongSafari/hyenadna-*-hf")`
(reference: deepchopper/models/llm/hyena.py:8-41). The backbone is re-derived
here TPU-first — no torch code is used.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class HyenaConfig:
    """HyenaDNA backbone hyperparameters (small-32k defaults)."""

    d_model: int = 256
    n_layer: int = 4
    d_inner: int = 1024
    vocab_size: int = 12
    pad_vocab_size_multiple: int = 8
    emb_dim: int = 5  # positional-embedding feature dim (odd: t + bands*(re,im))
    filter_order: int = 64  # width of the implicit-filter MLP
    short_filter_order: int = 3  # depthwise conv kernel size
    hyena_order: int = 2
    num_inner_mlps: int = 2
    max_seq_len: int = 32770
    activation_freq: float = 10.0  # sine activation frequency (w)
    train_freq: bool = True
    use_bias: bool = True
    layer_norm_epsilon: float = 1e-5
    # Exponential filter modulation
    modulation_fast_decay_pct: float = 0.3
    modulation_slow_decay_pct: float = 1.5
    modulation_target: float = 1e-2
    modulation_shift: float = 0.0
    # Numerics: matmuls run in this dtype; FFT/LN always in float32.
    compute_dtype: str = "bfloat16"
    # Long-conv implementation: "pallas_fft" (fused VMEM kernel, ~4x over the
    # XLA matmul FFT on TPU; auto-falls back off-TPU), "matmul_fft" (four-step
    # Cooley-Tukey on the MXU via XLA — an order of magnitude faster than
    # XLA's TPU FFT lowering), or "fft" (stock jnp.fft, any length).
    conv_impl: str = "pallas_fft"

    @property
    def padded_vocab_size(self) -> int:
        m = self.pad_vocab_size_multiple
        return ((self.vocab_size + m - 1) // m) * m


SMALL_32K = HyenaConfig()
TINY_1K = HyenaConfig(d_model=128, n_layer=2, d_inner=512, max_seq_len=1026)
MEDIUM_160K = HyenaConfig(d_model=256, n_layer=8, d_inner=1024, max_seq_len=160_002)
MEDIUM_450K = HyenaConfig(d_model=256, n_layer=8, d_inner=1024, max_seq_len=450_002)
LARGE_1M = HyenaConfig(d_model=256, n_layer=8, d_inner=1024, max_seq_len=1_000_002)

HYENA_CONFIGS: dict[str, HyenaConfig] = {
    "hyenadna-tiny-1k-seqlen": TINY_1K,
    "hyenadna-small-32k-seqlen": SMALL_32K,
    "hyenadna-medium-160k-seqlen": MEDIUM_160K,
    "hyenadna-medium-450k-seqlen": MEDIUM_450K,
    "hyenadna-large-1m-seqlen": LARGE_1M,
}


@dataclasses.dataclass(frozen=True)
class HeadConfig:
    """Token-classification head (reference: deepchopper/models/llm/head.py:39-102)."""

    input_size: int = 256
    lin1_size: int = 1024
    lin2_size: int = 1024
    num_class: int = 2
    use_identity_layer_for_qual: bool = True
    use_qual: bool = True
    # Matmul dtype. The head is ~24% of model FLOPs on the largest matmuls
    # (256->1024->1024->2); bf16 runs them on the MXU at full rate with f32
    # accumulation (params stay float32). Logits are returned float32.
    compute_dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class CaduceusConfig:
    """Caduceus bidirectional-Mamba backbone hyperparameters
    (reference family: kuleshov-group/caduceus-*_seqlen-131k_d_model-256_n_layer-16,
    consumed at deepchopper/models/llm/caduceus.py:5-55)."""

    d_model: int = 256
    n_layer: int = 16
    vocab_size: int = 12
    pad_vocab_size_multiple: int = 8
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int = 16  # ceil(d_model / 16)
    max_seq_len: int = 131072
    layer_norm_epsilon: float = 1e-5
    compute_dtype: str = "bfloat16"
    # True = "ph" (parameter-homologous: forward/reverse mixers share
    # weights); False = "ps" (separate reverse-mixer parameters) — both
    # reference variants (deepchopper/models/llm/caduceus.py:5-55).
    bidirectional_weight_tie: bool = True
    # Selective-scan chunking: bounds live memory to O(chunk * d_inner *
    # d_state) instead of O(L * ...) — the flat parallel scan at the 131k
    # context would materialize tens of GB per read. None = flat scan.
    scan_chunk: int | None = 2048

    @property
    def padded_vocab_size(self) -> int:
        m = self.pad_vocab_size_multiple
        return ((self.vocab_size + m - 1) // m) * m


CADUCEUS_PH_131K = CaduceusConfig()
CADUCEUS_PS_131K = CaduceusConfig(bidirectional_weight_tie=False)
CADUCEUS_TINY = CaduceusConfig(d_model=64, n_layer=2, d_state=8, dt_rank=4, max_seq_len=1024)
CADUCEUS_TINY_PS = CaduceusConfig(
    d_model=64, n_layer=2, d_state=8, dt_rank=4, max_seq_len=1024, bidirectional_weight_tie=False
)

CADUCEUS_CONFIGS: dict[str, CaduceusConfig] = {
    "caduceus-ph_seqlen-131k_d_model-256_n_layer-16": CADUCEUS_PH_131K,
    "caduceus-ps_seqlen-131k_d_model-256_n_layer-16": CADUCEUS_PS_131K,
}


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """From-scratch transformer-encoder baseline
    (reference: deepchopper/models/transformer.py:12-107)."""

    vocab_size: int = 12
    d_model: int = 256
    n_heads: int = 8
    n_layers: int = 4
    d_ff: int = 1024
    max_len: int = 32768
    compute_dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class CnnConfig:
    """CNN baseline (reference: deepchopper/models/cnn.py:6-54)."""

    vocab_size: int = 12
    embed_dim: int = 100
    num_filters: tuple[int, ...] = (128, 256, 512)
    filter_sizes: tuple[int, ...] = (7, 9, 11)
    num_class: int = 2
    compute_dtype: str = "bfloat16"
