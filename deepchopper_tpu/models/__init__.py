"""JAX model plane: backbones, heads, classifiers, registry, conversion."""

from .caduceus import BiMambaMixer, CaduceusBackbone, MambaMixer, selective_scan
from .classifier import CaduceusTokenClassifier, HyenaTokenClassifier, TransformerTokenClassifier
from .config import (
    CADUCEUS_CONFIGS,
    HYENA_CONFIGS,
    CaduceusConfig,
    CnnConfig,
    HeadConfig,
    HyenaConfig,
    TransformerConfig,
)
from .head import BenchmarkCNN, TokenClassificationCnnHead, TokenClassificationHead
from .hyena import HyenaBackbone, HyenaFilter, HyenaOperator, fft_causal_conv
from .registry import (
    MODEL_REGISTRY,
    DeepChopper,
    ModelBundle,
    build_model,
    init_params,
    load_checkpoint,
    save_checkpoint,
)
from .transformer import TransformerBackbone

__all__ = [
    "CADUCEUS_CONFIGS",
    "HYENA_CONFIGS",
    "MODEL_REGISTRY",
    "BenchmarkCNN",
    "BiMambaMixer",
    "CaduceusBackbone",
    "CaduceusConfig",
    "CaduceusTokenClassifier",
    "CnnConfig",
    "DeepChopper",
    "HeadConfig",
    "HyenaBackbone",
    "HyenaConfig",
    "HyenaFilter",
    "HyenaOperator",
    "HyenaTokenClassifier",
    "MambaMixer",
    "ModelBundle",
    "TokenClassificationCnnHead",
    "TokenClassificationHead",
    "TransformerBackbone",
    "TransformerConfig",
    "TransformerTokenClassifier",
    "build_model",
    "fft_causal_conv",
    "selective_scan",
    "init_params",
    "load_checkpoint",
    "save_checkpoint",
]
