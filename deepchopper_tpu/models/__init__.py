"""JAX model plane: backbones, heads, classifiers, registry, conversion."""

from .classifier import HyenaTokenClassifier, TransformerTokenClassifier
from .config import (
    HYENA_CONFIGS,
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
    "HYENA_CONFIGS",
    "MODEL_REGISTRY",
    "BenchmarkCNN",
    "CnnConfig",
    "DeepChopper",
    "HeadConfig",
    "HyenaBackbone",
    "HyenaConfig",
    "HyenaFilter",
    "HyenaOperator",
    "HyenaTokenClassifier",
    "ModelBundle",
    "TokenClassificationCnnHead",
    "TokenClassificationHead",
    "TransformerBackbone",
    "TransformerConfig",
    "TransformerTokenClassifier",
    "build_model",
    "fft_causal_conv",
    "init_params",
    "load_checkpoint",
    "save_checkpoint",
]
