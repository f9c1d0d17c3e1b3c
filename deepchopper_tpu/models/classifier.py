"""Top-level token-classification models: backbone + qual-fusing head.

Equivalent of the reference's `TokenClassificationModule`
(reference: deepchopper/models/llm/hyena.py:8-41): backbone hidden states are
fed, together with L2-normalized base qualities, to the MLP head producing
per-base 2-class logits.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .caduceus import CaduceusBackbone
from .config import CaduceusConfig, HeadConfig, HyenaConfig, TransformerConfig
from .head import TokenClassificationHead
from .hyena import HyenaBackbone
from .transformer import TransformerBackbone


class HyenaTokenClassifier(nn.Module):
    """HyenaDNA backbone + token-classification head (the flagship model).

    The backbone's residual stream is channel-major (D, B, L) internally;
    by default the head runs channel-major too (TokenClassificationHeadCM —
    same params, same math), so the backbone->head boundary needs no layout
    pass and the head's lin1 reads the hidden state in XLA's native layout.
    `DEEPCHOPPER_CM_HEAD=0` restores the (B, L, D) head for A/B.
    """

    backbone_config: HyenaConfig
    head_config: HeadConfig
    number_of_classes: int = 2

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, input_quals: jnp.ndarray) -> jnp.ndarray:
        import os

        from .head import TokenClassificationHeadCM

        if os.environ.get("DEEPCHOPPER_CM_HEAD", "1") == "1":
            hidden_cm = HyenaBackbone(self.backbone_config, name="backbone")(
                input_ids, channel_major_out=True
            )
            logits_cm = TokenClassificationHeadCM(self.head_config, name="head")(
                hidden_cm, input_quals
            )
            return jnp.transpose(logits_cm, (1, 2, 0))  # (B, L, num_class)
        hidden = HyenaBackbone(self.backbone_config, name="backbone")(input_ids)
        return TokenClassificationHead(self.head_config, name="head")(hidden, input_quals)


class CaduceusTokenClassifier(nn.Module):
    """Bidirectional-Mamba (Caduceus) backbone + head
    (reference capability: deepchopper/models/llm/caduceus.py:18-55)."""

    backbone_config: CaduceusConfig
    head_config: HeadConfig
    number_of_classes: int = 2

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, input_quals: jnp.ndarray) -> jnp.ndarray:
        hidden = CaduceusBackbone(self.backbone_config, name="backbone")(input_ids)
        return TokenClassificationHead(self.head_config, name="head")(hidden, input_quals)


class TransformerTokenClassifier(nn.Module):
    """Transformer-encoder baseline + head
    (reference capability: deepchopper/models/transformer.py)."""

    backbone_config: TransformerConfig
    head_config: HeadConfig
    number_of_classes: int = 2

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        input_quals: jnp.ndarray,
        pad_mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        hidden = TransformerBackbone(self.backbone_config, name="backbone")(input_ids, pad_mask)
        return TokenClassificationHead(self.head_config, name="head")(hidden, input_quals)
