from .grounding_head import GroundingHead, GroundingConfig
from .transformer_head import TransformerHead, TransformerHeadConfig, \
    VisualEmbedding
from .distill import build_distill_loss, kd_loss, js_loss, mse_loss

__all__ = [
    "GroundingHead", "GroundingConfig", "TransformerHead",
    "TransformerHeadConfig", "VisualEmbedding", "build_distill_loss",
    "kd_loss", "js_loss", "mse_loss",
]
