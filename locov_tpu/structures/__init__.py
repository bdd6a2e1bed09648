from . import boxes
from .batches import (
    ImageBatch, BoxBatch, GtBatch, ProposalBatch, TextBatch,
    CaptionFeatures, RegionFeatures, DetectionBatch, Detections,
)

__all__ = [
    "boxes", "ImageBatch", "BoxBatch", "GtBatch", "ProposalBatch",
    "TextBatch", "CaptionFeatures", "RegionFeatures", "DetectionBatch",
    "Detections",
]
