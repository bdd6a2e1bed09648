"""Static padded batch containers.

These replace detectron2's ragged ``ImageList`` / ``Instances`` /
``Boxes`` containers (reference ``distill_prop_mmss_gcnn.py:533-540``,
``ovr_rcnn.py:10-14``): every field is a fixed-shape array plus a
validity mask, so an entire train/eval step traces to one XLA program.
All containers are registered pytrees (NamedTuples), so they flow
through jit/vmap/shard_map unchanged.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class ImageBatch(NamedTuple):
    """Batched images, padded to a static (H, W) bucket.

    image: [B, H, W, 3] float32/bfloat16 (NHWC; channel order per
        INPUT.FORMAT, normalized with PIXEL_MEAN/STD on host or device).
    hw: [B, 2] int32 — valid (height, width) of each image inside the
        padded canvas (== d2 ImageList.image_sizes).
    orig_hw: [B, 2] int32 — pre-resize original (height, width), used by
        detector postprocess rescale.
    image_id: [B] int64 — COCO image id (host-side bookkeeping for eval).
    """
    image: jnp.ndarray
    hw: jnp.ndarray
    orig_hw: jnp.ndarray
    image_id: Optional[jnp.ndarray] = None


class BoxBatch(NamedTuple):
    """Fixed-size padded boxes with a validity mask.

    boxes: [B, N, 4] float32 XYXY in the resized image frame.
    mask:  [B, N] bool — True for real boxes.
    """
    boxes: jnp.ndarray
    mask: jnp.ndarray


class GtBatch(NamedTuple):
    """Padded ground-truth instances.

    boxes:   [B, N, 4] XYXY; classes: [B, N] int32 (contiguous ids);
    mask:    [B, N] bool.
    """
    boxes: jnp.ndarray
    classes: jnp.ndarray
    mask: jnp.ndarray


class ProposalBatch(NamedTuple):
    """RPN or precomputed (OLN) proposals.

    boxes: [B, N, 4]; objectness: [B, N] float32 logits; mask: [B, N].
    """
    boxes: jnp.ndarray
    objectness: jnp.ndarray
    mask: jnp.ndarray


class TextBatch(NamedTuple):
    """Tokenized caption batch (host-side WordPiece + MLM masking output;
    mirrors the dict produced by reference ``transf_models.py:26-68``).

    input_ids / target_ids: [B, L] int32.
    attention_mask / special_tokens_mask / mlm_mask: [B, L] int32.
    """
    input_ids: jnp.ndarray
    attention_mask: jnp.ndarray
    special_tokens_mask: jnp.ndarray
    target_ids: jnp.ndarray
    mlm_mask: jnp.ndarray


class CaptionFeatures(NamedTuple):
    """Language-backbone output (on-device): mirrors the tokenized_batch
    dict the reference threads into the MMSS heads.

    encoded_tokens / input_embeddings: [B, L, D].
    """
    input_ids: jnp.ndarray
    attention_mask: jnp.ndarray
    special_tokens_mask: jnp.ndarray
    target_ids: jnp.ndarray
    mlm_mask: jnp.ndarray
    encoded_tokens: jnp.ndarray
    input_embeddings: jnp.ndarray

    def asdict(self):
        return self._asdict()


class RegionFeatures(NamedTuple):
    """Visual regions fed to the MMSS heads (reference ``input_image`` /
    ``input_boxes`` dicts, distill_prop_mmss_gcnn.py:322-328,393-399).

    features: [B, R, C]; mask: [B, R]; loc: [B, R, 2] normalized (x, y).
    """
    features: jnp.ndarray
    mask: jnp.ndarray
    loc: jnp.ndarray


class DetectionBatch(NamedTuple):
    """One full training example batch for the detection/LSM paths."""
    images: ImageBatch
    gt: Optional[GtBatch] = None
    proposals: Optional[ProposalBatch] = None
    text: Optional[TextBatch] = None
    # original gt stashed when OLN proposals are converted to binary gt
    # (reference change_proposals_as_gt, coco_mappers.py:88-106)
    gt_obj: Optional[GtBatch] = None


class Detections(NamedTuple):
    """Fixed-size inference output (top-K per image).

    boxes: [B, K, 4] in original-image coordinates; scores: [B, K];
    classes: [B, K] int32; mask: [B, K] valid flag.
    """
    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    mask: jnp.ndarray
