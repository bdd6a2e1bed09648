from . import losses, matcher, nms, roi_align

__all__ = ["losses", "matcher", "nms", "roi_align"]
