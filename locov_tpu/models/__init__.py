"""Model zoo + meta-architecture registry (mirrors the reference's
META_ARCH_REGISTRY surface, ``ovr/__init__.py:1-10``)."""
from . import resnet, rpn, roi_heads, box_predictor

META_ARCH_REGISTRY = {}


def register_meta_arch(name):
    def deco(cls):
        META_ARCH_REGISTRY[name] = cls
        return cls
    return deco


def build_meta_arch(cfg, **overrides):
    name = cfg.MODEL.META_ARCHITECTURE
    # imported lazily to avoid import cycles
    from .meta_arch import ovr_rcnn  # noqa: F401
    from .meta_arch import mmss_gcnn  # noqa: F401
    if name not in META_ARCH_REGISTRY:
        raise KeyError(f"Unknown META_ARCHITECTURE: {name}; "
                       f"available: {sorted(META_ARCH_REGISTRY)}")
    return META_ARCH_REGISTRY[name].from_cfg(cfg, **overrides)
