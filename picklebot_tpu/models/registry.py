"""Model registry: name -> constructor (reference valid_models,
train.py:155-184, plus the models the reference defines but never registers).

MobileViT takes dims/channels/num_classes from the config
(train.py:166-171); everything else takes num_classes only.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


def _mobilenet_large3d(cfg):
    from picklebot_tpu.models.mobilenet3d import MobileNetLarge3D
    return MobileNetLarge3D(
        num_classes=cfg.num_classes,
        space_to_depth=getattr(cfg, "space_to_depth", False),
        early_fold=getattr(cfg, "early_fold", False),
        fold_span=getattr(cfg, "fold_span", None) or "block2")


def _mobilenet_small3d(cfg):
    from picklebot_tpu.models.mobilenet3d import MobileNetSmall3D
    return MobileNetSmall3D(
        num_classes=cfg.num_classes,
        space_to_depth=getattr(cfg, "space_to_depth", False),
        early_fold=getattr(cfg, "early_fold", False),
        fold_span=getattr(cfg, "fold_span", None) or "block3")


def _movinet_a2(cfg):
    from picklebot_tpu.models.movinet import MoViNetA2
    return MoViNetA2(num_classes=cfg.num_classes,
                     space_to_depth=getattr(cfg, "space_to_depth", False),
                     early_fold=getattr(cfg, "early_fold", False),
                     fold_span=getattr(cfg, "fold_span", None) or "block2")


def _movinet_a2_stream(cfg):
    from picklebot_tpu.models.movinet import MoViNetA2Stream
    return MoViNetA2Stream(
        num_classes=cfg.num_classes,
        space_to_depth=getattr(cfg, "space_to_depth", False))


def _mobilevit(cfg):
    from picklebot_tpu.models.mobilevit import MobileViT
    assert cfg.dims is not None and cfg.channels is not None, \
        "MobileViT config needs 'dims' and 'channels'"
    return MobileViT(dims=cfg.dims, channels=cfg.channels,
                     num_classes=cfg.num_classes,
                     attention_backend=getattr(cfg, "attention_backend",
                                               "auto"),
                     model_axis="model"
                     if getattr(cfg, "model_parallel", 1) > 1 else None,
                     sequence_axis="seq"
                     if getattr(cfg, "sequence_parallel", 1) > 1 else None,
                     pipeline_axis="pipe"
                     if getattr(cfg, "pipeline_parallel", 1) > 1 else None,
                     pipeline_microbatches=getattr(
                         cfg, "pipeline_microbatches", None),
                     moe_experts=getattr(cfg, "moe_experts", 0),
                     moe_top_k=getattr(cfg, "moe_top_k", 2),
                     moe_capacity_factor=getattr(cfg, "moe_capacity_factor",
                                                 1.25),
                     expert_axis="expert"
                     if getattr(cfg, "expert_parallel", 1) > 1 else None,
                     moe_dispatch=getattr(cfg, "moe_dispatch", "replicated"),
                     space_to_depth=getattr(cfg, "space_to_depth", False),
                     early_fold=getattr(cfg, "early_fold", False),
                     fold_span=getattr(cfg, "fold_span", None) or "stem")


def _mobilevit_v2(cfg):
    from picklebot_tpu.models.mobilevitv2 import MobileViTV2
    return MobileViTV2(num_classes=cfg.num_classes,
                       space_to_depth=getattr(cfg, "space_to_depth", False))


def _mobilenet_large2d(cfg):
    from picklebot_tpu.models.mobilenet2d_lstm import MobileNetLarge2D
    return MobileNetLarge2D(
        num_classes=cfg.num_classes,
        space_to_depth=getattr(cfg, "space_to_depth", False),
        early_fold=getattr(cfg, "early_fold", False),
        fold_span=getattr(cfg, "fold_span", None) or "block2")


def _mobilenet_small2d(cfg):
    from picklebot_tpu.models.mobilenet2d_lstm import MobileNetSmall2D
    return MobileNetSmall2D(
        num_classes=cfg.num_classes,
        space_to_depth=getattr(cfg, "space_to_depth", False),
        early_fold=getattr(cfg, "early_fold", False),
        fold_span=getattr(cfg, "fold_span", None) or "block3")


MODELS: Dict[str, Callable[[Any], Any]] = {
    # registered in the reference (train.py:156-161)
    "MoViNetA2": _movinet_a2,
    "MobileNetLarge3D": _mobilenet_large3d,
    "MobileNetSmall3D": _mobilenet_small3d,
    "MobileViT": _mobilevit,
    # defined by the reference but unregistered; first-class here
    "MobileNetLarge2D": _mobilenet_large2d,
    "MobileNetSmall2D": _mobilenet_small2d,
    "MobileViTV2": _mobilevit_v2,
    # capability extension: streaming MoViNet
    "MoViNetA2Stream": _movinet_a2_stream,
}


def fold_spans_for(model_name: str):
    """Per-model fold_span vocabulary (the model class's FOLD_SPANS), or
    None for models without a folded path. Used by Config.validate().
    Derived from the class attribute so constructor-vs-config validation
    cannot drift (lazy imports, same pattern as the constructors above)."""
    if model_name in ("MobileNetLarge3D", "MobileNetSmall3D"):
        from picklebot_tpu.models import mobilenet3d as m
        return getattr(m, model_name).FOLD_SPANS
    if model_name == "MoViNetA2":
        from picklebot_tpu.models.movinet import MoViNetA2
        return MoViNetA2.FOLD_SPANS
    if model_name == "MobileViT":
        from picklebot_tpu.models.mobilevit import MobileViT
        return MobileViT.FOLD_SPANS
    if model_name in ("MobileNetLarge2D", "MobileNetSmall2D"):
        from picklebot_tpu.models import mobilenet2d_lstm as m
        return getattr(m, model_name).FOLD_SPANS
    return None


def initialize_model(cfg):
    """Reference initialize_model (train.py:155-184): registry lookup +
    construction. Weight init is part of our Module.init."""
    if cfg.model_name not in MODELS:
        raise ValueError(f"Invalid model name: {cfg.model_name}")
    return MODELS[cfg.model_name](cfg)
