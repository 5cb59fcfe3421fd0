"""Config validation tests — fold_span vocabularies are per model and a
typo (or another model's span name) must fail loudly at config time rather
than silently running the shortest fold (round-2 advisor finding)."""


import pytest

from picklebot_tpu.utils.config import Config
from picklebot_tpu.models.registry import fold_spans_for, initialize_model


def _cfg(**kw):
    return Config(**kw).validate()


def test_fold_span_default_is_model_default():
    cfg = _cfg(model_name="MobileNetSmall3D", early_fold=True)
    assert cfg.fold_span is None
    model = initialize_model(cfg)
    assert model._fold_span == "block3"


@pytest.mark.parametrize("model,span", [
    ("MobileNetLarge3D", "boundary"),
    ("MobileNetSmall3D", "boundary"),
    ("MoViNetA2", "block4"),
    ("MoViNetA2", "stem"),
    ("MobileViT", "trunk"),
])
def test_fold_span_valid_values_accepted(model, span):
    kw = {}
    if model == "MobileViT":
        kw = dict(dims=[64, 80, 96], channels=[16, 16, 24, 24, 48, 48,
                                               64, 64, 80, 80, 320])
    cfg = _cfg(model_name=model, fold_span=span, **kw)
    assert initialize_model(cfg)._fold_span == span


@pytest.mark.parametrize("model,span", [
    ("MobileNetLarge3D", "boundry"),      # typo
    ("MobileNetSmall3D", "block2"),       # another model's span
    ("MobileViT", "block2"),
    ("MoViNetA2", "trunk"),
])
def test_fold_span_invalid_values_rejected(model, span):
    with pytest.raises(ValueError, match="fold_span"):
        _cfg(model_name=model, fold_span=span)


def test_model_constructors_reject_unknown_span():
    from picklebot_tpu.models.mobilenet3d import (MobileNetLarge3D,
                                                  MobileNetSmall3D)
    from picklebot_tpu.models.movinet import MoViNetA2
    from picklebot_tpu.models.mobilevit import MobileViT
    for cls in (MobileNetLarge3D, MobileNetSmall3D, MoViNetA2):
        with pytest.raises(ValueError, match="fold_span"):
            cls(num_classes=2, fold_span="nope")
    with pytest.raises(ValueError, match="fold_span"):
        MobileViT(dims=[64, 80, 96],
                  channels=[16, 16, 24, 24, 48, 48, 64, 64, 80, 80, 320],
                  num_classes=2, fold_span="nope")


def test_fold_spans_for_matches_model_classes():
    """The registry's config-time vocabulary table must not drift from the
    model classes' FOLD_SPANS."""
    from picklebot_tpu.models.mobilenet3d import (MobileNetLarge3D,
                                                  MobileNetSmall3D)
    from picklebot_tpu.models.movinet import MoViNetA2
    from picklebot_tpu.models.mobilevit import MobileViT
    assert fold_spans_for("MobileNetLarge3D") == MobileNetLarge3D.FOLD_SPANS
    assert fold_spans_for("MobileNetSmall3D") == MobileNetSmall3D.FOLD_SPANS
    assert fold_spans_for("MoViNetA2") == MoViNetA2.FOLD_SPANS
    assert fold_spans_for("MobileViT") == MobileViT.FOLD_SPANS
    assert fold_spans_for("MobileViTV2") is None


def test_folded_conv_map_rejects_bad_geometry():
    """Advisor finding: invalid fold geometry must raise at plan-build time
    instead of silently producing wrong shapes."""
    from picklebot_tpu.ops.folded import folded_conv_map
    # k=4, s=2, p=1: 2p-k+s = 0 OK; k=4, s=2, p=0: 2p-k+s = -2 -> reject
    with pytest.raises(ValueError, match="fold"):
        folded_conv_map((1, 4, 4), (1, 2, 2), (0, 0, 0),
                        (1, 1, 8), (1, 1, 4), 3, 16)
    # even-kernel 'valid'-style geometry also rejected on a folded dim
    with pytest.raises(ValueError, match="fold"):
        folded_conv_map((1, 2, 2), (1, 1, 1), (1, 1, 1),
                        (1, 1, 8), (1, 1, 8), 3, 16)


def test_all_shipped_configs_construct():
    """Every configs/*.json parses, validates and builds its model — a
    user switching from the reference finds a working config per family
    (the reference ships 6; see configs/)."""
    import glob
    import os
    import warnings
    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    from picklebot_tpu.utils.config import load_config
    paths = sorted(glob.glob(os.path.join(cfg_dir, "*.json")))
    assert len(paths) >= 10
    for path in paths:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            cfg = load_config(path)
        assert initialize_model(cfg) is not None, path


def test_every_registry_model_has_interop_surfaces():
    """Zoo-consistency guard: every registered model must have a torch
    key map (import direction), an export rank map (strict torch export),
    and — except the serving-only stream variant — a shipped config, so a
    new model can't silently skip the interop surfaces the goldens cover."""
    import glob
    import json
    import os
    from picklebot_tpu.models.registry import MODELS, fold_spans_for
    from picklebot_tpu.train.key_maps import export_rank_for, key_map_for

    for name in MODELS:
        assert key_map_for(name) is not None, f"{name}: no torch key map"
        assert export_rank_for(name) is not None, f"{name}: no export ranks"

    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    shipped = set()
    for path in glob.glob(os.path.join(cfg_dir, "*.json")):
        with open(path) as f:
            shipped.add(json.load(f).get("model_name"))
    missing = set(MODELS) - shipped - {"MoViNetA2Stream"}
    assert not missing, f"registry models without a shipped config: {missing}"

    # foldable families expose their span vocabulary (Config.validate
    # derives the legal values from the class, so this cannot drift)
    for name in ("MobileNetLarge3D", "MobileNetSmall3D", "MoViNetA2",
                 "MobileViT", "MobileNetLarge2D", "MobileNetSmall2D"):
        spans = fold_spans_for(name)
        assert spans, f"{name}: empty fold_span vocabulary"


def test_nonpositive_batch_and_degree_knobs_rejected():
    """batch_size=0 used to surface as an opaque ZeroDivisionError from
    the divisibility check; degree knobs < 1 crashed later at mesh build.
    Both must be loud config errors."""
    with pytest.raises(ValueError, match="must be >= 1"):
        _cfg(model_name="MobileNetSmall3D", batch_size=0)
    with pytest.raises(ValueError, match="must be >= 1"):
        _cfg(model_name="MobileNetSmall3D", effective_batch_size=-4)
    with pytest.raises(ValueError, match="model_parallel"):
        _cfg(model_name="MobileViT", model_parallel=0)
    with pytest.raises(ValueError, match="data_parallel"):
        _cfg(model_name="MobileNetSmall3D", data_parallel=0)


def test_bce_synthetic_label_range():
    """BCE targets are binary: an explicit synthetic_classes > 2 would
    feed integer labels > 1 into BCEWithLogits semantics — a silently
    meaningless loss (the CE guard didn't cover this). The derived
    default for BCE is 2 so the synthetic task has both classes."""
    with pytest.raises(ValueError, match="BCE"):
        _cfg(model_name="MobileNetSmall3D", criterion="BCE", num_classes=1,
             data_backend="synthetic_learnable", synthetic_classes=4)
    cfg = _cfg(model_name="MobileNetSmall3D", criterion="BCE",
               num_classes=1, data_backend="synthetic_learnable")
    assert cfg.synthetic_classes == 2


def test_load_config_null_synthetic_shape(tmp_path):
    """A JSON null synthetic_shape means 'use the default', not
    TypeError: tuple(None) (generators emit explicit nulls)."""
    import json
    from picklebot_tpu.utils.config import Config, load_config
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"model_name": "MobileNetSmall3D",
                             "synthetic_shape": None}))
    assert load_config(str(p)).synthetic_shape == Config().synthetic_shape
