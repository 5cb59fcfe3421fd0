"""Export golden tests: our weights must torch-load into the ACTUAL
reference modules with ``strict=True`` and produce matching logits.

Round-1 ADVICE finding: SE weights and 1x1-conv classifier heads are Dense
(in, out) in our pytrees but Conv3d/Conv2d (O, I, 1, ...) in the reference —
an export without the rank reshape fails ``load_state_dict`` outright. These
tests close the loop the round-trip-through-our-own-importer test could not:
the consumer here is the reference's own torch modules
(/root/reference/mobilenet.py, movinet.py).
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)
ref_available = os.path.isdir(os.path.join(REF, "config"))
needs_ref = pytest.mark.skipif(not ref_available,
                               reason="reference checkout not available")

from picklebot_tpu.train.checkpoint import (build_reverse_map,  # noqa: E402
                                            export_torch_state_dict)
from picklebot_tpu.train.key_maps import (export_rank_for,  # noqa: E402
                                          key_map_for)

TOL = dict(rtol=5e-4, atol=5e-4)


def _export_into(tmodel, ours, name):
    """Export our init and strict-load it into the live reference module."""
    v = ours.init(0)
    reverse = build_reverse_map(tmodel.state_dict().keys(),
                                key_map_for(name))
    sd = export_torch_state_dict(v, reverse_map=reverse,
                                 rank_map=export_rank_for(name))
    tmodel.load_state_dict(sd, strict=True)  # raises on any key/shape gap
    return v


@needs_ref
@pytest.mark.golden
@pytest.mark.parametrize("which", ["small", "large"])
def test_export_loads_into_reference_mobilenet3d(rng, which):
    from mobilenet import MobileNetLarge3D as TLarge
    from mobilenet import MobileNetSmall3D as TSmall
    from picklebot_tpu.models.mobilenet3d import (MobileNetLarge3D,
                                                  MobileNetSmall3D)

    if which == "small":
        tmodel, ours, name = (TSmall(num_classes=13), MobileNetSmall3D(13),
                              "MobileNetSmall3D")
    else:
        tmodel, ours, name = (TLarge(num_classes=13), MobileNetLarge3D(13),
                              "MobileNetLarge3D")
    v = _export_into(tmodel, ours, name)

    tmodel.eval()
    x = rng.rand(2, 8, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
    got, _ = ours.apply(v, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


@needs_ref
@pytest.mark.golden
def test_export_loads_into_reference_movinet(rng):
    from movinet import MoViNetA2 as TMoViNet
    from picklebot_tpu.models.movinet import MoViNetA2

    tmodel = TMoViNet(num_classes=13)
    ours = MoViNetA2(num_classes=13)
    v = _export_into(tmodel, ours, "MoViNetA2")

    tmodel.eval()
    x = rng.rand(1, 4, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
    got, _ = ours.apply(v, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


@needs_ref
@pytest.mark.golden
def test_export_loads_into_reference_mobilevitv2(rng):
    """Covers the Dense->Conv2d(k=1) rank map for LinearSelfAttention
    qkv/out projections and the conv-FFN (mobilevitv2.py:13,20,66,76)."""
    from mobilevitv2 import MobileViTV2 as TV2
    from picklebot_tpu.models.mobilevitv2 import MobileViTV2

    tmodel = TV2()
    ours = MobileViTV2()
    v = _export_into(tmodel, ours, "MobileViTV2")

    tmodel.eval()
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    import contextlib
    import io
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got, _ = ours.apply(v, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


@needs_ref
@pytest.mark.golden
def test_export_loads_into_reference_mobilevit(rng):
    """Covers the transformer qkv/out Dense exports and the SE-free conv
    stacks of MobileViT V1 (mobilevit.py:107-190). The reference attention
    is patched to its evident intent exactly as the import-direction golden
    does (tests/test_vit_lstm_golden.py)."""
    import mobilevit as ref_mv
    from test_vit_lstm_golden import _patched_attention_forward
    from picklebot_tpu.models.mobilevit import MOBILEVIT_CONFIGS, MobileViT

    cfg = MOBILEVIT_CONFIGS["xxs"]
    tmodel = ref_mv.MobileViT(dims=cfg["dims"], channels=cfg["channels"],
                              num_classes=13)
    ours = MobileViT(dims=cfg["dims"], channels=cfg["channels"],
                     num_classes=13, attention_backend="xla")
    v = _export_into(tmodel, ours, "MobileViT")

    orig = ref_mv.Attention.forward
    ref_mv.Attention.forward = _patched_attention_forward
    try:
        tmodel.eval()
        x = rng.rand(1, 6, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
    finally:
        ref_mv.Attention.forward = orig
    got, _ = ours.apply(v, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


@needs_ref
@pytest.mark.golden
@pytest.mark.parametrize("which", ["small", "large"])
def test_export_loads_into_reference_mobilenet2d_lstm(rng, which):
    """Covers the 2D SE rank map (4D conv weights) and the LSTM key
    reversal (w_ih_l{k} -> weight_ih_l{k}) for both 2D+LSTM models
    (mobilenet.py:285-443)."""
    from mobilenet import MobileNetLarge2D as TLarge2D
    from mobilenet import MobileNetSmall2D as TSmall2D
    from picklebot_tpu.models.mobilenet2d_lstm import (MobileNetLarge2D,
                                                       MobileNetSmall2D)

    if which == "small":
        tmodel, ours, name = (TSmall2D(num_classes=2), MobileNetSmall2D(2),
                              "MobileNetSmall2D")
    else:
        tmodel = TLarge2D(num_classes=2)
        tmodel.initialize_weights()  # quirk: Large2D builds layers here
        ours, name = MobileNetLarge2D(2), "MobileNetLarge2D"
    v = _export_into(tmodel, ours, name)

    tmodel.eval()
    # 224x224: the reference hardcodes AvgPool2d(7) for 7x7 maps
    x = rng.rand(1, 3, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 1, 4, 2, 3)).numpy()
    got, _ = ours.apply(v, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
