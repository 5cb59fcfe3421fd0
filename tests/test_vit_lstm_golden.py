"""Golden parity for MobileViT V1/V2 and the 2D+LSTM MobileNets vs the
reference implementation (imported as a test oracle, see
test_models_golden.py)."""

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

from picklebot_tpu.core.module import param_count  # noqa: E402
from picklebot_tpu.train.checkpoint import import_torch_state_dict  # noqa: E402
from picklebot_tpu.train.key_maps import key_map_for  # noqa: E402

TOL = dict(rtol=8e-4, atol=8e-4)


def convert(tmodel, ours, key_map):
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    v = ours.init(0)
    return import_torch_state_dict(sd, v, key_map=key_map)


def _patched_attention_forward(self, x):
    """The reference Attention.forward is broken as committed (missing
    head-merge, mobilevit.py:82-85); this is the evident intent — the
    head-merge present in profiling_mobilevit.py:102 — built from the
    module's own layers."""
    from einops import rearrange
    import torch.nn.functional as F
    x = self.norm(x)
    qkv = self.to_qkv(x).chunk(3, dim=-1)
    q, k, v = map(
        lambda t: rearrange(t, "b p n (h d) -> b p h n d", h=self.heads),
        qkv)
    out = F.scaled_dot_product_attention(q, k, v, dropout_p=0.0)
    out = rearrange(out, "b p h n d -> b p n (h d)")
    return self.to_out(out)


@needs_ref
@pytest.mark.golden
@pytest.mark.parametrize("size,nparams", [
    ("xxs", 2_030_368), ("xs", 3_483_984), ("s", 8_453_136)])
def test_mobilevit_param_counts(size, nparams):
    from picklebot_tpu.models.mobilevit import MOBILEVIT_CONFIGS, MobileViT
    cfg = MOBILEVIT_CONFIGS[size]
    ours = MobileViT(dims=cfg["dims"], channels=cfg["channels"],
                     num_classes=13)
    assert param_count(ours.init(0)["params"]) == nparams


@needs_ref
@pytest.mark.golden
def test_mobilevit_logit_parity(rng):
    import mobilevit as ref_mv
    from picklebot_tpu.models.mobilevit import MOBILEVIT_CONFIGS, MobileViT

    # patch the broken attention with the evident intent (see docstring)
    orig = ref_mv.Attention.forward
    ref_mv.Attention.forward = _patched_attention_forward
    try:
        cfg = MOBILEVIT_CONFIGS["xxs"]
        torch.manual_seed(0)
        tmodel = ref_mv.MobileViT(dims=cfg["dims"], channels=cfg["channels"],
                                  num_classes=13)
        tmodel.eval()
        ours = MobileViT(dims=cfg["dims"], channels=cfg["channels"],
                         num_classes=13, attention_backend="xla")
        v = convert(tmodel, ours, key_map_for("MobileViT"))
        x = rng.rand(1, 6, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
        got, _ = ours.apply(v, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(got), want, **TOL)
    finally:
        ref_mv.Attention.forward = orig


@needs_ref
@pytest.mark.golden
def test_mobilevitv2_param_count_and_logit_parity(rng):
    import mobilevitv2 as ref_v2
    from picklebot_tpu.models.mobilevitv2 import MobileViTV2

    torch.manual_seed(0)
    tmodel = ref_v2.MobileViTV2()
    tmodel.eval()
    nparams = sum(p.numel() for p in tmodel.parameters())
    ours = MobileViTV2()
    v = ours.init(0)
    assert param_count(v["params"]) == nparams == 9_223_185

    v = convert(tmodel, ours, key_map_for("MobileViTV2"))
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got, _ = ours.apply(v, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


@needs_ref
@pytest.mark.golden
@pytest.mark.parametrize("which,nparams", [("small", 1_243_536),
                                           ("large", 3_119_168)])
def test_mobilenet2d_lstm_param_count_and_logit_parity(rng, which, nparams):
    from mobilenet import MobileNetLarge2D as TLarge2D
    from mobilenet import MobileNetSmall2D as TSmall2D
    from picklebot_tpu.models.mobilenet2d_lstm import (MobileNetLarge2D,
                                                       MobileNetSmall2D)

    torch.manual_seed(0)
    if which == "small":
        tmodel, ours = TSmall2D(num_classes=2), MobileNetSmall2D(2)
    else:
        tmodel = TLarge2D(num_classes=2)
        tmodel.initialize_weights()  # quirk: Large2D builds layers here
        ours = MobileNetLarge2D(2)
    tmodel.eval()
    assert sum(p.numel() for p in tmodel.parameters()) == nparams
    v = ours.init(0)
    assert param_count(v["params"]) == nparams

    v = convert(tmodel, ours, key_map_for("MobileNetLarge2D"))
    # 224x224 input: the reference hardcodes AvgPool2d(7) for 7x7 maps
    x = rng.rand(1, 3, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 1, 4, 2, 3)).numpy()
    got, _ = ours.apply(v, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
