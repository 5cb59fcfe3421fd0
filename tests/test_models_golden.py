"""Model-level parity vs the reference implementation (/root/reference).

The reference repo is imported read-only as a *test oracle*: we instantiate
its torch modules, convert their state_dicts into our pytrees with the
production converter, and require logits to match within float tolerance.
Skipped automatically when the reference checkout or torch is unavailable.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
import os  # noqa: E402

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

ref_available = os.path.isdir(os.path.join(REF, "config"))
needs_ref = pytest.mark.skipif(not ref_available,
                               reason="reference checkout not available")

from picklebot_tpu.core.module import param_count  # noqa: E402
from picklebot_tpu.train.checkpoint import (import_torch_state_dict,  # noqa: E402
                                            strip_compile_prefix)

TOL = dict(rtol=5e-4, atol=5e-4)


def convert(tmodel, ours, key_map=None):
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    v = ours.init(jax.random.key(0))
    return import_torch_state_dict(sd, v, key_map=key_map)


def mobilenet_key_map(tk):
    """Classifier 1x1 convs became Dense fc1/fc2 in our model."""
    table = {
        "classifier.1.weight": ("fc1.w", False),
        "classifier.1.bias": ("fc1.b", False),
        "classifier.3.weight": ("fc2.w", False),
        "classifier.3.bias": ("fc2.b", False),
        # Large3D: block1/6 are _ConvBNAct (conv/bn children)
        "block1.0.weight": ("block1.conv.w", False),
        "block1.0.bias": ("block1.conv.b", False),
        "block1.1.weight": ("block1.bn.scale", False),
        "block1.1.bias": ("block1.bn.bias", False),
        "block1.1.running_mean": ("block1.bn.mean", True),
        "block1.1.running_var": ("block1.bn.var", True),
        "block1.1.num_batches_tracked": ("", True),
        "block6.0.weight": ("block6.conv.w", False),
        "block6.0.bias": ("block6.conv.b", False),
        "block6.1.weight": ("block6.bn.scale", False),
        "block6.1.bias": ("block6.bn.bias", False),
        "block6.1.running_mean": ("block6.bn.mean", True),
        "block6.1.running_var": ("block6.bn.var", True),
        "block6.1.num_batches_tracked": ("", True),
        # Small3D block4: conv / SE / bn unrolled to b4_*
        "block4.0.weight": ("b4_conv.w", False),
        "block4.0.bias": ("b4_conv.b", False),
        "block4.1.se.1.weight": ("b4_se.w1", False),
        "block4.1.se.1.bias": ("b4_se.b1", False),
        "block4.1.se.3.weight": ("b4_se.w2", False),
        "block4.1.se.3.bias": ("b4_se.b2", False),
        "block4.2.weight": ("b4_bn.scale", False),
        "block4.2.bias": ("b4_bn.bias", False),
        "block4.2.running_mean": ("b4_bn.mean", True),
        "block4.2.running_var": ("b4_bn.var", True),
        "block4.2.num_batches_tracked": ("", True),
    }
    if tk in table:
        return table[tk]
    # bottleneck SE paths: '...squeeze_excite.se.N.*' -> '...squeeze_excite.wN'
    if ".squeeze_excite.se." in tk:
        prefix, rest = tk.split(".se.", 1)
        idx, kind = rest.split(".")
        name = {"1": "1", "3": "2"}[idx]
        leaf = "w" + name if kind == "weight" else "b" + name
        return (f"{prefix}.{leaf}", False)
    return None  # fall through to default mapping


@needs_ref
@pytest.mark.golden
@pytest.mark.parametrize("which", ["small", "large"])
def test_mobilenet3d_logit_parity(rng, which):
    from mobilenet import MobileNetLarge3D as TLarge
    from mobilenet import MobileNetSmall3D as TSmall
    from picklebot_tpu.models.mobilenet3d import (MobileNetLarge3D,
                                                  MobileNetSmall3D)

    torch.manual_seed(0)
    if which == "small":
        tmodel, ours = TSmall(num_classes=13), MobileNetSmall3D(13)
    else:
        tmodel, ours = TLarge(num_classes=13), MobileNetLarge3D(13)
    tmodel.eval()
    v = convert(tmodel, ours, key_map=mobilenet_key_map)

    x = rng.rand(2, 8, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
    got, _ = ours.apply(v, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


@needs_ref
@pytest.mark.golden
def test_mobilenet3d_param_counts():
    from picklebot_tpu.models.mobilenet3d import (MobileNetLarge3D,
                                                  MobileNetSmall3D)
    assert param_count(MobileNetSmall3D(13).init(
        jax.random.key(0))["params"]) == 1_684_091
    assert param_count(MobileNetLarge3D(13).init(
        jax.random.key(0))["params"]) == 4_205_675


@needs_ref
@pytest.mark.golden
def test_movinet_param_count_and_logit_parity(rng):
    from movinet import MoViNetA2 as TMoViNet
    from picklebot_tpu.models.movinet import MoViNetA2

    ours = MoViNetA2(num_classes=13)
    v = ours.init(jax.random.key(0))
    assert param_count(v["params"]) == 3_992_289

    torch.manual_seed(0)
    tmodel = TMoViNet(num_classes=13)
    tmodel.eval()

    def key_map(tk):
        table = {
            "block1.0.weight": ("stem_conv.w", False),
            "block1.1.weight": ("stem_bn.scale", False),
            "block1.1.bias": ("stem_bn.bias", False),
            "block1.1.running_mean": ("stem_bn.mean", True),
            "block1.1.running_var": ("stem_bn.var", True),
            "block1.1.num_batches_tracked": ("", True),
            "conv.0.weight": ("head_conv.w", False),
            "conv.1.weight": ("head_bn.scale", False),
            "conv.1.bias": ("head_bn.bias", False),
            "conv.1.running_mean": ("head_bn.mean", True),
            "conv.1.running_var": ("head_bn.var", True),
            "conv.1.num_batches_tracked": ("", True),
            "classifier.2.weight": ("fc1.w", False),
            "classifier.2.bias": ("fc1.b", False),
            "classifier.3.weight": ("fc1_bn.scale", False),
            "classifier.3.bias": ("fc1_bn.bias", False),
            "classifier.3.running_mean": ("fc1_bn.mean", True),
            "classifier.3.running_var": ("fc1_bn.var", True),
            "classifier.3.num_batches_tracked": ("", True),
            "classifier.6.weight": ("fc2.w", False),
            "classifier.6.bias": ("fc2.b", False),
        }
        if tk in table:
            return table[tk]
        if ".squeeze_excite.se." in tk:
            prefix, rest = tk.split(".se.", 1)
            idx, kind = rest.split(".")
            name = {"1": "1", "3": "2"}[idx]
            leaf = "w" + name if kind == "weight" else "b" + name
            return (f"{prefix}.{leaf}", False)
        return None

    v = convert(tmodel, ours, key_map=key_map)
    x = rng.rand(2, 8, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
    got, _ = ours.apply(v, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)
