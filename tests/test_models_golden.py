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
from picklebot_tpu.train.key_maps import (key_map_for,  # noqa: E402
                                          mobilenet3d_key_map,
                                          movinet_key_map)

TOL = dict(rtol=5e-4, atol=5e-4)


def convert(tmodel, ours, key_map=None):
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    v = ours.init(jax.random.key(0))
    return import_torch_state_dict(sd, v, key_map=key_map)


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
    v = convert(tmodel, ours, key_map=mobilenet3d_key_map)

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

    v = convert(tmodel, ours, key_map=movinet_key_map)
    x = rng.rand(2, 8, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
    got, _ = ours.apply(v, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)
