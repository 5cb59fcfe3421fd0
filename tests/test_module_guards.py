"""Module-system guard rails (round-5 review): weight-sharing rejection,
ModuleList attribute/registration sync, numpy seeds, mesh degree sanity."""

import numpy as np
import pytest

from picklebot_tpu.core.module import Module, ModuleList, as_seed
from picklebot_tpu.ops.linear import Dense


def test_shared_module_instance_rejected():
    """One instance at two tree positions would init two independent param
    copies but route every forward call to the first — the second copy
    gets zero grads while weight decay drifts it. init() must refuse."""
    class Twice(Module):
        def __init__(self):
            super().__init__()
            shared = Dense(4, 4)
            self.a = shared
            self.b = shared

    with pytest.raises(ValueError, match="weight sharing"):
        Twice().init(0)


def test_module_list_append_stays_registered():
    """The implicit list->ModuleList wrap is stored AS the attribute, so
    .append on it registers the new child (the old raw-list snapshot made
    append invisible to init/apply — a trace-time KeyError)."""
    class Stack(Module):
        def __init__(self):
            super().__init__()
            self.blocks = [Dense(4, 4)]

    m = Stack()
    assert isinstance(m.blocks, ModuleList)
    m.blocks.append(Dense(4, 4))
    params = m.init_params(0)
    assert set(params["blocks"].keys()) == {"0", "1"}


def test_as_seed_accepts_numpy_integers():
    # np.int64 is not a Python int; it used to fall into the PRNG-key
    # branch and crash in jax.random.key_data
    assert as_seed(np.int64(1234)) == 1234
    assert as_seed(np.uint32(7)) == 7
    assert as_seed(1234) == 1234


def test_make_mesh_rejects_zero_data_axis():
    """data=None with fewer devices than the inner product floor-divides
    to a zero-sized axis — must be a clear error, not a Mesh crash."""
    import jax
    from picklebot_tpu.parallel.mesh import make_mesh
    devs = jax.devices()[:1]
    with pytest.raises(ValueError, match="devices per data replica"):
        make_mesh(model=2, devices=devs)
