"""Multi-slice (DCN) hybrid mesh: make_mesh(dcn_data=N).

One logical 'data' axis, laid out slice-major: the outer dcn_data stride is
the only thing crossing DCN; pipe/seq/expert/model groups and the inner
data stride stay on each slice's ICI. On virtual CPU devices the fallback
(contiguous blocks) applies — the math is placement-invariant, which the
exactness test pins down.
"""

import numpy as np
import pytest

import jax

from picklebot_tpu.parallel.mesh import make_mesh
from picklebot_tpu.utils.config import Config


def test_fallback_layout_contiguous_slices():
    mesh = make_mesh(data=4, model=2, dcn_data=2)
    assert mesh.devices.shape == (4, 1, 1, 1, 2)
    ids = np.vectorize(lambda d: d.id)(mesh.devices).reshape(4, 2)
    # slice 0 = devices 0..3 (data rows 0-1), slice 1 = devices 4..7
    assert ids[:2].max() < 4 and ids[2:].min() >= 4
    # every TP pair is intra-slice (consecutive devices)
    for row in ids:
        assert abs(int(row[0]) - int(row[1])) == 1


def test_dcn_must_divide_data():
    with pytest.raises(ValueError, match="dcn_data"):
        make_mesh(data=3, dcn_data=2)


def test_config_validation():
    Config(dcn_data_parallel=2, data_parallel=4).validate()
    with pytest.raises(ValueError):
        Config(dcn_data_parallel=0).validate()
    with pytest.raises(ValueError):
        Config(dcn_data_parallel=3, data_parallel=4).validate()


def test_hybrid_mesh_training_matches_plain(rng):
    """The hybrid layout is a device ORDERING — the train step's math is
    identical to the plain mesh (same devices, same axis names)."""
    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.train.optim import AdamW
    from picklebot_tpu.train.step import create_train_state, make_train_step
    from tests.test_train_step import TinyNoBNNet, _data

    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    policy = DtypePolicy.f32()
    feats, labels = _data(rng, accum=2, batch=16)
    key = jax.random.key(3)

    results = []
    for dcn in (1, 2):
        mesh = make_mesh(data=8, dcn_data=dcn)
        state = create_train_state(model, opt, jax.random.key(0))
        step = make_train_step(model, opt, "CE", lambda e: 1e-3,
                               policy=policy, mesh=mesh, donate=False)
        state, metrics = step(state, feats, labels, key)
        results.append((jax.device_get(state.params),
                        np.asarray(metrics["loss"])))
    np.testing.assert_allclose(results[0][1], results[1][1],
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(results[0][0]),
                    jax.tree_util.tree_leaves(results[1][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
