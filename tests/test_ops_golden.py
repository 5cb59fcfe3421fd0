"""Golden tests: our ops vs torch CPU, element-for-element.

These pin the exact semantics the checkpoint converter relies on: conv
geometry (including the reference's quirky temporal inflation), BatchNorm
train/eval statistics, activations, SE, LSTM. torch here is a test oracle
only — no torch in the library's compute path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from picklebot_tpu.core.module import DtypePolicy  # noqa: E402
from picklebot_tpu.ops import activations as act  # noqa: E402
from picklebot_tpu.ops.bottleneck import Bottleneck3D  # noqa: E402
from picklebot_tpu.ops.conv import Conv2d, Conv3d  # noqa: E402
from picklebot_tpu.ops.linear import LSTM, AvgPool2d, Dense  # noqa: E402
from picklebot_tpu.ops.norm import BatchNorm, GroupNorm, LayerNorm  # noqa: E402
from picklebot_tpu.ops.se import SEBlock  # noqa: E402

TOL = dict(rtol=2e-5, atol=2e-5)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


@pytest.mark.golden
def test_activations_match_torch(rng):
    x = rng.randn(64, 32).astype(np.float32) * 4
    tx = torch.from_numpy(x)
    pairs = [
        (act.hardswish, tnn.Hardswish()),
        (act.hardsigmoid, tnn.Hardsigmoid()),
        (act.relu, tnn.ReLU()),
        (act.leaky_relu, tnn.LeakyReLU()),
        (act.silu, tnn.SiLU()),
        (act.relu6, tnn.ReLU6()),
    ]
    for ours, theirs in pairs:
        np.testing.assert_allclose(np.asarray(ours(jnp.asarray(x))),
                                   theirs(tx).numpy(), **TOL)


@pytest.mark.golden
@pytest.mark.parametrize("k,s,p,groups", [
    (3, 1, 1, 1), (3, 2, 1, 1), ((1, 3, 3), 2, 1, 8), ((1, 5, 5), 1, 2, 8),
])
def test_conv3d_matches_torch(rng, k, s, p, groups):
    cin, cout = 8, 8 if groups > 1 else 16
    tconv = tnn.Conv3d(cin, cout, k, stride=s, padding=p, groups=groups,
                       bias=True)
    ours = Conv3d(cin, cout, k, stride=s, padding=p, groups=groups, bias=True)
    v = ours.init(jax.random.key(0))
    # graft torch weights: (O, I/g, kt, kh, kw) -> (kt, kh, kw, I/g, O)
    v["params"]["w"] = t2j(tconv.weight.permute(2, 3, 4, 1, 0))
    v["params"]["b"] = t2j(tconv.bias)

    x = rng.randn(2, 6, 12, 12, cin).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    got, _ = ours.apply(v, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 4, 1).numpy(), **TOL)


@pytest.mark.golden
def test_reference_bottleneck_temporal_inflation():
    """The quirk of mobilenet.py:67-75: (1,k,k) depthwise with int padding
    k//2 inflates T. k3/s1: T8->10; k3/s2: T8->5; k5/s2: T8->6."""
    for k, s, t_out in [(3, 1, 10), (3, 2, 5), (5, 2, 6)]:
        m = Bottleneck3D(4, 4, 8, stride=s, kernel_size=k,
                         nonlinearity=act.relu)
        v = m.init(jax.random.key(0))
        y, _ = m.apply(v, jnp.zeros((1, 8, 16, 16, 4)), train=False)
        assert y.shape[1] == t_out, (k, s, y.shape)


@pytest.mark.golden
def test_batchnorm_matches_torch_train_and_eval(rng):
    c = 6
    tbn = tnn.BatchNorm3d(c)
    ours = BatchNorm(c)
    v = ours.init(jax.random.key(0))
    x1 = rng.randn(4, 3, 5, 5, c).astype(np.float32)
    x2 = rng.randn(4, 3, 5, 5, c).astype(np.float32)

    # two train steps: statistics must evolve identically
    tbn.train()
    for x in (x1, x2):
        tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        with torch.no_grad():
            want = tbn(tx)
        got, new_state = ours.apply(v, jnp.asarray(x), train=True)
        v = {"params": v["params"], "state": new_state}
        np.testing.assert_allclose(np.asarray(got),
                                   want.permute(0, 2, 3, 4, 1).numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(v["state"]["mean"]),
                               tbn.running_mean.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(v["state"]["var"]),
                               tbn.running_var.numpy(), **TOL)

    # eval uses running stats
    tbn.eval()
    with torch.no_grad():
        want = tbn(torch.from_numpy(x1).permute(0, 4, 1, 2, 3))
    got, _ = ours.apply(v, jnp.asarray(x1), train=False)
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 4, 1).numpy(), **TOL)


@pytest.mark.golden
def test_layernorm_groupnorm_match_torch(rng):
    x = rng.randn(2, 7, 16).astype(np.float32)
    tln = tnn.LayerNorm(16, elementwise_affine=False)
    ours = LayerNorm(16, affine=False)
    v = ours.init(jax.random.key(0))
    got, _ = ours.apply(v, jnp.asarray(x))
    with torch.no_grad():
        want = tln(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)

    # GroupNorm(1, C) over (B, P, N, C) channels-last vs torch (B, C, P, N)
    x4 = rng.randn(2, 4, 6, 8).astype(np.float32)
    tgn = tnn.GroupNorm(1, 8)
    ours_gn = GroupNorm(1, 8)
    vg = ours_gn.init(jax.random.key(0))
    got, _ = ours_gn.apply(vg, jnp.asarray(x4))
    with torch.no_grad():
        want = tgn(torch.from_numpy(x4).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(), **TOL)


@pytest.mark.golden
def test_se_block_matches_torch(rng):
    c = 8
    ours = SEBlock(c)
    v = ours.init(jax.random.key(0))
    tse = tnn.Sequential(
        tnn.AdaptiveAvgPool3d(1), tnn.Conv3d(c, c // 4, 1), tnn.ReLU(),
        tnn.Conv3d(c // 4, c, 1), tnn.Hardsigmoid())
    v["params"]["w1"] = t2j(tse[1].weight.squeeze(-1).squeeze(-1).squeeze(-1).T)
    v["params"]["b1"] = t2j(tse[1].bias)
    v["params"]["w2"] = t2j(tse[3].weight.squeeze(-1).squeeze(-1).squeeze(-1).T)
    v["params"]["b2"] = t2j(tse[3].bias)
    x = rng.randn(2, 3, 4, 4, c).astype(np.float32)
    tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    with torch.no_grad():
        want = tx * tse(tx)
    got, _ = ours.apply(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 4, 1).numpy(), **TOL)


@pytest.mark.golden
def test_lstm_matches_torch(rng):
    tl = tnn.LSTM(input_size=12, hidden_size=8, num_layers=2,
                  batch_first=True)
    ours = LSTM(12, 8, num_layers=2)
    v = ours.init(jax.random.key(0))
    for l in range(2):
        v["params"][f"w_ih_l{l}"] = t2j(
            getattr(tl, f"weight_ih_l{l}").T)
        v["params"][f"w_hh_l{l}"] = t2j(getattr(tl, f"weight_hh_l{l}").T)
        v["params"][f"b_ih_l{l}"] = t2j(getattr(tl, f"bias_ih_l{l}"))
        v["params"][f"b_hh_l{l}"] = t2j(getattr(tl, f"bias_hh_l{l}"))
    x = rng.randn(3, 9, 12).astype(np.float32)
    with torch.no_grad():
        want, _ = tl(torch.from_numpy(x))
    got, _ = ours.apply(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.golden
def test_dense_and_avgpool_match_torch(rng):
    td = tnn.Linear(10, 4)
    ours = Dense(10, 4)
    v = ours.init(jax.random.key(0))
    v["params"]["w"] = t2j(td.weight.T)
    v["params"]["b"] = t2j(td.bias)
    x = rng.randn(5, 10).astype(np.float32)
    with torch.no_grad():
        want = td(torch.from_numpy(x))
    got, _ = ours.apply(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)

    tp = tnn.AvgPool2d(kernel_size=7, stride=1)
    ours_p = AvgPool2d(7, 1)
    vp = ours_p.init(jax.random.key(0))
    x = rng.randn(2, 9, 9, 3).astype(np.float32)
    with torch.no_grad():
        want = tp(torch.from_numpy(x).permute(0, 3, 1, 2))
    got, _ = ours_p.apply(vp, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(), **TOL)
