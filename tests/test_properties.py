"""Property tests: invariants that must hold across the input space.

The quirky conv geometry and the 8-bit codec are the two places where a
silent off-by-one corrupts everything downstream; sweep them broadly.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.data.dataset import bucket_frames
from picklebot_tpu.ops import activations as act
from picklebot_tpu.ops.bottleneck import Bottleneck3D
from picklebot_tpu.train.optim import (BLOCK, _dequantize_signed,
                                       _dequantize_unsigned,
                                       _quantize_signed, _quantize_unsigned)


def test_codec_roundtrip_relative_error_bound(rng):
    """Dynamic 8-bit: <= 6.25% relative error for any value within ~4.5
    (signed) / ~9.3 (unsigned) decades of its block's absmax; exact zeros
    stay zero; signs preserved."""
    for magnitudes in (1e-30, 1e-8, 1.0, 1e12):
        x = (rng.randn(4096) * magnitudes).astype(np.float32)
        x[::97] = 0.0
        q, s = _quantize_signed(jnp.asarray(x))
        xr = np.asarray(_dequantize_signed(q, s, x.shape))
        # values below the smallest octave correctly underflow to 0; signs
        # must be preserved for everything representable
        big = np.abs(x) > np.abs(x).max() * 2.0 ** -14
        np.testing.assert_array_equal(np.sign(xr[big]), np.sign(x[big]))
        assert (xr[x == 0] == 0).all()
        rel = np.abs(xr[big] - x[big]) / np.abs(x[big])
        assert rel.max() <= 0.0625 + 1e-6, (magnitudes, rel.max())

        v = np.abs(x)
        q, s = _quantize_unsigned(jnp.asarray(v))
        vr = np.asarray(_dequantize_unsigned(q, s, v.shape))
        assert (vr >= 0).all()
        big = v > v.max() * 2.0 ** -30
        rel = np.abs(vr[big] - v[big]) / v[big]
        assert rel.max() <= 0.0625 + 1e-6


def test_codec_block_absmax_roundtrips_exactly(rng):
    """ADVICE r1: the block absmax (normalized magnitude 1.0, present in
    every block by construction) must round-trip losslessly like bnb's
    dynamic codebook — not carry a systematic -6.25% clamp bias."""
    x = rng.randn(4 * BLOCK).astype(np.float32)
    q, s = _quantize_signed(jnp.asarray(x))
    xr = np.asarray(_dequantize_signed(q, s, x.shape)).reshape(-1, BLOCK)
    xb = x.reshape(-1, BLOCK)
    for b in range(xb.shape[0]):
        i = np.argmax(np.abs(xb[b]))
        assert xr[b, i] == xb[b, i], (b, xb[b, i], xr[b, i])

    v = np.abs(x)
    q, s = _quantize_unsigned(jnp.asarray(v))
    vr = np.asarray(_dequantize_unsigned(q, s, v.shape)).reshape(-1, BLOCK)
    vb = v.reshape(-1, BLOCK)
    for b in range(vb.shape[0]):
        i = np.argmax(vb[b])
        assert vr[b, i] == vb[b, i]


def test_codec_matches_codebook_lookup(rng):
    """The arithmetic frexp/exp2 encode must agree with nearest-entry
    lookup in the explicit codebooks (including the new exact-1.0 points)."""
    from picklebot_tpu.train.optim import _SIGNED_CODE
    x = np.concatenate([rng.randn(BLOCK), [1.0, -1.0, 0.9375, 0.969, 0.968]]
                       ).astype(np.float32)
    x = np.pad(x, (0, (-x.size) % BLOCK))
    q, s = _quantize_signed(jnp.asarray(x))
    xr = np.asarray(_dequantize_signed(q, s, x.shape))
    a = (x.reshape(-1, BLOCK) /
         np.maximum(np.abs(x.reshape(-1, BLOCK)).max(1, keepdims=True),
                    1e-30)).reshape(-1)
    codebook = _SIGNED_CODE[:243]
    want = codebook[np.argmin(np.abs(a[:, None] - codebook[None, :]), axis=1)]
    scale = np.repeat(np.abs(x.reshape(-1, BLOCK)).max(1), BLOCK)
    np.testing.assert_allclose(xr, want * scale, rtol=1e-6, atol=1e-38)


def test_module_list_attr_registers_like_modulelist():
    """ADVICE r1: a raw python list of Modules must behave exactly like
    ModuleList (init at params['stem']['0'] AND apply through the same
    nested path) — previously init wrote literal dotted keys."""
    from picklebot_tpu.core.module import Module, ModuleList
    from picklebot_tpu.ops.linear import Dense

    class WithRawList(Module):
        def __init__(self):
            super().__init__()
            self.stem = [Dense(4, 4), Dense(4, 4)]

        def forward(self, cx, x):
            for m in self.stem:
                x = cx(m, x)
            return x

    class WithModuleList(Module):
        def __init__(self):
            super().__init__()
            self.stem = ModuleList([Dense(4, 4), Dense(4, 4)])

        def forward(self, cx, x):
            for m in self.stem:
                x = cx(m, x)
            return x

    a, b = WithRawList(), WithModuleList()
    va, vb = a.init(0), b.init(0)
    assert set(va["params"]) == {"stem"}
    assert set(va["params"]["stem"]) == {"0", "1"}
    x = jnp.asarray(np.ones((2, 4), np.float32))
    out_a, _ = a.apply(va, x)
    out_b, _ = b.apply(vb, x)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_codec_handles_degenerate_blocks():
    # all-zero block, single-value block, block of identical values
    for x in (np.zeros(BLOCK), np.full(BLOCK, 3.25), np.full(BLOCK, -1e-20)):
        x = x.astype(np.float32)
        q, s = _quantize_signed(jnp.asarray(x))
        xr = np.asarray(_dequantize_signed(q, s, x.shape))
        np.testing.assert_allclose(xr, x, rtol=0.0625, atol=0)


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("s", [1, 2])
@pytest.mark.parametrize("t,hw", [(1, 8), (3, 9), (8, 16), (5, 17)])
def test_bottleneck_shape_formula(k, s, t, hw):
    """Output shapes must follow torch's conv formula with the reference's
    quirky (1,k,k)-kernel-with-int-stride-and-padding geometry for every
    (T, H, W) — including non-multiples of the stride."""
    m = Bottleneck3D(2, 3, 4, stride=s, kernel_size=k,
                     nonlinearity=act.relu)
    v = m.init(0)
    y, _ = m.apply(v, jnp.zeros((1, t, hw, hw, 2)), train=False)
    p = k // 2
    t_out = (t + 2 * p - 1) // s + 1
    hw_out = (hw + 2 * p - k) // s + 1
    assert y.shape == (1, t_out, hw_out, hw_out, 3), (y.shape, t_out, hw_out)


def test_bucket_frames_invariants():
    for t in range(1, 70):
        for bucket in (1, 4, 8, 16):
            b = bucket_frames(t, bucket, 64)
            assert b % bucket == 0 or b == 64
            assert b >= min(t, 64)
            assert b <= 64


def test_windowed_average_preserves_mean(rng):
    from picklebot_tpu.train.metrics import windowed_average
    vals = rng.rand(3500).tolist()
    w = windowed_average(vals)
    # weighted mean of windows == overall mean
    sizes = [1000, 1000, 1000, 500]
    np.testing.assert_allclose(np.dot(w, sizes) / sum(sizes),
                               np.mean(vals), rtol=1e-9)
