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
