"""2D+LSTM streaming (online) inference tests.

The LSTM trunk is inherently causal, so feeding a clip in chunks with the
carried (h, c) state must reproduce the full-clip logits exactly — the
online-inference capability the reference's 2D models lack entirely (they
loop frames but always consume whole clips, mobilenet.py:355-366).
224x224 inputs: the reference hardcodes AvgPool2d(7) for 7x7 maps.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from picklebot_tpu.models.mobilenet2d_lstm import (MobileNetLarge2D,
                                                   MobileNetSmall2D)


@pytest.fixture(scope="module", params=["small", "large"])
def setup(request):
    model = (MobileNetSmall2D(13) if request.param == "small"
             else MobileNetLarge2D(13))
    variables = model.init(0)
    return model, variables


def test_chunked_equals_full(rng, setup):
    model, variables = setup
    b, t = 1, 4
    clip = rng.rand(b, t, 224, 224, 3).astype(np.float32)

    logits_full, _ = model.apply(variables, jnp.asarray(clip), train=False)

    carry = model.init_stream(b)
    logits_stream = None
    for i in range(0, t, 2):
        (logits_stream, carry), _ = model.apply(
            variables, jnp.asarray(clip[:, i:i + 2]), carry, train=False)

    np.testing.assert_allclose(np.asarray(logits_stream),
                               np.asarray(logits_full),
                               rtol=2e-4, atol=2e-4)


def test_streaming_is_causal(rng, setup):
    """Logits after the first chunk must not depend on later frames."""
    model, variables = setup
    b = 1
    head = rng.rand(b, 2, 224, 224, 3).astype(np.float32)

    outs = []
    for _ in range(2):
        carry = model.init_stream(b)
        (first, carry), _ = model.apply(variables, jnp.asarray(head), carry,
                                        train=False)
        outs.append(np.asarray(first))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_lstm_return_state_continuation(rng):
    """Unit: LSTM(initial=..., return_state=True) chunks == one pass."""
    from picklebot_tpu.ops.linear import LSTM

    lstm = LSTM(6, 4, num_layers=3)
    v = lstm.init(0)
    x = rng.rand(2, 10, 6).astype(np.float32)

    full, _ = lstm.apply(v, jnp.asarray(x), train=False)

    first, _ = lstm.apply(v, jnp.asarray(x[:, :6]), train=False)
    (seq_a, state), _ = lstm.apply(v, jnp.asarray(x[:, :6]),
                                   return_state=True, train=False)
    np.testing.assert_allclose(np.asarray(seq_a), np.asarray(first),
                               rtol=1e-6, atol=1e-6)
    (seq_b, _), _ = lstm.apply(v, jnp.asarray(x[:, 6:]), initial=state,
                               return_state=True, train=False)
    got = np.concatenate([np.asarray(seq_a), np.asarray(seq_b)], axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=1e-5, atol=1e-5)
