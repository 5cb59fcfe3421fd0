"""MoViNet stream-buffer causal inference tests.

The capability the reference scaffolds but never wires in
(movinet.py:7-39, 87-88): frame-chunk streaming with carried temporal
state must produce EXACTLY the logits of one full causal clip pass.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.models.movinet import MoViNetA2, MoViNetA2Stream


@pytest.fixture(scope="module")
def stream_setup():
    model = MoViNetA2Stream(num_classes=13)
    variables = model.init(0)
    return model, variables


def test_streaming_matches_full_causal_pass(rng, stream_setup):
    model, variables = stream_setup
    b, t, h, w = 1, 8, 32, 32
    clip = rng.rand(b, t, h, w, 3).astype(np.float32)

    # full pass: one chunk containing the whole clip
    carry0 = model.init_stream(b, h, w)
    (logits_full, _), _ = model.apply(variables, jnp.asarray(clip), carry0)

    # streamed: 4 chunks of 2 frames with carried buffers
    carry = model.init_stream(b, h, w)
    logits_stream = None
    for i in range(0, t, 2):
        (logits_stream, carry), _ = model.apply(
            variables, jnp.asarray(clip[:, i:i + 2]), carry)

    np.testing.assert_allclose(np.asarray(logits_stream),
                               np.asarray(logits_full),
                               rtol=2e-4, atol=2e-4)


def test_streaming_is_causal(rng, stream_setup):
    """Logits after the first chunk must not depend on later frames."""
    model, variables = stream_setup
    b, h, w = 1, 32, 32
    head = rng.rand(b, 4, h, w, 3).astype(np.float32)
    tail_a = rng.rand(b, 4, h, w, 3).astype(np.float32)
    tail_b = rng.rand(b, 4, h, w, 3).astype(np.float32)

    outs = []
    for tail in (tail_a, tail_b):
        carry = model.init_stream(b, h, w)
        (first, carry), _ = model.apply(variables, jnp.asarray(head), carry)
        outs.append(np.asarray(first))
        # feeding different tails afterwards must not retroact
    np.testing.assert_array_equal(outs[0], outs[1])


def test_stream_weights_shared_with_offline(rng):
    """The stream wrapper grafts offline weights under 'net'."""
    offline = MoViNetA2(num_classes=13)
    stream = MoViNetA2Stream(num_classes=13)
    v_off = offline.init(0)
    v_st = stream.init(0)
    off_leaves = jax.tree_util.tree_leaves(v_off["params"])
    st_leaves = jax.tree_util.tree_leaves(v_st["params"]["net"])
    assert len(off_leaves) == len(st_leaves)
    assert sum(x.size for x in off_leaves) == sum(
        x.size for x in st_leaves)
