"""ZeRO's payoff — per-rank memory — measured, not asserted.

Round 4 proved ZeRO-1/3 move IDENTICAL wire bytes to plain DP
(test_collective_bytes.py): the costs. This is the other half: the
at-rest state a rank must hold shrinks stage over stage. Bytes are
computed from the REAL state arrays in each layout (the same pytrees the
train step runs on and Orbax snapshots), divided by the shard count of
their sharded leading axis — exactly what one device of the mesh stores.

Companion table at bench shapes (incl. compiled peak from XLA's
memory_analysis): scripts/probe_zero_memory.py -> docs/BENCH.md.
"""

import numpy as np
import pytest
import jax

from picklebot_tpu.train.optim import AdamW, AdamW8bit
from picklebot_tpu.train.step import create_train_state

N_DEV = 8


def _tree_bytes(tree) -> int:
    return int(sum(np.asarray(l).nbytes
                   for l in jax.tree_util.tree_leaves(tree)))


def _moment_bytes(opt_state) -> int:
    return _tree_bytes(opt_state["m"]) + _tree_bytes(opt_state["v"])


@pytest.fixture(scope="module")
def model():
    from picklebot_tpu.models.mobilenet3d import MobileNetSmall3D
    return MobileNetSmall3D(num_classes=13)


def _layout_bytes(model, optimizer, n: int):
    """Per-rank at-rest bytes {replicated, zero1, zero3} for one optimizer.

    replicated: full params + full moments on every rank.
    zero1: full params; the moment rank-stacks are sharded over 'data'
      (zero_state_specs) -> a rank holds 1/n of each stack.
    zero3: params (and moments) are (n, chunk) rank stacks sharded on the
      leading axis (zero3_state_specs) -> 1/n of both.
    """
    from picklebot_tpu.parallel.zero import zero3_shard_params

    rep = create_train_state(model, optimizer, 0)
    rep_bytes = _tree_bytes(rep.params) + _moment_bytes(rep.opt_state)

    z1 = create_train_state(model, optimizer, 0, zero_degree=n)
    z1_bytes = _tree_bytes(z1.params) + _moment_bytes(z1.opt_state) // n

    z3_params = zero3_shard_params(z1.params, n)
    z3_bytes = (_tree_bytes(z3_params) // n
                + _moment_bytes(z1.opt_state) // n)
    return {"replicated": rep_bytes, "zero1": z1_bytes, "zero3": z3_bytes}


@pytest.mark.parametrize("opt_cls", [AdamW, AdamW8bit],
                         ids=["fp32", "8bit"])
def test_zero_per_rank_memory_shrinks(model, opt_cls):
    n = N_DEV
    b = _layout_bytes(model, opt_cls(weight_decay=5e-4), n)
    # strict ordering is the design claim: stage3 < stage1 < replicated
    assert b["zero3"] < b["zero1"] < b["replicated"], b
    # quantitative: stage 1 removes (n-1)/n of the MOMENT bytes; stage 3
    # additionally removes (n-1)/n of the PARAM bytes. Chunk zero-padding
    # and the 8-bit codec's per-block scales only add slack, so bound from
    # above with 10% headroom rather than asserting equality.
    params_b = _tree_bytes(create_train_state(
        model, opt_cls(weight_decay=5e-4), 0).params)
    moments_full = b["replicated"] - params_b
    if opt_cls is AdamW:
        assert b["zero1"] <= params_b + 1.10 * moments_full / n + 4096
        assert b["zero3"] <= 1.10 * (params_b + moments_full) / n + 4096
    else:
        # AdamW8bit inits on the per-rank (chunk,) protos, so leaves whose
        # CHUNK falls below min_8bit_size keep fp32 moments — the per-rank
        # share is larger than replicated-8bit/n but still bounded by the
        # fp32 worst case (2 moments x 4 bytes per param, sharded 1/n)
        n_params = params_b // 4
        fp32_worst = 8 * n_params / n
        assert b["zero1"] <= params_b + 1.10 * fp32_worst + 4096
        assert b["zero3"] <= 1.10 * (params_b / n + fp32_worst) + 4096


def test_zero_memory_scales_with_degree(model):
    """Doubling the ZeRO degree halves the sharded share (within padding
    slack) — the 1/N scaling users size their pods by."""
    opt = AdamW(weight_decay=5e-4)
    b4 = _layout_bytes(model, opt, 4)
    b8 = _layout_bytes(model, opt, 8)
    assert b8["zero3"] < b4["zero3"]
    assert b8["zero1"] < b4["zero1"]
    # zero3 at-rest is ~fully sharded: degree 8 should be ~half of degree 4
    assert b8["zero3"] < 0.6 * b4["zero3"]
