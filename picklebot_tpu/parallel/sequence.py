"""Sequence parallelism (SP) boundary operators.

Extends the Megatron f/g custom-VJP pattern (models/mobilevit.py TP
operators) to the token axis: a transformer region runs on a 1/size token
shard per device, with these three operators making forward AND backward
exact when the surrounding network is replicated over the 'seq' axis:

  * ``sp_scatter_tokens`` — enter the SP region: slice the local token
    block (forward); all-gather the block cotangents back into the full,
    replicated cotangent (backward). A plain dynamic-slice would zero the
    cotangent outside the local block, desynchronizing the replicated
    upstream's parameter gradients across 'seq' ranks.
  * ``sp_gather_tokens`` — leave the SP region: tiled all-gather (forward);
    slice the local block of the already-replicated cotangent (backward).
    The naive transpose (psum-scatter) would overscale the cotangent by the
    axis size, exactly the bug class _tp_reduce_out guards against on the
    TP axis.
  * ``sp_sync_param`` — identity forward, psum backward: wrap every
    parameter leaf consumed *inside* the SP region. Each rank's backward
    only sees its local tokens' contribution; the true gradient of a
    replicated (or TP-sharded) parameter is the sum over token blocks.
    Wrapping at the region boundary keeps the sync exactly coextensive
    with where SP actually engaged — no train-step-level bookkeeping, and
    a region that falls back to replicated execution (indivisible token
    count) simply doesn't wrap, keeping gradients correct either way.

All three are linear-cost: one tiled all-gather each way per region plus
the ring permutes inside ring_attention; everything rides ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from picklebot_tpu.parallel.megatron import tp_copy_in


def _local_block(x, axis_name: str, token_axis: int):
    n = x.shape[token_axis]
    size = jax.lax.axis_size(axis_name)
    if n % size:
        # dynamic_slice clamps out-of-range starts, so a non-divisible
        # token count would silently drop tokens (and overlap blocks on
        # the high ranks) — every caller must pre-check divisibility (the
        # TransformerStack falls back to replicated execution); fail
        # loudly for any new caller that doesn't
        raise ValueError(
            f"sequence parallelism needs the token count ({n}) divisible "
            f"by the '{axis_name}' axis size ({size})")
    n_local = n // size
    start = jax.lax.axis_index(axis_name) * n_local
    return jax.lax.dynamic_slice_in_dim(x, start, n_local, axis=token_axis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def sp_scatter_tokens(x, axis_name: str, token_axis: int = -2):
    """Replicated (..., N, ...) -> local (..., N/size, ...) token block."""
    return _local_block(x, axis_name, token_axis)


def _sp_scatter_fwd(x, axis_name, token_axis):
    return _local_block(x, axis_name, token_axis), None


def _sp_scatter_bwd(axis_name, token_axis, _, g):
    # blocks live on distinct ranks; tiled all-gather rebuilds the full
    # cotangent, replicated — matching the replicated primal upstream
    return (jax.lax.all_gather(g, axis_name, axis=token_axis, tiled=True),)


sp_scatter_tokens.defvjp(_sp_scatter_fwd, _sp_scatter_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def sp_gather_tokens(x, axis_name: str, token_axis: int = -2):
    """Local (..., N/size, ...) token block -> replicated (..., N, ...)."""
    return jax.lax.all_gather(x, axis_name, axis=token_axis, tiled=True)


def _sp_gather_fwd(x, axis_name, token_axis):
    return jax.lax.all_gather(x, axis_name, axis=token_axis, tiled=True), None


def _sp_gather_bwd(axis_name, token_axis, _, g):
    # the downstream is replicated over 'seq', so every rank already holds
    # the identical full cotangent: take the local block (psum-scatter, the
    # naive transpose, would overscale by the axis size)
    return (_local_block(g, axis_name, token_axis),)


sp_gather_tokens.defvjp(_sp_gather_fwd, _sp_gather_bwd)


# identity forward / psum backward is EXACTLY Megatron's 'f' applied to a
# parameter leaf — one custom-VJP definition of the operator, not two
# copies to keep in sync
sp_sync_param = tp_copy_in


def sp_wrap_params(params, axis_name: str):
    """Wrap every leaf of a param subtree with sp_sync_param."""
    return jax.tree_util.tree_map(
        lambda p: sp_sync_param(jnp.asarray(p), axis_name), params)
