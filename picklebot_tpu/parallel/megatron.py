"""Megatron-style f/g boundary operators for axis-sharded regions.

A region whose *hidden* dimension is sharded over a mesh axis (tensor
parallelism of the MobileViT FFNs, expert parallelism of the MoE expert
bank) produces per-rank partial outputs that must sum across the axis,
while its replicated input's cotangent is the sum of each shard's
contribution. The custom-VJP pair below makes both directions exact:

  * ``tp_copy_in``  — Megatron's 'f': identity forward, psum backward.
  * ``tp_reduce_out`` — Megatron's 'g': psum forward, identity backward.
    The naive transpose of a forward psum would psum the already-replicated
    output cotangent again, overscaling gradients by the axis size — the
    bug class this construction exists to prevent.

Shared by models/mobilevit.FeedForward (TP over 'model') and ops/moe
(EP over 'expert'). SP's token-axis analogs live in parallel/sequence.py.
"""

from __future__ import annotations

import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_copy_in(x, axis):
    """Identity forward, all-reduce backward: the replicated residual
    stream enters an axis-sharded region; its cotangent is the sum of each
    shard's contribution."""
    return x


def _tp_copy_in_fwd(x, axis):
    return x, None


def _tp_copy_in_bwd(axis, _, g):
    return (jax.lax.psum(g, axis),)


tp_copy_in.defvjp(_tp_copy_in_fwd, _tp_copy_in_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_reduce_out(x, axis):
    """All-reduce forward, identity backward: per-shard partial outputs
    sum across the axis; the output cotangent is already replicated."""
    return jax.lax.psum(x, axis)


def _tp_reduce_out_fwd(x, axis):
    return jax.lax.psum(x, axis), None


def _tp_reduce_out_bwd(axis, _, g):
    return (g,)


tp_reduce_out.defvjp(_tp_reduce_out_fwd, _tp_reduce_out_bwd)
