"""Pipeline parallelism (PP): GPipe microbatch schedule over a mesh axis.

Completes the parallelism surface (DP x TP x SP x PP) for the MobileViT
transformer stacks — the reference has no pipeline capability (its DDP
layer, reference train.py:24-36, is data-parallel only), so this is a
beyond-reference axis, built the TPU way: the schedule is a single
``lax.scan`` of compute ticks with a ``ppermute`` rotating activations one
stage forward per tick, compiled into one SPMD program. No host-side
scheduler, no send/recv threads — XLA lowers the stage hop to an ICI
collective-permute and autodiff of the scan gives the reverse-order
backward schedule (cotangents ride the counter-rotation) for free.

Schedule (GPipe, Huang et al. 2019): ``P`` stages each own ``L/P``
consecutive layers of a depth-``L`` homogeneous stack (the per-layer
parameter pytrees stacked on a leading axis). The per-device batch splits
into ``M`` microbatches; at tick ``t`` (of ``M + P - 1``):

  stage 0 feeds microbatch ``t`` (while ``t < M``),
  stage ``r`` applies its layers to the activation received from stage
  ``r-1`` (garbage zeros during fill/drain ticks — masked out of the
  result and, by the same masks' transposes, out of every gradient),
  stage ``P-1`` writes finished microbatch ``t-(P-1)`` to the output.

Utilization is the standard GPipe ``M / (M + P - 1)`` bubble; raise
``microbatches`` to amortize. Parameters here stay replicated over the
'pipe' axis (these are ~4M-param models — PP is offered for its compute
pipelining and as the scaling pattern; a P('pipe')-sharded stacked layout
is the natural extension for models whose layers don't fit one chip), so
each stage's layer gradients — nonzero only on the rank that ran them —
are psum'd over 'pipe' via the same identity-forward/psum-backward wrap
sequence parallelism uses (parallel/sequence.py sp_sync_param).

Exactness: with dropout off (or in eval mode) the pipelined stack is
numerically the plain layer loop — microbatching is exact because every
stack op (LayerNorm, attention, FFN, residual) is per-sample. With dropout
on, masks draw from a (layer, microbatch)-keyed stream instead of the
unsharded layer-ordered stream — the same documented class of rng
divergence as DP's per-replica fold_in and SP's per-rank fold.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

# identity-forward / psum-backward: the PP gradient sync is the same
# operator SP uses, over a different axis
from picklebot_tpu.parallel.sequence import sp_wrap_params as pp_wrap_params

__all__ = ["gpipe_apply", "pp_wrap_params"]


def gpipe_apply(layer_fn: Callable[[Any, jax.Array, jax.Array, jax.Array],
                                   jax.Array],
                stacked_params: Any, x: jax.Array, axis_name: str,
                microbatches: int) -> jax.Array:
    """Run a homogeneous layer stack as a GPipe pipeline over ``axis_name``.

    Must run inside ``shard_map`` on a mesh that has ``axis_name``.

    layer_fn(params_one_layer, layer_idx, mb_idx, h) -> h
        applies ONE layer (attention + FFN + residuals for a transformer);
        ``layer_idx`` (global, traced) and ``mb_idx`` key its rng stream.
    stacked_params
        pytree whose leaves carry the full depth ``L`` on a leading axis
        (replicated over 'pipe'; each stage slices its ``L/P`` rows).
    x : (B, ...) per-device activations, replicated over ``axis_name``.
    microbatches : M; must divide B. M >= P keeps the bubble sane.

    Returns (B, ...) outputs, replicated over ``axis_name``.
    """
    n_stages = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if depth % n_stages != 0:
        raise ValueError(f"stack depth {depth} must divide over "
                         f"{n_stages} pipeline stages")
    l_local = depth // n_stages
    local = jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, rank * l_local, l_local, 0),
        stacked_params)

    m = microbatches
    if x.shape[0] % m != 0:
        raise ValueError(f"batch {x.shape[0]} must divide into "
                         f"{m} microbatches")
    xs = x.reshape((m, x.shape[0] // m) + x.shape[1:])

    def stage(h, mb_idx):
        def body(carry, layer):
            params_i, i = layer
            return layer_fn(params_i, rank * l_local + i, mb_idx, carry), None
        h, _ = jax.lax.scan(body, h, (local, jnp.arange(l_local)))
        return h

    def tick(carry, t):
        state, outbuf = carry
        # stage 0 feeds fresh microbatches; everyone else consumes the
        # activation rotated in from the previous stage last tick
        inp = jax.lax.dynamic_index_in_dim(xs, jnp.clip(t, 0, m - 1), 0,
                                           keepdims=False)
        cur = jnp.where(rank == 0, inp, state)
        out = stage(cur, jnp.clip(t - rank, 0, m - 1))
        # the last stage retires microbatch t-(P-1); fill/drain garbage is
        # masked here (and therefore out of all gradients via the where
        # transpose). Writes at clipped indices during fill re-store the
        # row's previous value, so the one valid write per row survives.
        widx = jnp.clip(t - (n_stages - 1), 0, m - 1)
        prev = jax.lax.dynamic_index_in_dim(outbuf, widx, 0, keepdims=False)
        valid = jnp.logical_and(rank == n_stages - 1, t >= n_stages - 1)
        outbuf = jax.lax.dynamic_update_index_in_dim(
            outbuf, jnp.where(valid, out, prev), widx, 0)
        nxt = jax.lax.ppermute(out, axis_name,
                               [(i, (i + 1) % n_stages)
                                for i in range(n_stages)])
        return (nxt, outbuf), None

    carry0 = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs))
    (_, outbuf), _ = jax.lax.scan(tick, carry0,
                                  jnp.arange(m + n_stages - 1))
    # only the last stage holds real outputs; zero-mask + psum replicates
    # them (one output-sized all-reduce — the region's downstream runs
    # replicated over 'pipe', mirroring the SP exit gather)
    outbuf = jnp.where(rank == n_stages - 1, outbuf, jnp.zeros_like(outbuf))
    return jax.lax.psum(outbuf, axis_name).reshape(x.shape)
