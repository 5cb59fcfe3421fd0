"""ZeRO-sharded data parallelism: optimizer state partitioned over 'data'.

The reference's DDP (train.py:203-204) replicates optimizer state on every
rank — bitsandbytes AdamW8bit (train.py:208-212) exists precisely because
that replication is expensive. On TPU we can do what DeepSpeed ZeRO does,
natively in the sharding layer: every data rank owns a 1/N slice of each
parameter's (flattened) optimizer moments and computes the update for only
that slice.

Communication pattern per step (inside the existing shard_map train step):

    reduce-scatter(grads)   — each rank receives the summed grads of ITS
                              slice only (replaces the DP all-reduce; a
                              reduce-scatter moves the same bytes over ICI)
    local optimizer update  — on the 1/N slice of params/moments
    all-gather(new params)  — rebuilds the replicated parameters

reduce-scatter + all-gather is exactly an all-reduce decomposed, so the
step's ICI traffic is unchanged while optimizer memory drops N-fold:
fp32 AdamW moments go from 8 bytes/param on every chip to 8/N, and the
8-bit optimizer's blocks (train/optim.py) quantize per slice, composing
the two savings (2.25 bytes/param -> 2.25/N).

Stage 3 (``config zero_sharding: 3`` — parameter sharding, the FSDP/
DeepSpeed-ZeRO-3 layout) additionally stores the PARAMETERS (and the EMA
stream, when enabled) as the same per-rank flat chunks: at-rest param
memory drops N-fold too, and the step's communication merely moves — the
all-gather runs at the START of the step (rebuilding full params for the
forward/backward) instead of after the update, so per-step ICI bytes are
identical to stage 1. The gathered params live for the step's duration
(the backward needs them), so PEAK memory still holds one full copy;
what stage 3 buys is everything outside the step — at rest, in donated
double-buffers, and per-state-copy (EMA). Checkpoints write fully
GATHERED params/EMA (host-side unshard at save), so every downstream
surface — serve, export, convert, .pth — reads snapshots identically for
all stages and degrees; restore re-chunks for the run's layout.

Numerics: sum-then-scale gradient reduction and an elementwise Adam update
on a flat slice are the same arithmetic as the replicated path, so ZeRO-DP
matches plain DP exactly (tests/test_zero.py asserts it; stage 3 adds only
exact reshapes on top and matches too, tests/test_zero3.py).

Layout: each parameter leaf is flattened and zero-padded to
``n * ceil(size/n)``; rank r owns ``[r*chunk, (r+1)*chunk)``. Optimizer
moment leaves gain a leading 'data' axis of size n (PartitionSpec
('data', None, ...)) so shard_map hands every rank exactly its slice.
Checkpoints therefore record the sharded layout — resuming requires the
same data-parallel degree (documented in train/checkpoint.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

PyTree = Any


def _chunk(size: int, n: int) -> int:
    return -(-size // n)


def zero_opt_state(optimizer, params: PyTree, n: int) -> PyTree:
    """Host-side (numpy) optimizer state in the ZeRO layout.

    The optimizer inits on per-rank flat prototypes (shape (chunk,)), so
    structure decisions that depend on local size — AdamW8bit's
    min_8bit_size fp32 fallback, its blockwise q/s layout — are made for
    the slice a rank will actually update, exactly like the TP per-shard
    machinery (train/optim.py AdamW8bit.init model_shards). Every rank's
    zero-state is identical, so the global array is a broadcast stack."""
    protos = jax.tree_util.tree_map(
        lambda p: np.zeros((_chunk(p.size, n),), np.float32), params)
    shard_state = optimizer.init(protos)

    def stack(x):
        x = np.asarray(x)
        return np.broadcast_to(x[None], (n,) + x.shape).copy()

    return {
        "step": shard_state["step"],
        "m": jax.tree_util.tree_map(stack, shard_state["m"]),
        "v": jax.tree_util.tree_map(stack, shard_state["v"]),
    }


def zero_state_specs(state) -> Any:
    """PartitionSpec pytree for a TrainState in the ZeRO layout: params and
    model state replicated, optimizer moment leaves sharded on their leading
    'data' axis (the rank-stack built by zero_opt_state)."""
    def rep(tree):
        return jax.tree_util.tree_map(lambda _: P(), tree)

    def leaf_spec(x):
        return P(*(("data",) + (None,) * (np.ndim(x) - 1)))

    opt_specs = {
        "step": P(),
        "m": jax.tree_util.tree_map(leaf_spec, state.opt_state["m"]),
        "v": jax.tree_util.tree_map(leaf_spec, state.opt_state["v"]),
    }
    # EMA runs on the post-all-gather full params, so it stays replicated
    ema_specs = (rep(state.ema_params)
                 if state.ema_params is not None else None)
    return type(state)(params=rep(state.params),
                       model_state=rep(state.model_state),
                       opt_state=opt_specs, epoch=P(),
                       ema_params=ema_specs)


def _shard_and_clip_grads(grads: PyTree, n: int, axis: str, max_grad_norm):
    """Reduce-scatter every grad leaf to this rank's flat chunk (DDP mean
    semantics: sum / n == pmean) and optionally global-norm clip on the
    slices (each rank psums its slice's square-sum; pad zeros contribute
    nothing, so this matches the replicated clipped step exactly). Shared
    by stage 1 and stage 3 — one implementation is what keeps the stages
    bit-equal (tests/test_zero3.py)."""
    def grad_shard(g):
        c = _chunk(g.size, n)
        f = jnp.pad(g.reshape(-1), (0, n * c - g.size))
        return jax.lax.psum_scatter(f, axis, scatter_dimension=0,
                                    tiled=True) / n

    g_sh = jax.tree_util.tree_map(grad_shard, grads)
    grad_norm = None
    if max_grad_norm is not None:
        local_sq = sum(jnp.sum(jnp.square(g))
                       for g in jax.tree_util.tree_leaves(g_sh))
        grad_norm = jnp.sqrt(jax.lax.psum(local_sq, axis))
        scale = jnp.minimum(1.0, max_grad_norm / (grad_norm + 1e-6))
        g_sh = jax.tree_util.tree_map(lambda g: g * scale, g_sh)
    return g_sh, grad_norm


def _slice_opt(opt_state: PyTree) -> PyTree:
    """(1, ...) rank-stack slices -> the flat per-rank state the optimizer
    runs on."""
    return {
        "step": opt_state["step"],
        "m": jax.tree_util.tree_map(lambda x: x[0], opt_state["m"]),
        "v": jax.tree_util.tree_map(lambda x: x[0], opt_state["v"]),
    }


def _stack_opt(opt_sh: PyTree) -> PyTree:
    """Inverse of _slice_opt: re-add the leading rank-stack axis."""
    return {
        "step": opt_sh["step"],
        "m": jax.tree_util.tree_map(lambda x: x[None], opt_sh["m"]),
        "v": jax.tree_util.tree_map(lambda x: x[None], opt_sh["v"]),
    }


def zero_update(optimizer, params: PyTree, grads: PyTree, opt_state: PyTree,
                lr, n: int, axis: str = "data", max_grad_norm=None):
    """The sharded optimizer step. Runs INSIDE shard_map (train/step.py):
    ``grads`` are this rank's locally-accumulated (un-reduced) gradients,
    ``params`` are replicated, ``opt_state`` moment leaves arrive as
    (1, ...) slices of the rank stack.

    ``max_grad_norm``: global-norm clipping on the reduced grads — see
    _shard_and_clip_grads.

    Returns (new replicated params, new opt_state slices (1, ...),
    grad_norm or None)."""
    idx = jax.lax.axis_index(axis)

    def param_shard(p):
        c = _chunk(p.size, n)
        f = jnp.pad(p.reshape(-1), (0, n * c - p.size))
        return jax.lax.dynamic_slice(f, (idx * c,), (c,))

    g_sh, grad_norm = _shard_and_clip_grads(grads, n, axis, max_grad_norm)
    p_sh = jax.tree_util.tree_map(param_shard, params)
    new_p_sh, new_opt_sh = optimizer.update(g_sh, _slice_opt(opt_state),
                                            p_sh, lr)

    def regather(ps, p):
        full = jax.lax.all_gather(ps, axis, tiled=True)  # (n*chunk,)
        return full[: p.size].reshape(p.shape).astype(p.dtype)

    new_params = jax.tree_util.tree_map(regather, new_p_sh, params)
    return new_params, _stack_opt(new_opt_sh), grad_norm


# --------------------------------------------------------------------------
# Stage 3: parameter sharding (FSDP / DeepSpeed-ZeRO-3 layout)
# --------------------------------------------------------------------------

def zero3_shard_params(params: PyTree, n: int) -> PyTree:
    """Host-side (numpy): every leaf -> an (n, chunk) rank stack of its
    zero-padded flat values (original dtype preserved). Rank r's row is
    the slice its optimizer update owns — the same partitioning
    zero_opt_state uses for the moments, so param chunk r and moment
    chunk r always describe the same elements."""
    def shard(p):
        p = np.asarray(p)
        c = _chunk(p.size, n)
        flat = np.pad(p.reshape(-1), (0, n * c - p.size))
        return flat.reshape(n, c)

    return jax.tree_util.tree_map(shard, params)


def zero3_unshard_params(stacked: PyTree, templates: PyTree) -> PyTree:
    """Host-side inverse of zero3_shard_params: (n, chunk) rank stacks ->
    full leaves shaped/typed like ``templates`` (arrays or
    ShapeDtypeStructs). Exact — chunking is pure reshape + zero pad."""
    def unshard(x, t):
        x = np.asarray(x)
        flat = x.reshape(-1)[: int(np.prod(t.shape, dtype=np.int64))]
        return flat.reshape(t.shape).astype(t.dtype)

    return jax.tree_util.tree_map(unshard, stacked, templates)


def param_templates(params: PyTree) -> PyTree:
    """ShapeDtypeStruct skeleton of a full (unsharded) param pytree — the
    static shape information zero3 steps need to rebuild leaves from rank
    stacks inside the compiled program."""
    return jax.tree_util.tree_map(
        lambda p: jax.ShapeDtypeStruct(np.shape(p), p.dtype), params)


def zero3_state_specs(state) -> Any:
    """PartitionSpec pytree for the stage-3 layout: params (and EMA) rank
    stacks sharded on their leading 'data' axis like the moments;
    model_state replicated."""
    def stacked(tree):
        return jax.tree_util.tree_map(lambda _: P("data", None), tree)

    opt_specs = {
        "step": P(),
        "m": jax.tree_util.tree_map(
            lambda x: P(*(("data",) + (None,) * (np.ndim(x) - 1))),
            state.opt_state["m"]),
        "v": jax.tree_util.tree_map(
            lambda x: P(*(("data",) + (None,) * (np.ndim(x) - 1))),
            state.opt_state["v"]),
    }
    ema_specs = (stacked(state.ema_params)
                 if state.ema_params is not None else None)
    return type(state)(params=stacked(state.params),
                       model_state=jax.tree_util.tree_map(
                           lambda _: P(), state.model_state),
                       opt_state=opt_specs, epoch=P(),
                       ema_params=ema_specs)


def zero3_gather_params(chunks: PyTree, templates: PyTree,
                        axis: str = "data") -> PyTree:
    """In-step (inside shard_map) all-gather of the (1, chunk) param slices
    back to full leaves. This is the stage-1 post-update all-gather moved
    to the top of the step; same ICI bytes."""
    def regather(ps, t):
        full = jax.lax.all_gather(ps[0], axis, tiled=True)  # (n*chunk,)
        size = int(np.prod(t.shape, dtype=np.int64))
        return full[:size].reshape(t.shape).astype(t.dtype)

    return jax.tree_util.tree_map(regather, chunks, templates)


def zero3_update(optimizer, param_chunks: PyTree, grads: PyTree,
                 opt_state: PyTree, lr, n: int, axis: str = "data",
                 max_grad_norm=None):
    """The stage-3 sharded optimizer step (inside shard_map): ``grads`` are
    this rank's full locally-accumulated gradients (w.r.t. the gathered
    params), ``param_chunks`` the (1, chunk) rank slices. Reduce-scatters
    the grads, updates the local slice, and returns NEW (1, chunk) slices —
    no trailing all-gather; the next step's zero3_gather_params rebuilds
    full params. Identical arithmetic to zero_update (stage 1), so stage 3
    == stage 1 == replicated DP exactly."""
    g_sh, grad_norm = _shard_and_clip_grads(grads, n, axis, max_grad_norm)
    p_sh = jax.tree_util.tree_map(
        lambda x: x[0].astype(jnp.float32), param_chunks)
    new_p_sh, new_opt_sh = optimizer.update(g_sh, _slice_opt(opt_state),
                                            p_sh, lr)
    new_chunks = jax.tree_util.tree_map(
        lambda ps, old: ps.astype(old.dtype)[None], new_p_sh, param_chunks)
    return new_chunks, _stack_opt(new_opt_sh), grad_norm


# --------------------------------------------------------------------------
# Checkpoint resharding: resume at a different DP degree (or toggle ZeRO)
# --------------------------------------------------------------------------

def _is_qs(x) -> bool:
    return isinstance(x, dict) and set(x) == {"q", "s"}


def zero_degree_of(params: PyTree, opt_state: PyTree) -> int:
    """The ZeRO degree of an optimizer-state pytree (0 = replicated).

    Decided from shape-unambiguous leaves: an 8-bit q/s leaf is
    rank-stacked iff its q is 3-D; an fp32 moment of a non-2-D parameter is
    stacked iff its rank is 2 (a 2-D parameter's replicated moment and its
    (n, chunk) stack can coincide in rank, so those leaves are skipped).
    Every real model here has 1-D biases/BN scales, which decide it."""
    p_leaves = jax.tree_util.tree_leaves(params)
    m_leaves = jax.tree_util.tree_leaves(opt_state["m"], is_leaf=_is_qs)
    for p, x in zip(p_leaves, m_leaves):
        if _is_qs(x):
            q = np.asarray(x["q"])
            return int(q.shape[0]) if q.ndim == 3 else 0
        x = np.asarray(x)
        if np.ndim(p) != 2:
            if x.ndim == np.ndim(p):
                return 0
            if x.ndim == 2:
                return int(x.shape[0])
    raise ValueError(
        "could not determine the optimizer-state layout: every moment "
        "leaf is shape-ambiguous (all parameters 2-D)")


def zero_reshard(optimizer, params: PyTree, opt_state: PyTree,
                 n_new: int, n_old: int = None) -> PyTree:
    """Host-side (numpy) conversion of a restored optimizer state between
    layouts: ZeRO(n_old) -> ZeRO(n_new), replicated -> ZeRO, or ZeRO ->
    replicated — so a run can resume at a different data-parallel degree
    (DeepSpeed requires offline scripts for this; here it is one pure
    host-side transform at restore time, train/loop.py).

    fp32 moments are exact (unpad -> concat -> re-chunk). 8-bit moments
    are decoded and requantized with the numpy codec (train/optim.py,
    xp=np — device-free: through the TPU tunnel every tiny op is an RPC):
    block boundaries move, so values round-trip within one codec quantum
    (<=6.25% relative), and ``min_8bit_size`` is re-decided for the new
    slice size exactly as a fresh init would.

    ``n_new``/``n_old`` <= 1 mean the replicated layout; ``n_old`` is
    detected from the state when not given. Pure-DP layouts only (ZeRO
    never composes with TP/EP here; their per-shard states are handled by
    parallel/mesh.train_state_specs)."""
    from picklebot_tpu.train import optim as _optim

    if n_old is None:
        n_old = zero_degree_of(params, opt_state)
    n_old = 0 if n_old <= 1 else int(n_old)
    n_new = 0 if n_new <= 1 else int(n_new)
    if n_old == n_new:
        return opt_state

    def to_flat(p, x, signed):
        deq = (_optim._dequantize_signed if signed
               else _optim._dequantize_unsigned)
        if _is_qs(x):
            q, s = np.asarray(x["q"]), np.asarray(x["s"])
            if n_old:
                c = _chunk(p.size, n_old)
                flat = np.concatenate([
                    np.asarray(deq(q[r], s[r], (c,), xp=np))
                    for r in range(n_old)])
            else:
                flat = np.asarray(deq(q, s, (q.size,), xp=np))
            return flat[: p.size].astype(np.float32)
        return np.asarray(x, np.float32).reshape(-1)[: p.size]

    def encode(p, flat, skel, signed):
        quant = (_optim._quantize_signed if signed
                 else _optim._quantize_unsigned)
        if n_new:
            c = _chunk(p.size, n_new)
            padded = np.pad(flat, (0, n_new * c - p.size))
            if _is_qs(skel):
                qs = [quant(padded[r * c:(r + 1) * c], xp=np)
                      for r in range(n_new)]
                return {"q": np.stack([q for q, _ in qs]),
                        "s": np.stack([s for _, s in qs])}
            return padded.reshape(n_new, c)
        if _is_qs(skel):
            q, s = quant(flat, xp=np)
            return {"q": np.asarray(q), "s": np.asarray(s)}
        return flat.reshape(np.shape(p))

    # the target skeleton decides structure (q/s vs fp32 fallback) exactly
    # like a fresh init at the target degree would
    skeleton = (zero_opt_state(optimizer, params, n_new) if n_new
                else optimizer.init(params))

    def convert(key, signed):
        return jax.tree_util.tree_map(
            lambda p, x, sk: encode(p, to_flat(p, x, signed), sk, signed),
            params, opt_state[key], skeleton[key])

    return {"step": np.asarray(opt_state["step"]).copy(),
            "m": convert("m", True),
            "v": convert("v", False)}
