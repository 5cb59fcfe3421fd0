"""Mixture-of-Experts feed-forward with expert parallelism (EP).

Beyond-reference capability (the reference's parallelism surface is DP only,
train.py:24-36): the MobileViT transformer FFN (reference mobilevit.py:28-40)
generalized to a sparsely-activated expert bank with GShard-style top-k
routing, so the framework's parallelism set (DP/TP/SP/PP) closes with EP.

TPU-first formulation — everything is static-shape dense algebra the MXU
likes, no sort/scatter/ragged ops:

  * Routing is expressed as one-hot *dispatch/combine einsums* (the original
    Mesh-TensorFlow/GShard device formulation): each expert receives a fixed
    ``capacity`` of token slots per group; token->slot positions come from a
    cumsum over the token axis; overflow tokens beyond capacity simply drop
    out of the one-hot (their combine weight is zero — the residual stream
    carries them unchanged, standard MoE semantics).
  * Expert parallelism shards the stacked expert weights (E, d, h) over the
    mesh 'expert' axis (parallel/mesh.py P('expert', None, None) rules),
    in one of two dispatch modes:
      - ``dispatch='replicated'`` (default): every rank routes the full
        token set, slices its local expert block of the dispatch tensor,
        and the combined outputs ``psum`` over the axis (Megatron f/g
        boundary operators, parallel/megatron.py, make the backward exact;
        the replicated router gets a psum-backward sync). Bit-exact == the
        unsharded module — but tokens are duplicated within the EP group.
      - ``dispatch='tokens'``: the production GShard device pattern —
        tokens AND experts both sharded over the axis; routing groups are
        the device-local token blocks, and two tiled ``all_to_all``s swap
        slot tensors token-shard-major <-> expert-shard-major, so
        activation memory, routing, and expert FLOPs all scale 1/size per
        rank. Bit-exact == the same module applied on one device to tokens
        reshaped into those per-rank groups (tested), which is a different
        (grouped) exact function than the replicated mode.
  * The load-balance auxiliary loss (Switch/GShard: E * sum_e f_e * P_e over
    the top-1 assignment fractions f and mean router probabilities P) is
    published through the module-state channel as ``aux_loss``;
    train.step.collect_aux_losses adds it to the task loss.

Routing math runs in float32 regardless of the compute policy (a bf16
softmax over near-uniform router logits is noise-dominated early in
training); expert matmuls run in the policy's compute dtype on the MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from picklebot_tpu.core import initializers as pinit
from picklebot_tpu.core.module import Ctx, Module
from picklebot_tpu.ops import activations as act
from picklebot_tpu.ops.linear import Dropout
from picklebot_tpu.parallel.megatron import tp_copy_in, tp_reduce_out
from picklebot_tpu.parallel.sequence import (sp_gather_tokens,
                                             sp_scatter_tokens,
                                             sp_sync_param)


class MoEFeedForward(Module):
    """Drop-in replacement for models.mobilevit.FeedForward: same
    (embed_dim -> hidden -> embed_dim, SiLU, no pre-norm) expert MLPs,
    ``n_experts`` of them, top-``top_k`` routed.

    ``expert_axis``: name of the mesh axis the stacked expert weights are
    sharded over. Setting it REQUIRES running inside a shard_map whose param
    specs shard w1/w2 as P(axis, None, None) (parallel.mesh MOE_EP_RULES);
    the router stays replicated. With the axis unset (or size 1) the full
    expert bank runs locally — same math, no collectives.
    """

    def __init__(self, embed_dim, hidden_dim, n_experts, top_k=2,
                 capacity_factor=1.25, dropout=0.0, expert_axis=None,
                 dispatch="replicated"):
        super().__init__()
        if not 1 <= top_k <= min(2, n_experts):
            raise ValueError(f"top_k={top_k} (n_experts={n_experts}): "
                             "top-1 and top-2 routing are supported")
        if dispatch not in ("replicated", "tokens"):
            raise ValueError(f"dispatch={dispatch!r}: 'replicated' (exact "
                             "== the unsharded module; tokens duplicated "
                             "within the EP group) or 'tokens' (all_to_all "
                             "exchange, device-local routing groups)")
        self.embed_dim = embed_dim
        self.hidden_dim = hidden_dim
        self.n_experts = n_experts
        self.top_k = top_k
        self.capacity_factor = capacity_factor
        self.expert_axis = expert_axis
        self.dispatch = dispatch
        self._w_init = pinit.normal(std=0.02)
        self.drop1 = Dropout(dropout)
        self.drop2 = Dropout(dropout)

    def param_spec(self):
        d, h, e = self.embed_dim, self.hidden_dim, self.n_experts
        return {
            "router": lambda k: self._w_init(k, (d, e)),
            "w1": lambda k: self._w_init(k, (e, d, h)),
            "w2": lambda k: self._w_init(k, (e, h, d)),
        }

    def state_spec(self):
        return {"aux_loss": lambda: np.zeros((), np.float32)}

    def capacity(self, n_tokens: int) -> int:
        """Static per-expert token slots for an n_tokens group."""
        return max(1, int(math.ceil(
            self.top_k * n_tokens * self.capacity_factor / self.n_experts)))

    def _routing(self, xt, wr, cap):
        """(g, n, d) tokens -> (dispatch, combine, frac, prob): the GShard
        one-hot dispatch/combine tensors (g, n, E, cap) plus the per-expert
        Switch statistics (assignment fraction, mean router probability) —
        callers form the aux loss from them, with mode-specific cross-rank
        averaging/scaling. Routing math runs in float32."""
        e = self.n_experts
        logits = jnp.einsum("gnd,de->gne", xt.astype(jnp.float32),
                            wr.astype(jnp.float32))
        gates = jax.nn.softmax(logits, axis=-1)
        idx1 = jnp.argmax(gates, axis=-1)
        mask1 = jax.nn.one_hot(idx1, e, dtype=jnp.float32)
        gate1 = jnp.sum(gates * mask1, axis=-1)

        # per-expert assignment fraction / mean router probability — the
        # Switch load-balance statistics (callers form the aux loss, after
        # cross-rank averaging where tokens are sharded)
        frac = jnp.mean(mask1, axis=(0, 1))
        prob = jnp.mean(gates, axis=(0, 1))

        pos1 = jnp.cumsum(mask1, axis=1) - mask1
        disp1 = mask1[..., None] * jax.nn.one_hot(
            pos1.astype(jnp.int32), cap, dtype=jnp.float32)
        if self.top_k == 2:
            idx2 = jnp.argmax(jnp.where(mask1 > 0, -jnp.inf, logits), axis=-1)
            mask2 = jax.nn.one_hot(idx2, e, dtype=jnp.float32)
            gate2 = jnp.sum(gates * mask2, axis=-1)
            # top-2 slots queue behind every top-1 assignment (GShard order)
            count1 = jnp.sum(mask1, axis=1, keepdims=True)
            pos2 = jnp.cumsum(mask2, axis=1) - mask2 + count1
            disp2 = mask2[..., None] * jax.nn.one_hot(
                pos2.astype(jnp.int32), cap, dtype=jnp.float32)
            denom = gate1 + gate2 + 1e-9
            combine = ((gate1 / denom)[..., None, None] * disp1 +
                       (gate2 / denom)[..., None, None] * disp2)
            dispatch = disp1 + disp2
        else:
            combine = gate1[..., None, None] * disp1
            dispatch = disp1
        return dispatch, combine, frac, prob

    def _experts_local(self, cx: Ctx, xin, w1, w2):
        """(E_local, g, cap, d) slot inputs -> slot outputs via each local
        expert's SiLU MLP (compute dtype on the MXU)."""
        h = act.silu(jnp.einsum("egcd,edh->egch", xin, w1))
        h = cx(self.drop1, h)
        return jnp.einsum("egch,ehd->egcd", h, w2)

    def forward(self, cx: Ctx, x):
        axis = self.expert_axis
        size = jax.lax.axis_size(axis) if axis is not None else 1
        ep = size > 1
        *lead, n, d = x.shape
        if ep and self.dispatch == "tokens":
            if n % size == 0:
                return self._forward_token_sharded(cx, x, axis, size)
            import warnings
            warnings.warn(
                f"moe_dispatch='tokens' requested but {n} tokens do not "
                f"divide the {size}-way '{axis}' axis: falling back to "
                "replicated dispatch (exact, but per-rank activation/"
                "routing cost does not scale 1/EP)", stacklevel=2)

        if ep:
            x = tp_copy_in(x, axis)
        w1 = cx.param("w1")
        w2 = cx.param("w2")
        wr = cx.param("router")
        if ep:
            wr = sp_sync_param(jnp.asarray(wr), axis)
        cdt = cx.policy.compute_dtype
        g = math.prod(lead) if lead else 1
        xt = x.reshape(g, n, d)
        cap = self.capacity(n)

        dispatch, combine, frac, prob = self._routing(xt, wr, cap)
        aux = self.n_experts * jnp.sum(frac * prob)  # Switch eq. 4
        if ep:
            # every EP rank computes the identical full aux gradient, and the
            # boundary operators psum region cotangents across ranks — scale
            # the differentiable part by 1/size so the psum restores the true
            # gradient; the published value stays exact
            aux = aux / size + jax.lax.stop_gradient(aux * (1 - 1.0 / size))
        cx.put_state("aux_loss", aux)

        # ---- expert computation (compute dtype, local expert block) --------
        e_local = w1.shape[0]
        if ep:
            start = jax.lax.axis_index(axis) * e_local
            dispatch = jax.lax.dynamic_slice_in_dim(dispatch, start, e_local,
                                                    axis=2)
            combine = jax.lax.dynamic_slice_in_dim(combine, start, e_local,
                                                   axis=2)
        xin = jnp.einsum("gnec,gnd->egcd", dispatch.astype(cdt),
                         xt.astype(cdt))
        yo = self._experts_local(cx, xin, w1.astype(cdt), w2.astype(cdt))
        out = jnp.einsum("gnec,egcd->gnd", combine.astype(cdt), yo)
        if ep:
            out = tp_reduce_out(out, axis)
        out = cx(self.drop2, out)
        return out.reshape(*lead, n, d).astype(x.dtype)

    def _forward_token_sharded(self, cx: Ctx, x, axis, size):
        """dispatch='tokens': the production EP pattern — tokens AND experts
        both sharded over ``axis``; two tiled all_to_alls swap slot tensors
        from token-shard-major to expert-shard-major and back, so activation
        memory, routing, and expert FLOPs all scale 1/size per rank (the
        replicated mode recomputes routing everywhere and psums the output).

        Semantics: routing groups are the LOCAL token blocks (GShard's
        device-local groups) — each (lead..., n/size) block routes with its
        own capacity ceil(k * n/size * cf / E). This is a *different exact
        function* than the replicated dispatch (which routes over all n
        tokens per group); the single-device equivalent is the same module
        applied to x reshaped to (lead..., size, n/size, d) — parity-tested
        against exactly that in tests/test_moe.py."""
        w1 = cx.param("w1")
        w2 = cx.param("w2")
        wr = sp_sync_param(jnp.asarray(cx.param("router")), axis)
        cdt = cx.policy.compute_dtype
        if cx.rng is not None:
            # per-rank dropout masks over local slots (same divergence class
            # as DP's per-replica and SP's per-rank fold_in)
            cx.rng = jax.random.fold_in(cx.rng, jax.lax.axis_index(axis))

        xs = sp_scatter_tokens(x, axis)           # (lead..., n/size, d)
        *lead, n_loc, d = xs.shape
        g = math.prod(lead) if lead else 1
        xt = xs.reshape(g, n_loc, d)
        cap = self.capacity(n_loc)

        dispatch, combine, frac, prob = self._routing(xt, wr, cap)
        # aux from the GLOBAL statistics (pmean of the per-rank frac/prob
        # means over equal-size token blocks == the all-token means). The
        # pmean is taken under stop_gradient — inside shard_map, psum's AD
        # transpose passes cotangents through UNSCALED per rank, so a
        # differentiable pmean would overcount the aux gradient by the axis
        # size after the router's psum-bwd sync (measured, rel 0.43). The
        # gradient instead flows through an explicitly 1/size-scaled local
        # term: sum_r (E/size)*frac_g*dprob_r == E*frac_g*dprob_global,
        # the exact gradient of the single-device grouped reference (frac
        # itself is one-hot-of-argmax, gradient-free there too).
        frac_g = jax.lax.stop_gradient(jax.lax.pmean(frac, axis))
        prob_g = jax.lax.stop_gradient(jax.lax.pmean(prob, axis))
        e = self.n_experts
        aux = (jax.lax.stop_gradient(e * jnp.sum(frac_g * prob_g))
               + (e / size) * jnp.sum(
                   frac_g * (prob - jax.lax.stop_gradient(prob))))
        cx.put_state("aux_loss", aux)

        # ---- exchange: token-shard-major -> expert-shard-major -------------
        cdt_disp = dispatch.astype(cdt)
        xin = jnp.einsum("gnec,gnd->egcd", cdt_disp, xt.astype(cdt))
        # (E, g, cap, d) -> (E/size, size*g, cap, d): rank r keeps its
        # expert block and receives every rank's slots for those experts
        xin = jax.lax.all_to_all(xin, axis, split_axis=0, concat_axis=1,
                                 tiled=True)
        yo = self._experts_local(cx, xin, w1.astype(cdt), w2.astype(cdt))
        # inverse exchange: slot outputs return to their token-owner ranks
        yo = jax.lax.all_to_all(yo, axis, split_axis=1, concat_axis=0,
                                tiled=True)
        out = jnp.einsum("gnec,egcd->gnd", combine.astype(cdt), yo)
        out = cx(self.drop2, out)
        out = out.reshape(*lead, n_loc, d)
        return sp_gather_tokens(out, axis).astype(x.dtype)
