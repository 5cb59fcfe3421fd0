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
    mesh 'expert' axis (parallel/mesh.py P('expert', None, None) rules).
    Each rank computes the dispatch tensor for the full expert set (router
    is replicated), slices its local expert block, runs only its experts,
    and the combined outputs ``psum`` over the axis. The Megatron f/g
    boundary operators (parallel/megatron.py) make the backward exact:
    the region input's cotangent psums across expert ranks, the replicated
    router weight gets a psum-backward sync (parallel/sequence.sp_sync_param
    pattern), and the per-rank expert-weight grads stay local, matching
    their sharding. Tokens are replicated within one EP group, so the only
    communication is a single output psum riding ICI.
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
from picklebot_tpu.parallel.sequence import sp_sync_param


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
                 capacity_factor=1.25, dropout=0.0, expert_axis=None):
        super().__init__()
        if not 1 <= top_k <= min(2, n_experts):
            raise ValueError(f"top_k={top_k} (n_experts={n_experts}): "
                             "top-1 and top-2 routing are supported")
        self.embed_dim = embed_dim
        self.hidden_dim = hidden_dim
        self.n_experts = n_experts
        self.top_k = top_k
        self.capacity_factor = capacity_factor
        self.expert_axis = expert_axis
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

    def forward(self, cx: Ctx, x):
        axis = self.expert_axis
        ep = axis is not None and jax.lax.axis_size(axis) > 1
        if ep:
            x = tp_copy_in(x, axis)
        w1 = cx.param("w1")
        w2 = cx.param("w2")
        wr = cx.param("router")
        if ep:
            wr = sp_sync_param(jnp.asarray(wr), axis)
        cdt = cx.policy.compute_dtype
        *lead, n, d = x.shape
        g = math.prod(lead) if lead else 1
        xt = x.reshape(g, n, d)
        e = self.n_experts
        cap = self.capacity(n)

        # ---- routing (f32) -------------------------------------------------
        logits = jnp.einsum("gnd,de->gne", xt.astype(jnp.float32),
                            wr.astype(jnp.float32))
        gates = jax.nn.softmax(logits, axis=-1)
        idx1 = jnp.argmax(gates, axis=-1)
        mask1 = jax.nn.one_hot(idx1, e, dtype=jnp.float32)
        gate1 = jnp.sum(gates * mask1, axis=-1)

        # load-balance aux loss from the top-1 assignment (Switch eq. 4)
        frac = jnp.mean(mask1, axis=(0, 1))
        prob = jnp.mean(gates, axis=(0, 1))
        aux = e * jnp.sum(frac * prob)
        if ep:
            # every EP rank computes the identical full aux gradient, and the
            # boundary operators psum region cotangents across ranks — scale
            # the differentiable part by 1/size so the psum restores the true
            # gradient; the published value stays exact
            size = jax.lax.axis_size(axis)
            aux = aux / size + jax.lax.stop_gradient(aux * (1 - 1.0 / size))
        cx.put_state("aux_loss", aux)

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
        h = act.silu(jnp.einsum("egcd,edh->egch", xin, w1.astype(cdt)))
        h = cx(self.drop1, h)
        yo = jnp.einsum("egch,ehd->egcd", h, w2.astype(cdt))
        out = jnp.einsum("gnec,egcd->gnd", combine.astype(cdt), yo)
        if ep:
            out = tp_reduce_out(out, axis)
        out = cx(self.drop2, out)
        return out.reshape(*lead, n, d).astype(x.dtype)
