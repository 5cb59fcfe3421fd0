"""Dense, dropout, pooling, and LSTM layers.

Dropout3d/2d in the reference (mobilenet.py:82, movinet.py:67) zero entire
*channels* per sample — reproduced here as ChannelDropout with channels-last
masks. The LSTM matches torch.nn.LSTM (multi-layer, batch_first) so the
2D+LSTM MobileNets (reference mobilenet.py:285-456) convert weight-for-weight;
the frame loop the reference does in Python (mobilenet.py:355-366) is replaced
by a single batched CNN pass + ``lax.scan`` over time.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from picklebot_tpu.core import initializers as pinit
from picklebot_tpu.core.module import Ctx, Module


class Dense(Module):
    """torch nn.Linear. Weight stored (in, out)."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 w_init=None, b_init=None):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.w_init = w_init or pinit.kaiming_uniform()
        self.b_init = b_init or pinit.torch_default_bias(in_features)

    def param_spec(self):
        spec = {"w": lambda k: self.w_init(
            k, (self.in_features, self.out_features))}
        if self.use_bias:
            spec["b"] = lambda k: self.b_init(k, (self.out_features,))
        return spec

    def forward(self, cx: Ctx, x):
        w = cx.param("w").astype(cx.policy.compute_dtype)
        x = x.astype(cx.policy.compute_dtype)
        out = jnp.dot(x, w)
        if self.use_bias:
            out = out + cx.param("b").astype(cx.policy.compute_dtype)
        return out


class Dropout(Module):
    """Elementwise dropout (train-only), inverted scaling like torch."""

    def __init__(self, p: float = 0.5):
        super().__init__()
        self.p = p

    def forward(self, cx: Ctx, x):
        if not cx.train or self.p == 0.0:
            return x
        keep = 1.0 - self.p
        mask = jax.random.bernoulli(cx.next_rng(), keep, x.shape)
        return jnp.where(mask, x / keep, 0).astype(x.dtype)


class ChannelDropout(Module):
    """torch nn.Dropout2d/3d: zeroes whole channels per sample.

    For channels-last (B, *spatial, C) the mask is (B, 1, ..., 1, C)."""

    def __init__(self, p: float = 0.5):
        super().__init__()
        self.p = p

    def forward(self, cx: Ctx, x, fold: int = 1):
        """``fold``>1: x's minor dim is (fold phases, C) from the folded
        early stage (ops/folded.py); the mask is drawn at the canonical C
        with the same path-scoped rng as the plain layout (bit-identical
        masks) and tiled across phases — still whole-channel dropout."""
        if not cx.train or self.p == 0.0:
            return x
        keep = 1.0 - self.p
        c = x.shape[-1] // fold
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        mask = jax.random.bernoulli(cx.next_rng(), keep, mask_shape)
        if fold > 1:
            mask = jnp.tile(mask, (1,) * (x.ndim - 1) + (fold,))
        return jnp.where(mask, x / keep, 0).astype(x.dtype)


class GlobalAvgPool(Module):
    """AdaptiveAvgPool*d((1,...)) + flatten: mean over all spatial axes.

    Replaces reference nn.AdaptiveAvgPool3d(1) uses (mobilenet.py:186 etc.).
    Computed in float32 — large spatial reductions lose precision in bf16.
    """

    def __init__(self, keepdims: bool = False):
        super().__init__()
        self.keepdims = keepdims

    def forward(self, cx: Ctx, x):
        axes = tuple(range(1, x.ndim - 1))
        return jnp.mean(x.astype(jnp.float32), axis=axes,
                        keepdims=self.keepdims).astype(x.dtype)


class AvgPool2d(Module):
    """torch nn.AvgPool2d over (B, H, W, C)."""

    def __init__(self, kernel_size: int, stride: Optional[int] = None):
        super().__init__()
        self.k = kernel_size
        self.s = stride if stride is not None else kernel_size

    def forward(self, cx: Ctx, x):
        xf = x.astype(jnp.float32)
        out = jax.lax.reduce_window(
            xf, 0.0, jax.lax.add,
            window_dimensions=(1, self.k, self.k, 1),
            window_strides=(1, self.s, self.s, 1),
            padding="VALID") / (self.k * self.k)
        return out.astype(x.dtype)


class LSTM(Module):
    """Multi-layer unidirectional LSTM matching torch.nn.LSTM(batch_first).

    Weights per layer l: w_ih (in, 4H), w_hh (H, 4H), b_ih (4H), b_hh (4H)
    with torch's gate order (input, forget, cell, output). Time dimension is
    scanned with ``lax.scan`` — compiler-friendly, no Python loop over frames.
    """

    def __init__(self, input_size: int, hidden_size: int,
                 num_layers: int = 1):
        super().__init__()
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers

    def param_spec(self):
        h = self.hidden_size
        bound = 1.0 / math.sqrt(h)
        u = pinit.uniform(-bound, bound)
        spec = {}
        for l in range(self.num_layers):
            in_dim = self.input_size if l == 0 else h
            spec[f"w_ih_l{l}"] = (lambda d: lambda k: u(k, (d, 4 * h)))(in_dim)
            spec[f"w_hh_l{l}"] = lambda k: u(k, (h, 4 * h))
            spec[f"b_ih_l{l}"] = lambda k: u(k, (4 * h,))
            spec[f"b_hh_l{l}"] = lambda k: u(k, (4 * h,))
        return spec

    def forward(self, cx: Ctx, x,
                initial: Optional[Tuple[jax.Array, jax.Array]] = None,
                return_state: bool = False):
        """x: (B, T, input_size) -> (B, T, H) outputs of the last layer.

        ``initial``: optional per-layer (h, c), each (num_layers, B, H) —
        torch.nn.LSTM's (h_0, c_0). With ``return_state`` the final
        (h_T, c_T) stack is returned alongside the sequence, enabling
        chunked/streaming evaluation (carry the state between chunks).
        """
        b = x.shape[0]
        h_dim = self.hidden_size
        dtype = cx.policy.compute_dtype
        seq = x.astype(dtype)
        h_finals, c_finals = [], []
        for l in range(self.num_layers):
            w_ih = cx.param(f"w_ih_l{l}").astype(dtype)
            w_hh = cx.param(f"w_hh_l{l}").astype(dtype)
            bias = (cx.param(f"b_ih_l{l}") +
                    cx.param(f"b_hh_l{l}")).astype(dtype)
            if initial is None:
                h0 = jnp.zeros((b, h_dim), dtype)
                c0 = jnp.zeros((b, h_dim), dtype)
            else:
                h0, c0 = initial[0][l].astype(dtype), initial[1][l].astype(dtype)

            # Precompute input projections for all steps as one big matmul
            # (MXU-friendly), then scan only the recurrence.
            x_proj = jnp.dot(seq, w_ih) + bias

            def step(carry, xp):
                h, c = carry
                gates = xp + jnp.dot(h, w_hh)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
                return (h_new, c_new), h_new

            (h_fin, c_fin), outs = jax.lax.scan(step, (h0, c0),
                                                jnp.swapaxes(x_proj, 0, 1))
            seq = jnp.swapaxes(outs, 0, 1)
            if return_state:
                h_finals.append(h_fin)
                c_finals.append(c_fin)
        if return_state:
            return seq, (jnp.stack(h_finals), jnp.stack(c_finals))
        return seq
