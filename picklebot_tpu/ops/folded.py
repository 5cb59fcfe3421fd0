"""Folded early-stage execution: lane-packing rewrite of stem + early blocks.

Why this exists (measured on v5e, MobileNetLarge3D bs=16 T=32 224^2):
the 79 ms train step is ~85% stem + block2, where activations carry 16-24
channels on the 128-lane minor dim and every conv pays for padded tiles.
Marginal-cost probes (scripts/profile_early.py lineage) show the same math
in a lane-dense layout is 3-20x faster: 1x1 conv 2.5 -> 0.74 ms, depthwise
2.2 -> 0.1 ms, stem 16.4 -> ~5 ms.

Two exact rewrites compose here:

1. **Channel folding** (space-to-depth generalized to in/out folds): pick a
   per-dim input fold G and output fold F with G = stride * F; the conv
   becomes a stride-1 conv over G-blocks whose kernel taps are re-indexed
   into (block, phase) pairs. Parameters are untouched — a static gather
   map scatters the canonical weights (zeros elsewhere) into the folded
   kernel at trace time, so autodiff routes cotangents back to the
   canonical slots exactly (gather -> segment-sum).

2. **Linear collapse**: reference Bottleneck3D applies NO norm or
   nonlinearity between expand (1x1) -> depthwise (1,k,k) -> project (1x1)
   (mobilenet.py:47-96 — BN+act come after projection only), so the three
   convs are one linear map: w[kh,kw,ci,co] = sum_e w1[ci,e] wdw[kh,kw,e]
   w2[e,co], combined per step in f32 (einsum over E, microseconds). One
   dense folded conv replaces three padded ones.

Both rewrites preserve the reference quirks bit-for-bit in exact
arithmetic: the temporal stride/pad-with-kernel-1 inflation rides the
combined conv's T geometry, and there is no residual to re-plumb.

BatchNorm reuses the standard module on a (..., F, C) reshape (its stats
reduce over every axis but the last — the element set per channel is
unchanged). ChannelDropout draws its (B,1,..,1,C) mask with the SAME
path-scoped rng as the plain path and tiles it across phases, so train-mode
masks are bit-identical.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class FoldedConv(NamedTuple):
    """A folded conv: run lax.conv with these dims on folded tensors, with
    the kernel gathered from the canonical flat weights via ``idx``."""
    kernel: Tuple[int, ...]      # folded kernel dims
    strides: Tuple[int, ...]     # folded window strides
    pads: Tuple[Tuple[int, int], ...]
    idx: np.ndarray              # int32 (kernel..., G_all*cin, F_all*cout);
    #                              0 = structural zero, i+1 = flat weight i
    folds_in: Tuple[int, ...]
    folds_out: Tuple[int, ...]
    cin: int
    cout: int


def _dim_taps(G: int, F: int, s: int, k: int, p: int):
    """Per-dim tap table. Returns (K, pad, entries) where entries is a list
    of (phi_out, j_tap, q_in, d_orig)."""
    if G == 1 and F == 1:
        return k, (p, p), [(0, d, 0, d) for d in range(k)], s
    assert G == s * F, f"in-fold {G} must equal stride {s} x out-fold {F}"
    raw = []
    for phi in range(F):
        for d in range(k):
            o = s * phi + d - p
            jhat = o // G
            q = o - jhat * G
            raw.append((phi, jhat, q, d))
    jmin = min(e[1] for e in raw)
    jmax = max(e[1] for e in raw)
    K = jmax - jmin + 1
    entries = [(phi, jhat - jmin, q, d) for (phi, jhat, q, d) in raw]
    return K, (-jmin, jmax), entries, 1


def folded_conv_map(kernel: Sequence[int], stride: Sequence[int],
                    padding: Sequence[int], folds_in: Sequence[int],
                    folds_out: Sequence[int], cin: int,
                    cout: int) -> FoldedConv:
    """Build the static gather map for a folded N-D conv.

    Canonical weight layout: (kernel..., cin, cout) — exactly _ConvNd's
    THWIO (groups=1) or the collapsed bottleneck weight. Folded input
    channels are ordered (q_dim0, q_dim1, ..., ci); folded output channels
    (phi_dim0, phi_dim1, ..., co) — block-major fold (fold_nd below).

    Geometry preconditions (fail loudly instead of producing wrong shapes):
    dilation-1 convs only (there is no dilation parameter by design), and
    every folded dim must satisfy the 'same'-conv output-size identity
    out = N/stride, i.e. 0 <= 2p - k + s < s — the tap re-indexing in
    _dim_taps tiles output blocks exactly under that relation.
    """
    rank = len(kernel)
    for i in range(rank):
        if folds_in[i] > 1 or folds_out[i] > 1:
            k, s, p = kernel[i], stride[i], padding[i]
            if not (0 <= 2 * p - k + s < s):
                raise ValueError(
                    f"folded dim {i}: kernel={k} stride={s} pad={p} violates "
                    f"the out=N/stride identity (need 0 <= 2p-k+s < s); "
                    f"this fold plan would produce wrong shapes")
    per_dim = [_dim_taps(folds_in[i], folds_out[i], stride[i], kernel[i],
                         padding[i]) for i in range(rank)]
    kdims = tuple(pd[0] for pd in per_dim)
    pads = tuple(pd[1] for pd in per_dim)
    strides = tuple(pd[3] for pd in per_dim)
    Gs = [folds_in[i] for i in range(rank)]
    Fs = [folds_out[i] for i in range(rank)]
    G_all = math.prod(Gs)
    F_all = math.prod(Fs)
    idx = np.zeros(kdims + (G_all * cin, F_all * cout), np.int32)
    ci = np.arange(cin)[:, None]
    co = np.arange(cout)[None, :]

    def rec(dim, js, qs, ds, phis):
        if dim == rank:
            # flat canonical index (d..., ci, co)
            flat = 0
            for i in range(rank):
                flat = flat * kernel[i] + ds[i]
            q_flat = 0
            phi_flat = 0
            for i in range(rank):
                q_flat = q_flat * Gs[i] + qs[i]
                phi_flat = phi_flat * Fs[i] + phis[i]
            idx[tuple(js)][q_flat * cin + ci, phi_flat * cout + co] = \
                (flat * cin + ci) * cout + co + 1
            return
        for (phi, j, q, d) in per_dim[dim][2]:
            rec(dim + 1, js + [j], qs + [q], ds + [d], phis + [phi])

    rec(0, [], [], [], [])
    return FoldedConv(kdims, strides, pads, idx, tuple(Gs), tuple(Fs),
                      cin, cout)


class BoundaryFold(NamedTuple):
    """Zero-inflation folded execution for inverted bottlenecks whose
    EXPANDED channels are lane-wide enough to run canonically (E >~ 64):
    only the narrow input/output tensors live W-folded. The expand 1x1 is a
    per-phase matmul on the folded input; its output reshapes to the
    canonical spatial layout (pure reshape in W-major), depthwise + SE +
    the projection run as the STANDARD modules/ops, and the projection
    output refolds (pure reshape). No dense gather kernel, no structural
    zeros — unlike the full collapse (FoldedConv), compute is exactly
    canonical; only the narrow tensors' 128-lane padding is eliminated."""
    f_in: int    # W fold of the incoming tensor
    f_out: int   # W fold of the outgoing tensor (f_in // stride_w)
    cin: int
    cout: int


def gather_weights(fc: FoldedConv, w_flat):
    """Scatter canonical weights into the folded dense kernel (trace-time;
    differentiable — the VJP is a segment-sum back into canonical slots)."""
    z = jnp.zeros((1,), w_flat.dtype)
    return jnp.concatenate([z, w_flat.ravel()])[jnp.asarray(fc.idx)]


def fold_nd(x, folds: Sequence[int]):
    """(B, d0, d1, ..., C) -> block-major fold: each dim di with fold Gi>1
    splits into (di/Gi, Gi) and the phase axes merge (in dim order) into the
    channel minor: (B, d0/G0, ..., G0*G1*...*C)."""
    rank = len(folds)
    shape = [x.shape[0]]
    for i in range(rank):
        n = x.shape[1 + i]
        if folds[i] > 1:
            if n % folds[i]:
                raise ValueError(
                    f"fold {folds[i]} needs dim {i} divisible, got {n}")
            shape += [n // folds[i], folds[i]]
        else:
            shape += [n]
    shape += [x.shape[-1]]
    z = x.reshape(shape)
    perm, phases = [0], []
    j = 1
    for i in range(rank):
        perm.append(j)
        j += 1
        if folds[i] > 1:
            phases.append(j)
            j += 1
    z = z.transpose(perm + phases + [j])
    return z.reshape(z.shape[:1 + rank] + (-1,))


def unfold_nd(x, folds: Sequence[int], channels: int):
    """Inverse of fold_nd."""
    rank = len(folds)
    fold_dims = [f for f in folds if f > 1]
    z = x.reshape(x.shape[:1 + rank] + tuple(fold_dims) + (channels,))
    # interleave phase axes back after their block dims
    perm = [0]
    pj = 1 + rank
    for i in range(rank):
        perm.append(1 + i)
        if folds[i] > 1:
            perm.append(pj)
            pj += 1
    perm.append(z.ndim - 1)
    z = z.transpose(perm)
    shape = [z.shape[0]]
    j = 1
    for i in range(rank):
        if folds[i] > 1:
            shape.append(z.shape[j] * z.shape[j + 1])
            j += 2
        else:
            shape.append(z.shape[j])
            j += 1
    shape.append(channels)
    return z.reshape(shape)
