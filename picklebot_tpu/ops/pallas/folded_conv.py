"""Pallas kernel for stride-1 dense folded convs (ops/folded.py plans).

Why: the folded early stages' convs are where MoViNetA2's train step lives
(block2 = 54% of 69 ms, docs/BENCH.md round 3), and XLA runs them 7-27x
above both the MXU and HBM rooflines at these geometries — e.g. b2_1, a
vanilla stride-1 (3,3,3) 64->160 conv over (8,32,56,14,64), takes 3.94 ms
against a 0.56 ms MXU floor, and every XLA-level reformulation probed
(T-split, Wb-major layout, 2D lowering, im2col, slice+dot —
scripts/probe_movinet_block2*.py, probe_stem2.py) plateaus at ~4 ms.

The trick: view the activation as (B, T, H*Wb, Ci) — a PURE reshape of the
folded layout (B, T, H, Wb, Ci) — so that BOTH remaining spatial taps
become sublane (row) offsets:

    out[r] += x[r + (dh - ph)*Wb + (dw - pw)] @ W[dt, dh, dw]

Each (b, t_out) grid block stages its Kt input frames once into a
zero-padded VMEM slab per W-tap (the wb-edge mask and the H pad rows are
baked into the slab), after which every one of the Kt*Kh*Kw taps is a
STATIC stride-1 slice feeding one MXU matmul — no strided slices, no
transposes, no relayouts (the Mosaic limits that sank earlier kernel
attempts, CLAUDE.md). Temporal taps ride Kt copies of the input ref with
shifted frame index maps, clamped and masked at clip edges.

Scope (checked by folded_conv_s1_eligible): stride 1 on every dim,
symmetric 'same' padding, so output dims == input dims — what every
stride-1 ops/folded.py plan satisfies. Backward: dx is THIS kernel with
flipped taps and Ci<->Co transposed weights (the transpose of a
same-padded stride-1 conv); dw falls back to XLA's conv VJP (measured
small: ~0.4-1.2 ms vs 3-5 ms for the conv pair).

Benchmark verdict (v5e, bf16, in-graph loop — scripts/probe_folded_conv.py,
2026-08, round 3): correct everywhere (after the f32-slab workaround for
Mosaic's bf16 odd-offset sublane-slice misread, see CLAUDE.md) but does
NOT beat XLA at the target shapes: b2_1 fwd 4.37 ms vs XLA 3.74; b2_2
4.5-6.3 vs 4.11; (1,3,3)@112² 6.5 vs 5.1. Iterations tried: K-packing
adjacent dw taps to fill the 128-lane contraction, staging all slabs
before the matmul stream, split accumulators to break the add chain —
each moved single-digit percents. Both this kernel and XLA sit ~7x above
the MXU floor; without a readable on-chip profile (the remote-TPU tunnel
exposes none) the residual per-block cost can't be attributed further.
Kept as an opt-in, tested backend (the shapes are right for it on other
toolchain versions), NOT wired as a default path. Reference capability
context: cuDNN's conv kernels (SURVEY §2.2). Off-TPU the kernel runs in
interpret mode so CPU tests exercise the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, kt: int, kh: int, kw: int, wb: int, r: int,
            pt0: int, t_in: int, co: int):
    x_refs = refs[:kt]
    w_ref = refs[kt]
    o_ref = refs[kt + 1]
    slab = refs[kt + 2]        # (kt, kw, r + (kh-1)*wb + (kw-1), ci) VMEM

    t = pl.program_id(1)
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    pad_top = ph * wb + pw
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    wbi = rows % wb

    ci = x_refs[0].shape[-1]
    # ---- stage phase: every (dt, dw) slab written before any matmul, so
    # the MXU stream below runs uninterrupted by VPU staging.
    # NB slabs are f32: bf16 sublane slices at the odd row offsets the
    # taps need (dh*wb + dw) silently misread on Mosaic (measured: bf16
    # slab -> 0.19 abs error at the b2_1 shape while f32 is exact at
    # 4e-7); operands are cast back to the compute dtype after slicing so
    # the MXU still runs bf16.
    for dt in range(kt):
        fr = x_refs[dt][0, 0]                        # (r, ci)
        tv = t + (dt - pt0)                          # clip-edge taps -> 0
        fr = jnp.where(jnp.logical_and(tv >= 0, tv < t_in),
                       fr, 0).astype(jnp.float32)
        for dw in range(kw):
            # wb-edge mask: an input row at wb' feeds out wb = wb' - (dw -
            # pw); zero rows whose target falls outside [0, wb) so taps
            # never wrap through the merged (h, wb) rows
            if dw == pw:
                masked = fr
            else:
                wmask = jnp.logical_and(wbi - (dw - pw) >= 0,
                                        wbi - (dw - pw) < wb)
                masked = jnp.where(wmask, fr, 0)
            slab[dt, dw, :pad_top] = jnp.zeros((pad_top, ci), jnp.float32)
            slab[dt, dw, pad_top:pad_top + r] = masked
            slab[dt, dw, pad_top + r:] = jnp.zeros(
                (slab.shape[2] - pad_top - r, ci), jnp.float32)

    # ---- matmul phase: independent partial accumulators break the
    # single-accumulator dependency chain so matmuls can overlap
    cdt = w_ref.dtype
    n_acc = 2
    accs = [jnp.zeros((r, co), jnp.float32) for _ in range(n_acc)]
    mm = 0
    for dt in range(kt):
        for dh in range(kh):
            # K-pack adjacent dw taps so the contraction fills the 128
            # lanes (Ci=64 alone wastes half the MXU's K dim): two slab
            # slices lane-concatenate into one (r, 2*ci) operand against
            # the matching stacked weights
            dw = 0
            while dw < kw:
                start = dh * wb + dw
                if ci <= 64 and dw + 1 < kw:
                    contrib = jnp.concatenate(
                        [slab[dt, dw, start:start + r],
                         slab[dt, dw + 1, start + 1:start + 1 + r]],
                        axis=1).astype(cdt)
                    w_tap = jnp.concatenate(
                        [w_ref[dt, dh, dw], w_ref[dt, dh, dw + 1]], axis=0)
                    dw += 2
                else:
                    contrib = slab[dt, dw, start:start + r].astype(cdt)
                    w_tap = w_ref[dt, dh, dw]
                    dw += 1
                accs[mm % n_acc] = accs[mm % n_acc] + jax.lax.dot_general(
                    contrib, w_tap, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                mm += 1
    acc = accs[0]
    for a in accs[1:]:
        acc = acc + a
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def _fwd_only(x5, w, pads, wb):
    b, t_in, h, wb_, ci = x5.shape
    assert wb_ == wb, (wb_, wb)
    kt, kh, kw, wci, co = w.shape
    assert wci == ci, (wci, ci)
    (pt0, _), _, _ = pads
    interpret = jax.default_backend() != "tpu"
    r = h * wb
    x4 = x5.reshape(b, t_in, r, ci)

    in_specs = []
    for dt in range(kt):
        def imap(bi, ti, dt=dt):
            f = ti + (dt - pt0)
            return (bi, jnp.maximum(0, jnp.minimum(f, t_in - 1)), 0, 0)
        in_specs.append(pl.BlockSpec((1, 1, r, ci), imap))
    in_specs.append(pl.BlockSpec(w.shape, lambda bi, ti: (0,) * 5))

    slab_rows = r + (kh - 1) * wb + (kw - 1)
    out = pl.pallas_call(
        functools.partial(_kernel, kt=kt, kh=kh, kw=kw, wb=wb, r=r,
                          pt0=pt0, t_in=t_in, co=co),
        grid=(b, t_in),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, r, co), lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_in, r, co), x5.dtype),
        scratch_shapes=[pltpu.VMEM((kt, kw, slab_rows, ci), jnp.float32)],
        interpret=interpret,
    )(*([x4] * kt), w)
    return out.reshape(b, t_in, h, wb, co)


def _ref_conv(x5, w, pads):
    from jax import lax
    dn = lax.conv_dimension_numbers(
        (1, 1, 1, 1, x5.shape[-1]), w.shape, ("NTHWC", "THWIO", "NTHWC"))
    return lax.conv_general_dilated(
        x5, w, (1, 1, 1), list(pads), dimension_numbers=dn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _folded_conv_s1(x5, w, pads, wb):
    return _fwd_only(x5, w, pads, wb)


def _s1_fwd(x5, w, pads, wb):
    return _fwd_only(x5, w, pads, wb), (x5, w)


def _s1_bwd(pads, wb, res, g):
    x5, w = res
    # dx: the transpose of a same-padded stride-1 conv is the same conv
    # with flipped taps and Ci<->Co swapped weights
    w_flip = jnp.swapaxes(w[::-1, ::-1, ::-1], -1, -2)
    flip_pads = tuple((k - 1 - p1, k - 1 - p0)
                      for (p0, p1), k in zip(pads, w.shape[:3]))
    dx = _fwd_only(g, w_flip, flip_pads, wb)
    # dw: XLA's conv VJP (tall-skinny contraction over batch; measured
    # cheap relative to the conv pair)
    _, vjp = jax.vjp(lambda wv: _ref_conv(x5, wv, pads), w)
    dw, = vjp(g)
    return dx, dw


_folded_conv_s1.defvjp(_s1_fwd, _s1_bwd)


def folded_conv_s1_eligible(x5_shape, wshape, strides, pads) -> bool:
    """Stride-1 everywhere, symmetric same-padding (dims preserved), and
    channel counts worth the MXU."""
    if tuple(strides) != (1, 1, 1):
        return False
    kt, kh, kw = wshape[:3]
    (pt0, pt1), (ph0, ph1), (pw0, pw1) = pads
    if (pt0, pt1) != ((kt - 1) // 2, (kt - 1) // 2) and kt > 1:
        return False
    if kt == 1 and (pt0, pt1) != (0, 0):
        return False
    if (ph0, ph1) != ((kh - 1) // 2, (kh - 1) // 2):
        return False
    if (pw0, pw1) != ((kw - 1) // 2, (kw - 1) // 2):
        return False
    return x5_shape[-1] >= 32 and wshape[-1] >= 32


def folded_conv_s1(x5, w, pads, wb: int):
    """Stride-1 dense folded conv, (B, T, H, Wb, Ci) -> (B, T, H, Wb, Co).

    w: (Kt, Kh, Kw, Ci, Co); pads must be the symmetric same-conv pads
    (use folded_conv_s1_eligible first). Differentiable: dx through the
    same kernel, dw through XLA's conv VJP.
    """
    return _folded_conv_s1(x5, w, tuple(map(tuple, pads)), wb)
