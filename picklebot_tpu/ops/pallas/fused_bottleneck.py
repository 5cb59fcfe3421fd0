"""Fused inverted-bottleneck Pallas kernel (expand → depthwise → SE → project).

The north-star kernel (BASELINE.json): the reference's MobileNetV3 bottleneck
(mobilenet.py:47-130) is three convs whose intermediate "expanded" tensor is
up to 6x the block's input — XLA cannot fuse across convolutions, so that
tensor round-trips HBM twice per block (the dominant traffic in this
bandwidth-bound model). This kernel computes, per (frame, row-tile) grid
step, entirely in VMEM:

    pointwise expand (MXU)  →  (1, k, k) depthwise stencil (VPU)
    →  optional SE channel scale  →  pointwise project (MXU)

so the expanded activation never touches HBM.

Squeeze-excite needs a global spatial mean of the depthwise output — a
cross-tile dependency — solved with a *recompute* strategy: a first pass
computes only the per-sample pooled means (tiny output), the SE MLP runs as
plain XLA on (B, E), and the main pass recomputes expand+depthwise fused
with the scale and projection. Twice the FLOPs, zero extra HBM traffic —
the right trade on a bandwidth-bound block.

Semantics match ops/bottleneck.Bottleneck3D exactly (including the
temporal-inflation quirk — handled by temporal pre-pad/stride outside the
kernel since the depthwise temporal kernel is 1). Forward-only: the custom
VJP recomputes with the unfused XLA path, which is also the numerical
reference in tests. Off-TPU the kernel runs in interpret mode.

Benchmark verdict — RETIRED (round 3). Round-2 numbers (v5e, bf16,
bs=16, MobileNetLarge3D stride-1 blocks): 1.5-2.3x SLOWER than XLA's
unfused path (C16/E16@112² 21.6 vs 12.4 ms; C112/E672@14² 4.1 vs 2.8).
Round 3 re-asked the question in the kernel's own predicted best regime —
the BoundaryFold path's canonical lane-dense expanded tensors
(C40/E120/k5/SE @ 28², scripts/probe_fused_boundary.py): 8.6 vs XLA
7.1 ms, still a loss. The expanded tensor's HBM round-trip this kernel
eliminates is not the binding constraint anywhere in this model family,
and the SE recompute doubles FLOPs. The Bottleneck3D(fused=...) wiring is
REMOVED (round-3 VERDICT item 7); the kernel remains here as a tested,
directly-callable artifact (fused_bottleneck / apply_fused_bottleneck)
with its evidence in docs/kernel_evidence.json. Known Mosaic limits:
stride-2 slices unsupported; W<8 frames (h_out<8) crash the remote
compiler — gated in fused_bottleneck_eligible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _dw_tile(e, wd_ref, k: int, stride: int, th: int, w_out: int):
    """Depthwise k x k stencil over an expanded VMEM tile.

    e: (rows_in, w_in, E) f32; returns (th, w_out, E) f32."""
    acc = None
    for dy in range(k):
        for dx in range(k):
            sl = jax.lax.slice(
                e,
                (dy, dx, 0),
                (dy + (th - 1) * stride + 1,
                 dx + (w_out - 1) * stride + 1, e.shape[2]),
                (stride, stride, 1))
            term = sl * wd_ref[dy * k + dx]
            acc = term if acc is None else acc + term
    return acc


def _expand_dw_tile(x_ref, w1_ref, wd_ref, hi, *, k, stride, th, w_out,
                    rows_in):
    """Shared: expand (MXU) + depthwise stencil (VPU) for one row tile.
    x_ref block is the full padded frame (1, Hp, Wp, C), block-loaded once
    per frame (manual sub-frame DMA with unaligned tiny-C tiles crashes the
    Mosaic compiler; full-frame blocks are a few hundred KB)."""
    rows = x_ref[0, pl.ds(hi * th * stride, rows_in)]
    c = rows.shape[-1]
    e = jax.lax.dot_general(
        rows.reshape(-1, c), w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    e = e.reshape(rows.shape[0], rows.shape[1], -1)
    return _dw_tile(e, wd_ref, k, stride, th, w_out)


def _pool_kernel(x_ref, w1_ref, wd_ref, o_ref, *,
                 k, stride, th, w_out, rows_in, t_out):
    """Pass 1: per-sample sum of the depthwise output over (T, H, W)."""
    n = pl.program_id(0)
    hi = pl.program_id(1)
    d = _expand_dw_tile(x_ref, w1_ref, wd_ref, hi, k=k, stride=stride,
                        th=th, w_out=w_out, rows_in=rows_in)

    @pl.when(jnp.logical_and(n == 0, hi == 0))
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    row = n // t_out
    o_ref[pl.ds(row, 1), :] = (o_ref[pl.ds(row, 1), :] +
                               jnp.sum(d, axis=(0, 1), keepdims=True)[0])


def _main_kernel(x_ref, w1_ref, wd_ref, w2_ref, s_ref, o_ref, *,
                 k, stride, th, w_out, rows_in, t_out):
    """Pass 2: expand → depthwise → scale → project, one output tile."""
    n = pl.program_id(0)
    hi = pl.program_id(1)
    d = _expand_dw_tile(x_ref, w1_ref, wd_ref, hi, k=k, stride=stride,
                        th=th, w_out=w_out, rows_in=rows_in)
    # SE scale for this sample (ones when disabled); s_ref holds all B rows
    d = d * s_ref[pl.ds(n // t_out, 1), :]
    out = jax.lax.dot_general(
        d.astype(w2_ref.dtype).reshape(-1, d.shape[-1]), w2_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = out.reshape(th, w_out, -1).astype(o_ref.dtype)


def _cdiv(a, b):
    return -(-a // b)


def _fused_forward(x, w1, wd, w2, se_w1, se_b1, se_w2, se_b2, *,
                   kernel_size: int, stride: int, use_se: bool,
                   tile_h: int, interpret: bool):
    """x: (B, T, H, W, C) bf16/f32. Weights in library layout:
    w1 (1,1,1,C,E) → used as (C,E); wd (1,k,k,1,E) → (k*k,E);
    w2 (1,1,1,E,Co) → (E,Co). Returns (B, T', H', W', Co)."""
    b, t, h, w, c = x.shape
    k, s, p = kernel_size, stride, kernel_size // 2
    e_ch = w1.shape[-1]
    co = w2.shape[-1]

    # temporal quirk (reference mobilenet.py:67-75): pad T by p, stride by s
    # — the temporal kernel is 1, so this is pure frame selection.
    t_out = (t + 2 * p - 1) // s + 1
    h_out = (h + 2 * p - k) // s + 1
    w_out = (w + 2 * p - k) // s + 1

    # largest divisor of h_out <= tile_h: tiles always exact, so the SE
    # pooling pass never sums padding rows and no output slicing is needed
    th = 1
    for cand in range(min(tile_h, h_out), 0, -1):
        if h_out % cand == 0:
            th = cand
            break
    n_h = _cdiv(h_out, th)
    rows_in = (th - 1) * s + k
    # spatial pre-pad: p on each side plus bottom slack so every tile's DMA
    # is in-bounds (static size)
    h_need = (n_h * th - 1) * s + k
    pad_bottom = h_need - h - p
    xp = jnp.pad(x, ((0, 0), (p, p), (p, max(pad_bottom, p)), (p, p),
                     (0, 0)))
    xp = xp[:, ::s]                     # temporal stride (kernel 1)
    assert xp.shape[1] == t_out, (xp.shape, t_out)
    n_total = b * t_out
    xp = xp.reshape(n_total, xp.shape[2], xp.shape[3], c)

    w1m = w1.reshape(c, e_ch)
    wdm = wd.reshape(k * k, e_ch)
    w2m = w2.reshape(e_ch, co)

    grid = (n_total, n_h)
    common = dict(k=k, stride=s, th=th, w_out=w_out, rows_in=rows_in)
    hp, wp = xp.shape[1], xp.shape[2]
    x_spec = pl.BlockSpec((1, hp, wp, c), lambda n, i: (n, 0, 0, 0))

    if use_se:
        pooled = pl.pallas_call(  # exact tiles: sums are exact (see th)
            functools.partial(_pool_kernel, t_out=t_out, **common),
            grid=grid,
            in_specs=[
                x_spec,
                pl.BlockSpec((c, e_ch), lambda n, i: (0, 0)),
                pl.BlockSpec((k * k, e_ch), lambda n, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((b, e_ch), lambda n, i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, e_ch), jnp.float32),
            interpret=interpret,
        )(xp, w1m, wdm)
        mean = pooled / jnp.asarray(t_out * h_out * w_out, jnp.float32)
        from picklebot_tpu.ops.activations import hardsigmoid, relu
        dt = x.dtype
        scale = relu(jnp.dot(mean.astype(dt), se_w1.astype(dt)) +
                     se_b1.astype(dt))
        scale = hardsigmoid(jnp.dot(scale, se_w2.astype(dt)) +
                            se_b2.astype(dt))                  # (B, E)
        scale = scale.astype(jnp.float32)
    else:
        scale = jnp.ones((b, e_ch), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_main_kernel, t_out=t_out, **common),
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((c, e_ch), lambda n, i: (0, 0)),
            pl.BlockSpec((k * k, e_ch), lambda n, i: (0, 0)),
            pl.BlockSpec((e_ch, co), lambda n, i: (0, 0)),
            pl.BlockSpec((b, e_ch), lambda n, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w_out, co), lambda n, i: (n, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_total, n_h * th, w_out, co),
                                       x.dtype),
        interpret=interpret,
    )(xp, w1m, wdm, w2m, scale)
    out = out[:, :h_out]
    return out.reshape(b, t_out, h_out, w_out, co)


def fused_bottleneck_eligible(h: int, w: int, kernel_size: int, stride: int,
                              use_se: bool) -> bool:
    """Static check: shapes the compiled TPU kernel supports. Mosaic's
    vector slices only allow unit strides, so stride-2 blocks stay on the
    XLA path (10 of MobileNetLarge3D's 15 bottlenecks are stride 1); frames
    narrower than 8 rows/cols crash the remote compiler."""
    p = kernel_size // 2
    h_out = (h + 2 * p - kernel_size) // stride + 1
    w_out = (w + 2 * p - kernel_size) // stride + 1
    if jax.default_backend() == "tpu" and (
            stride != 1 or h_out < 8 or w_out < 8):
        return False
    return h_out >= 1 and w_out >= 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_bottleneck(x, w1, wd, w2, se_w1, se_b1, se_w2, se_b2,
                     kernel_size, stride, use_se, tile_h):
    interpret = jax.default_backend() != "tpu"
    return _fused_forward(x, w1, wd, w2, se_w1, se_b1, se_w2, se_b2,
                          kernel_size=kernel_size, stride=stride,
                          use_se=use_se, tile_h=tile_h, interpret=interpret)


def _unfused_reference(x, w1, wd, w2, se_w1, se_b1, se_w2, se_b2,
                       kernel_size, stride, use_se):
    """The XLA path (identical math) — used for the backward recompute."""
    from jax import lax
    c, e_ch = w1.shape[-2], w1.shape[-1]
    dn = lax.conv_dimension_numbers(x.shape, w1.shape,
                                    ("NTHWC", "THWIO", "NTHWC"))
    h = lax.conv_general_dilated(x, w1.astype(x.dtype), (1, 1, 1),
                                 [(0, 0)] * 3, dimension_numbers=dn)
    p = kernel_size // 2
    dn2 = lax.conv_dimension_numbers(h.shape, wd.shape,
                                     ("NTHWC", "THWIO", "NTHWC"))
    d = lax.conv_general_dilated(
        h, wd.astype(x.dtype), (stride, stride, stride),
        [(p, p)] * 3, dimension_numbers=dn2, feature_group_count=e_ch)
    if use_se:
        from picklebot_tpu.ops.activations import hardsigmoid, relu
        pooled = jnp.mean(d.astype(jnp.float32), axis=(1, 2, 3)).astype(
            x.dtype)
        s = relu(jnp.dot(pooled, se_w1.astype(x.dtype)) +
                 se_b1.astype(x.dtype))
        s = hardsigmoid(jnp.dot(s, se_w2.astype(x.dtype)) +
                        se_b2.astype(x.dtype))
        d = d * s[:, None, None, None, :]
    dn3 = lax.conv_dimension_numbers(d.shape, w2.shape,
                                     ("NTHWC", "THWIO", "NTHWC"))
    return lax.conv_general_dilated(d, w2.astype(x.dtype), (1, 1, 1),
                                    [(0, 0)] * 3, dimension_numbers=dn3)


def _fb_fwd(x, w1, wd, w2, se_w1, se_b1, se_w2, se_b2,
            kernel_size, stride, use_se, tile_h):
    out = fused_bottleneck(x, w1, wd, w2, se_w1, se_b1, se_w2, se_b2,
                           kernel_size, stride, use_se, tile_h)
    return out, (x, w1, wd, w2, se_w1, se_b1, se_w2, se_b2)


def _fb_bwd(kernel_size, stride, use_se, tile_h, residuals, g):
    args = residuals
    _, vjp = jax.vjp(
        lambda *a: _unfused_reference(*a, kernel_size, stride, use_se),
        *args)
    return vjp(g)


fused_bottleneck.defvjp(_fb_fwd, _fb_bwd)


def apply_fused_bottleneck(params, x, kernel_size: int, stride: int,
                           use_se: bool, dtype):
    """Run the kernel from a Bottleneck3D params dict (expand/depthwise/
    SE/project weights) — the marshaling the retired Bottleneck3D(fused=)
    wiring used to do; kept for the evidence scripts and tests."""
    import jax.numpy as jnp
    se = params.get("squeeze_excite", {})
    e_ch = params["pointwise_conv1"]["w"].shape[-1]
    zeros_se = (jnp.zeros((e_ch, e_ch // 4), dtype),
                jnp.zeros((e_ch // 4,), dtype),
                jnp.zeros((e_ch // 4, e_ch), dtype),
                jnp.zeros((e_ch,), dtype))
    se_args = (tuple(jnp.asarray(se[k], dtype)
                     for k in ("w1", "b1", "w2", "b2"))
               if use_se else zeros_se)
    return fused_bottleneck(
        x.astype(dtype),
        jnp.asarray(params["pointwise_conv1"]["w"], dtype),
        jnp.asarray(params["depthwise_conv"]["w"], dtype),
        jnp.asarray(params["pointwise_conv2"]["w"], dtype),
        *se_args, kernel_size, stride, use_se, 8)
