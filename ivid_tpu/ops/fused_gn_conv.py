"""Fused per-channel-affine + SiLU + 3x3 conv for the UNet torso (large F).

The ResBlock hot path is ``conv3x3(silu(affine(x)))`` twice per block, where
``affine`` is GroupNorm's per-(sample, channel) normalization — optionally
folded with the FiLM ``(1 + scale, shift)`` timestep modulation (reference:
diffusion/backbones/adm.py:198-216). XLA cannot fuse elementwise producers
into a convolution's operand, so the normalized/activated tensor ``z`` makes
an HBM round trip per site: stats read + x read + z write + conv's z read.
At the SR model's 256² level one such tensor is ~0.9 GB (batch 54 fused-CFG),
so each site pays ~1.6 ms of avoidable traffic.

This kernel is the generalization of :mod:`ivid_tpu.ops.fused_head` to
conv-width output features: one Pallas pass reads the bf16 ``x`` block rows
(+1-row halos fetched as 8-row sublane chunks), applies the f32 affine +
SiLU in VMEM, and consumes the result immediately as nine shifted
``[rows·W, C] @ [C, F]`` MXU contractions accumulated in f32 — ``z`` never
exists in HBM, and the output block is written NHWC (W sublane, F lane), the
layout its consumer wants.

Semantics match the unfused torso path (f32 norm -> bf16 silu/conv stream)
up to bf16 rounding placement: the unfused path rounds the *normalized*
value to bf16 before SiLU, the fused kernel applies SiLU in f32 and rounds
after. Both are within one bf16 ulp of the f32 composition.

GATED OFF by default (``IVID_TPU_FUSED_GNCONV=1`` enables): the dual-pointwise
negative result (see CLAUDE.md) showed kernels that fight XLA's chosen
layouts can lose despite lower HBM traffic — this path ships dark until the
on-chip A/B (bench_gnconv.py) proves it on real hardware.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ROWS = int(os.environ.get("IVID_TPU_FUSED_GNCONV_ROWS", "16"))


def supports_fused_gn_conv(shape: tuple, f: int, num_groups: int) -> bool:
    """Shape gate: lane-aligned C/F, sublane-aligned W and rows, bandwidth-
    bound spatial size, and a kernel-table size that fits VMEM comfortably."""
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    return (
        c % 128 == 0
        and f % 128 == 0
        and c % num_groups == 0
        and h % _ROWS == 0
        and w % 8 == 0
        and c <= 512
        and f <= 512
        and h * w >= 1024
    )


def gn_affine(
    x: jax.Array,
    gn_scale: jax.Array,
    gn_bias: jax.Array,
    num_groups: int,
    film_scale: jax.Array | None = None,
    film_shift: jax.Array | None = None,
):
    """Per-(sample, channel) affine (a, t) such that
    ``a·x + t == FiLM(GroupNorm(x))`` in f32. ``film_scale``/``film_shift``
    are the raw Dense outputs [B, C] (the (1 + scale) fold happens here)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    cpg = c // num_groups
    n = h * w * cpg
    sg = jnp.sum(xf, axis=(1, 2)).reshape(b, num_groups, cpg).sum(-1)
    qg = jnp.sum(xf * xf, axis=(1, 2)).reshape(b, num_groups, cpg).sum(-1)
    mu = sg / n
    var = jnp.maximum(qg / n - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    a = gn_scale[None, :] * jnp.repeat(inv, cpg, axis=1)
    t = gn_bias[None, :] - jnp.repeat(mu, cpg, axis=1) * a
    if film_scale is not None:
        fs = 1.0 + film_scale.astype(jnp.float32)
        a = a * fs
        t = t * fs + film_shift.astype(jnp.float32)
    return a, t


def unfused_affine_silu_conv(x, a, t, kernel, bias):
    """The unfused composition (torso dtype semantics: bf16 conv stream) —
    the backward pass and the CPU/parity path."""
    z = x.astype(jnp.float32) * a[:, None, None, :] + t[:, None, None, :]
    z = z * jax.nn.sigmoid(z)
    z = z.astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        z, kernel.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(x.dtype)


def fused_affine_silu_conv(
    x: jax.Array,
    a: jax.Array,
    t: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """``conv3x3(silu(a·x + t))`` fused; returns NHWC [B, H, W, F] in
    ``x.dtype``. ``a``/``t`` [B, C] f32 (see :func:`gn_affine`), ``kernel``
    HWIO [3, 3, C, F]. Differentiable via recompute through
    :func:`unfused_affine_silu_conv`."""
    return _fused_vjp(bool(interpret), x, a, t, kernel, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_vjp(interpret, x, a, t, kernel, bias):
    return _fused_forward(x, a, t, kernel, bias, interpret=interpret)


def _fused_fwd(interpret, x, a, t, kernel, bias):
    y = _fused_vjp(interpret, x, a, t, kernel, bias)
    return y, (x, a, t, kernel, bias)


def _fused_bwd(interpret, res, g):
    x, a, t, kernel, bias = res
    _, pull = jax.vjp(unfused_affine_silu_conv, x, a, t, kernel, bias)
    return pull(g.astype(x.dtype))


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


def _gnconv_kernel(cur_ref, top_ref, bot_ref, a_ref, t_ref, kern_ref,
                   bias_ref, out_ref, *, rows: int, mm_dtype):
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    w = cur_ref.shape[2]
    c = cur_ref.shape[3]
    f = kern_ref.shape[3]

    ext = jnp.concatenate(
        [top_ref[0, 7:8], cur_ref[0], bot_ref[0, 0:1]], axis=0
    )  # [rows+2, W, C]

    z = ext.astype(jnp.float32) * a_ref[0] + t_ref[0]
    z = z * jax.nn.sigmoid(z)
    # SAME-conv zero padding applies to the normalized tensor: halo rows
    # outside the image contribute 0, not silu(affine(0)).
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    keep = ((ridx > 0) | (i > 0)) & ((ridx < rows + 1) | (i < nb - 1))
    z = jnp.where(keep, z, 0.0)
    z = z.astype(mm_dtype)

    acc = jnp.zeros((rows * w, f), jnp.float32)
    zcol = jnp.zeros((rows, 1, c), z.dtype)
    for dy in range(3):
        band = z[dy : dy + rows]  # [rows, W, C]
        for kx in range(3):
            if kx == 0:
                sh = jnp.concatenate([zcol, band[:, :-1]], axis=1)
            elif kx == 2:
                sh = jnp.concatenate([band[:, 1:], zcol], axis=1)
            else:
                sh = band
            acc = acc + jax.lax.dot_general(
                sh.reshape(rows * w, c),
                kern_ref[dy, kx].astype(mm_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out = acc.reshape(rows, w, f) + bias_ref[0].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _fused_forward(x, a, t, kernel, bias, *, interpret=False):
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    assert supports_fused_gn_conv(x.shape, f, 1), (x.shape, f)

    rb = _ROWS
    hb = h // rb
    halo = rb // 8

    # Matmul in the torso dtype (bf16): identical stream semantics to the
    # unfused nn.Conv path; accumulation is f32 on the MXU either way.
    mm_dtype = x.dtype
    kernel_fn = functools.partial(_gnconv_kernel, rows=rb, mm_dtype=mm_dtype)
    itemsize = jnp.dtype(x.dtype).itemsize
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((b, h, w, f), x.dtype),
        grid=(b, hb),
        in_specs=[
            pl.BlockSpec((1, rb, w, c), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec(
                (1, 8, w, c),
                lambda bi, i: (bi, jnp.maximum(i * halo - 1, 0), 0, 0),
            ),
            pl.BlockSpec(
                (1, 8, w, c),
                lambda bi, i: (
                    bi, jnp.minimum((i + 1) * halo, (hb * halo) - 1), 0, 0,
                ),
            ),
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((3, 3, c, f), lambda bi, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, f), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, w, f), lambda bi, i: (bi, i, 0, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * c * f,
            bytes_accessed=b * h * w * c * itemsize * (rb + 16) // rb
            + b * h * w * f * itemsize,
            transcendentals=b * h * w * c,
        ),
    )(
        x, x, x, a[:, None].astype(jnp.float32), t[:, None].astype(jnp.float32),
        # Kernel rides in the torso dtype — the unfused nn.Conv casts it the
        # same way, and at C=F=512 an f32 table alone would be 9.4 MB of VMEM.
        kernel.astype(mm_dtype), bias.reshape(1, f).astype(jnp.float32),
    )


# ---- two-part (split skip-concat) variant -------------------------------

def gn_affine_parts(parts, gn_scale, gn_bias, num_groups,
                    film_scale=None, film_shift=None):
    """Per-part (a, t) for GroupNorm over the LOGICALLY-concatenated channel
    axis of ``parts`` (the split skip-concat decoder path): statistics
    combine across parts, groups may straddle the part boundary."""
    b = parts[0].shape[0]
    s_parts, q_parts, hw = [], [], None
    for p in parts:
        pf = p.astype(jnp.float32)
        hw = p.shape[1] * p.shape[2]
        s_parts.append(jnp.sum(pf, axis=(1, 2)))
        q_parts.append(jnp.sum(pf * pf, axis=(1, 2)))
    s = jnp.concatenate(s_parts, axis=-1)  # [B, C_in]
    q = jnp.concatenate(q_parts, axis=-1)
    c = s.shape[-1]
    cpg = c // num_groups
    n = hw * cpg
    sg = s.reshape(b, num_groups, cpg).sum(-1)
    qg = q.reshape(b, num_groups, cpg).sum(-1)
    mu = sg / n
    var = jnp.maximum(qg / n - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    a = gn_scale[None, :] * jnp.repeat(inv, cpg, axis=1)
    t = gn_bias[None, :] - jnp.repeat(mu, cpg, axis=1) * a
    if film_scale is not None:
        fs = 1.0 + film_scale.astype(jnp.float32)
        a = a * fs
        t = t * fs + film_shift.astype(jnp.float32)
    outs, lo = [], 0
    for p in parts:
        ci = p.shape[-1]
        outs.append((a[:, lo : lo + ci], t[:, lo : lo + ci]))
        lo += ci
    return outs


def unfused_affine_silu_conv_parts(parts, ats, kernel, bias):
    """Split-path reference composition: per-part affine+SiLU, summed
    sliced-kernel convs (mirrors adm.SplitConv + SplitGroupNorm32)."""
    y, lo = None, 0
    for p, (a, t) in zip(parts, ats):
        z = p.astype(jnp.float32) * a[:, None, None, :] + t[:, None, None, :]
        z = z * jax.nn.sigmoid(z)
        z = z.astype(p.dtype)
        ci = p.shape[-1]
        yi = jax.lax.conv_general_dilated(
            z, kernel[:, :, lo : lo + ci].astype(p.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = yi if y is None else y + yi
        lo += ci
    return y + bias.astype(parts[0].dtype)


def _gnconv2_kernel(cur0, top0, bot0, cur1, top1, bot1, a0, t0, a1, t1,
                    kern_ref, bias_ref, out_ref, *, rows: int, c0: int,
                    mm_dtype):
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    w = cur0.shape[2]
    f = kern_ref.shape[3]

    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    keep = ((ridx > 0) | (i > 0)) & ((ridx < rows + 1) | (i < nb - 1))

    acc = jnp.zeros((rows * w, f), jnp.float32)
    for part, (cur, top, bot, a, t, lo) in enumerate(
        [(cur0, top0, bot0, a0, t0, 0), (cur1, top1, bot1, a1, t1, c0)]
    ):
        c = cur.shape[3]
        ext = jnp.concatenate([top[0, 7:8], cur[0], bot[0, 0:1]], axis=0)
        z = ext.astype(jnp.float32) * a[0] + t[0]
        z = z * jax.nn.sigmoid(z)
        z = jnp.where(keep, z, 0.0)
        z = z.astype(mm_dtype)
        zcol = jnp.zeros((rows, 1, c), z.dtype)
        for dy in range(3):
            band = z[dy : dy + rows]
            for kx in range(3):
                if kx == 0:
                    sh = jnp.concatenate([zcol, band[:, :-1]], axis=1)
                elif kx == 2:
                    sh = jnp.concatenate([band[:, 1:], zcol], axis=1)
                else:
                    sh = band
                acc = acc + jax.lax.dot_general(
                    sh.reshape(rows * w, c),
                    kern_ref[dy, kx, lo : lo + c],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    out = acc.reshape(rows, w, f) + bias_ref[0].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def supports_fused_gn_conv_parts(shapes, f: int, num_groups: int) -> bool:
    """Gate for the two-part (split skip-concat) form."""
    if len(shapes) != 2 or any(len(s) != 4 for s in shapes):
        return False
    if tuple(shapes[1][:3]) != tuple(shapes[0][:3]):
        return False
    _, h, w, _ = shapes[0]
    c_in = sum(s[-1] for s in shapes)
    return (
        all(s[-1] % 128 == 0 and s[-1] <= 512 for s in shapes)
        and c_in % num_groups == 0
        and f % 128 == 0
        and f <= 512
        and h % _ROWS == 0
        and w % 8 == 0
        and h * w >= 1024
    )


def fused_affine_silu_conv_parts(parts, ats, kernel, bias, *,
                                 interpret: bool = False):
    """Two-part form of :func:`fused_affine_silu_conv` for the split
    skip-concat decoder blocks: ``Σ_i conv3x3(silu(a_i·x_i + t_i), K_i)``
    in ONE Pallas pass — neither the concat nor either z ever hits HBM.
    ``ats`` from :func:`gn_affine_parts`; ``kernel`` is the FULL
    [3, 3, ΣC_i, F] table (sliced in-kernel)."""
    (a0, t0), (a1, t1) = ats
    return _fused2_vjp(bool(interpret), parts[0], parts[1], a0, t0, a1, t1,
                       kernel, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused2_vjp(interpret, x0, x1, a0, t0, a1, t1, kernel, bias):
    return _fused2_forward(x0, x1, a0, t0, a1, t1, kernel, bias,
                           interpret=interpret)


def _fused2_fwd(interpret, x0, x1, a0, t0, a1, t1, kernel, bias):
    y = _fused2_vjp(interpret, x0, x1, a0, t0, a1, t1, kernel, bias)
    return y, (x0, x1, a0, t0, a1, t1, kernel, bias)


def _fused2_bwd(interpret, res, g):
    x0, x1, a0, t0, a1, t1, kernel, bias = res
    fn = lambda x0, x1, a0, t0, a1, t1, kernel, bias: (
        unfused_affine_silu_conv_parts(
            (x0, x1), [(a0, t0), (a1, t1)], kernel, bias
        )
    )
    _, pull = jax.vjp(fn, x0, x1, a0, t0, a1, t1, kernel, bias)
    return pull(g.astype(x0.dtype))


_fused2_vjp.defvjp(_fused2_fwd, _fused2_bwd)


def _fused2_forward(x0, x1, a0, t0, a1, t1, kernel, bias, *, interpret=False):
    b, h, w, c0 = x0.shape
    c1 = x1.shape[-1]
    f = kernel.shape[-1]
    assert x1.shape[:3] == (b, h, w), (x0.shape, x1.shape)
    assert kernel.shape[2] == c0 + c1

    rb = _ROWS
    hb = h // rb
    halo = rb // 8
    mm_dtype = x0.dtype
    kernel_fn = functools.partial(
        _gnconv2_kernel, rows=rb, c0=c0, mm_dtype=mm_dtype
    )

    def xspecs(c):
        return [
            pl.BlockSpec((1, rb, w, c), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec(
                (1, 8, w, c),
                lambda bi, i: (bi, jnp.maximum(i * halo - 1, 0), 0, 0),
            ),
            pl.BlockSpec(
                (1, 8, w, c),
                lambda bi, i: (
                    bi, jnp.minimum((i + 1) * halo, (hb * halo) - 1), 0, 0,
                ),
            ),
        ]

    at_spec = lambda c: pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0))
    itemsize = jnp.dtype(x0.dtype).itemsize
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((b, h, w, f), x0.dtype),
        grid=(b, hb),
        in_specs=(
            xspecs(c0) + xspecs(c1)
            + [at_spec(c0), at_spec(c0), at_spec(c1), at_spec(c1)]
            + [
                pl.BlockSpec((3, 3, c0 + c1, f), lambda bi, i: (0, 0, 0, 0)),
                pl.BlockSpec((1, f), lambda bi, i: (0, 0)),
            ]
        ),
        out_specs=pl.BlockSpec((1, rb, w, f), lambda bi, i: (bi, i, 0, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * (c0 + c1) * f,
            bytes_accessed=b * h * w * (c0 + c1) * itemsize * (rb + 16) // rb
            + b * h * w * f * itemsize,
            transcendentals=b * h * w * (c0 + c1),
        ),
    )(
        x0, x0, x0, x1, x1, x1,
        a0[:, None].astype(jnp.float32), t0[:, None].astype(jnp.float32),
        a1[:, None].astype(jnp.float32), t1[:, None].astype(jnp.float32),
        kernel.astype(mm_dtype), bias.reshape(1, f).astype(jnp.float32),
    )
