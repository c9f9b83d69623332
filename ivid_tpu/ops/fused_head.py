"""Fused output-head kernel: GroupNorm -> SiLU -> 3x3 conv in one Pallas pass.

The UNet's output head (reference: diffusion/backbones/adm.py:483-487,565-566)
is ``h.float() -> GroupNorm32 -> SiLU -> zero-init 3x3 conv``. Left to XLA this
is a multi-pass fp32 section over the largest activation in the model: the cast
materializes an fp32 copy of the full-resolution torso output, GroupNorm reads
it twice (stats + normalize), and the conv reads the normalized fp32 tensor
again — all HBM-bound traffic on a tensor whose useful payload lives happily in
bf16.

This kernel splits the head into:

1. one XLA reduction pass over the bf16 input for the per-(sample, group)
   GroupNorm statistics (exact: bf16 -> fp32 casts are value-preserving), and
2. one Pallas pass that applies the normalization affine + SiLU in fp32 and
   immediately consumes the result with the 3x3 conv as nine shifted
   ``[rows*W, C] @ [C, F]`` MXU contractions — the fp32 normalized tensor never
   exists in HBM.

Row halos are fetched as 8-row sublane-aligned chunks through dedicated block
specs (extra read traffic: 16 rows per ``_ROW_BLOCK`` rows), so total HBM
traffic is ~1.5x the bf16 input + the (tiny) head output, versus ~5 full-size
fp32 passes for the unfused form.

The output is laid out ``[B, F8, H, W]`` (features-major, F padded to the fp32
sublane width 8): the two minor dims are (H-rows, W) so no lane padding is ever
introduced for the 4-channel RGBD head; the caller slices/transposes back to
NHWC, which XLA fuses into the consumer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import os

# H rows per grid step. 16 keeps the kernel's fp32 working set (ext + z +
# shifted tap copies ≈ 5 tensors of rows·W·C) well under the ~16 MB VMEM
# budget at both head shapes; IVID_TPU_FUSED_HEAD_ROWS sweeps it (32 halves
# the 8-row halo re-read but roughly doubles live VMEM).
_ROW_BLOCK = int(os.environ.get("IVID_TPU_FUSED_HEAD_ROWS", "16"))
_F_PAD = 8  # fp32 sublane width; the RGBD head has 4 output channels


def supports_fused_head(shape: tuple, num_groups: int) -> bool:
    """Shape gate: lane-aligned channels, sublane-aligned rows, W >= 128."""
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    return (
        c % 128 == 0
        and c % num_groups == 0
        and h % _ROW_BLOCK == 0
        and w % 128 == 0
        and (h // _ROW_BLOCK) >= 1
    )


def _head_kernel(cur_ref, top_ref, bot_ref, a_ref, t_ref, kern_ref,
                 out_ref, *, rows: int, mm_dtype):
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    w = cur_ref.shape[2]
    c = cur_ref.shape[3]

    ext = jnp.concatenate(
        [top_ref[0, 7:8], cur_ref[0], bot_ref[0, 0:1]], axis=0
    )  # [rows+2, W, C]

    # GroupNorm affine (per-channel a,t precomputed from the group stats) +
    # SiLU, in fp32 — identical values to the unfused fp32 GN path. a/t ride
    # as [B, 1, C] ([1, C] blocks: TPU block shapes need the sublane dim ≥8 or
    # full) and broadcast over (rows, W).
    z = ext.astype(jnp.float32) * a_ref[0] + t_ref[0]
    z = z * jax.nn.sigmoid(z)
    # SAME-conv zero padding applies to the *normalized* tensor: outside the
    # image the conv input is 0, not silu(affine(0)) — mask halo rows here.
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    keep = ((ridx > 0) | (i > 0)) & ((ridx < rows + 1) | (i < nb - 1))
    z = jnp.where(keep, z, 0.0)
    z = z.astype(mm_dtype)

    # 3x3 SAME conv as 9 shifted [F, C] x [rows*W, C]^T contractions,
    # accumulated features-major so the output block needs no transpose.
    acc = jnp.zeros((_F_PAD, rows * w), jnp.float32)
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
            k = kern_ref[dy, kx].astype(mm_dtype)  # [C, F_PAD]
            acc = acc + jax.lax.dot_general(
                k, sh.reshape(rows * w, c),
                (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    # NOTE: the conv bias is added by the caller after the NHWC transpose —
    # a [1, F_PAD] lane vector can't be reshaped onto the sublane axis inside
    # Mosaic (infer-vector-layout rejects vector<1x8> -> vector<8x1x1>).
    out_ref[0] = acc.reshape(_F_PAD, rows, w)


def unfused_gn_silu_conv(x, gn_scale, gn_bias, kernel, conv_bias, num_groups):
    """The unfused composition with the same stats formulation as the fused
    kernel — the backward pass differentiates through this (XLA ops), so the
    fused forward needs no hand-written Pallas VJP."""
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
    z = xf * a[:, None, None, :] + t[:, None, None, :]
    z = z * jax.nn.sigmoid(z)
    y = jax.lax.conv_general_dilated(
        z, kernel.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + conv_bias.astype(jnp.float32)


def fused_gn_silu_conv(
    x: jax.Array,
    gn_scale: jax.Array,
    gn_bias: jax.Array,
    kernel: jax.Array,
    conv_bias: jax.Array,
    num_groups: int,
    *,
    mm_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """``conv3x3(silu(group_norm(x)))`` fused; returns NHWC fp32 [B, H, W, F].

    ``x`` is the bf16 (or fp32) torso output [B, H, W, C]; ``kernel`` is
    HWIO [3, 3, C, F]. Matches ``silu(GroupNorm32(x.astype(f32)))`` followed
    by an fp32 SAME conv (reference: diffusion/backbones/adm.py:483-487).
    Differentiable: the VJP recomputes through ``unfused_gn_silu_conv``.
    """
    return _fused_vjp(
        num_groups, jnp.dtype(mm_dtype).name, bool(interpret),
        x, gn_scale, gn_bias, kernel, conv_bias,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_vjp(num_groups, mm_dtype_name, interpret, x, gn_scale, gn_bias,
               kernel, conv_bias):
    return _fused_forward(
        x, gn_scale, gn_bias, kernel, conv_bias, num_groups,
        mm_dtype=jnp.dtype(mm_dtype_name), interpret=interpret,
    )


def _fused_fwd(num_groups, mm_dtype_name, interpret, x, gn_scale, gn_bias,
               kernel, conv_bias):
    y = _fused_vjp(
        num_groups, mm_dtype_name, interpret, x, gn_scale, gn_bias, kernel,
        conv_bias,
    )
    return y, (x, gn_scale, gn_bias, kernel, conv_bias)


def _fused_bwd(num_groups, mm_dtype_name, interpret, res, g):
    x, gn_scale, gn_bias, kernel, conv_bias = res
    _, pull = jax.vjp(
        lambda *args: unfused_gn_silu_conv(*args, num_groups), x, gn_scale,
        gn_bias, kernel, conv_bias,
    )
    return pull(g)


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


def _fused_forward(
    x: jax.Array,
    gn_scale: jax.Array,
    gn_bias: jax.Array,
    kernel: jax.Array,
    conv_bias: jax.Array,
    num_groups: int,
    *,
    mm_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    assert supports_fused_head(x.shape, num_groups), (x.shape, num_groups)
    assert f <= _F_PAD

    # Pass 1: exact GroupNorm statistics (one fused XLA read of the bf16 x).
    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=(1, 2))  # [B, C]
    q = jnp.sum(xf * xf, axis=(1, 2))
    cpg = c // num_groups
    n = h * w * cpg
    sg = s.reshape(b, num_groups, cpg).sum(-1)
    qg = q.reshape(b, num_groups, cpg).sum(-1)
    mu = sg / n
    var = jnp.maximum(qg / n - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    inv_c = jnp.repeat(inv, cpg, axis=1)  # [B, C]
    mu_c = jnp.repeat(mu, cpg, axis=1)
    a = gn_scale[None, :] * inv_c
    t = gn_bias[None, :] - mu_c * a

    kern = kernel.astype(jnp.float32)
    if f < _F_PAD:
        kern = jnp.pad(kern, ((0, 0), (0, 0), (0, 0), (0, _F_PAD - f)))

    rb = _ROW_BLOCK
    hb = h // rb
    halo = rb // 8  # top/bottom halo chunk index stride (8-row chunks)

    kernel_fn = functools.partial(_head_kernel, rows=rb, mm_dtype=mm_dtype)
    itemsize = jnp.dtype(x.dtype).itemsize
    y = pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((b, _F_PAD, h, w), jnp.float32),
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
            pl.BlockSpec((3, 3, c, _F_PAD), lambda bi, i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _F_PAD, rb, w), lambda bi, i: (bi, 0, i, 0)),
        interpret=interpret,
        # Logical (model) flops — count F, not the padded _F_PAD lanes, so
        # bench MFU stays comparable with the unfused conv's cost analysis.
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * c * f,
            bytes_accessed=b * h * w * c * itemsize * 3 // 2
            + b * _F_PAD * h * w * 4,
            transcendentals=b * h * w * c,
        ),
    )(x, x, x, a[:, None], t[:, None], kern)

    return y[:, :f].transpose(0, 2, 3, 1) + conv_bias.astype(jnp.float32)
