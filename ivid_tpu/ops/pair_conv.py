"""Fused 1x1 skip-projection pair: ``conv1x1(x) + conv1x1(skip) [+ h] + bias``
in ONE pass over HBM.

The decoder's residual skip projection (reference:
diffusion/backbones/adm.py:219-222, the ``skip_connection`` 1x1 conv over the
concatenated [x, skip] channels) runs in the split form as a pair of k=1 convs
plus adds (models/adm.py SplitConv). On the SR model the round-5 trace puts
the six up_0 pair convs at 17.05 ms/step, 638 GB/s — each conv streams its
input and re-materializes a full-size partial sum, so the pair moves ~5
tensor-sized HBM passes where the math needs 3 reads + 1 write.

This kernel computes the whole expression in one pass: read x, skip (and the
ResBlock main-line output ``h``, folding the final residual add), write the
result. Design notes:

- LAYOUT: XLA lays the model's big NHWC activations out as {3,0,2,1}
  (N,H,W,C -> physical [H][W][N][C]) around the sampler scan carry. A Pallas
  call takes default layouts, so handing it the [N,H,W,C] tensor forces a
  906 MB relayout copy per operand — the measured loss of the round-2
  dual-pointwise kernel (SplitConv docstring). Instead the wrapper transposes
  to logical [H,W,N,C] and flattens to [H*W, N, C]: on a {3,0,2,1} operand
  that transpose is layout-identical (same bytes, same (N,C)-minor tiling),
  so XLA lowers it to a bitcast and the kernel rides the production layout
  instead of fighting it.
- The matmul is [(rows), N, C] x [C, O] per grid step — sublane dim N stays
  the model batch (54 SR / 32 flagship), lanes are channels.
- Gradients: ``pair_conv1x1`` carries a custom VJP whose backward runs the
  plain XLA form (transposed 1x1 convs), so the training path is exact and
  needs no hand-written kernel.

A/B status: see BASELINE.md (round 5). Enable with ``IVID_TPU_PAIR_SKIP=1``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _row_block(
    rows: int, n: int, c1: int, c2: int, o: int, itemsize: int, with_h: bool
) -> int:
    """Rows (H*W positions) per grid step, sized to the 16 MB scoped-VMEM
    budget: Mosaic double-buffers every input/output block across grid steps,
    plus the f32 accumulator. A fixed RB=64 measured a compile-time VMEM OOM
    at the SR up_3 pair ([64,54,512/384/384] blocks = 25.7 MB scoped, limit
    16 MB). Env-overridable for sweeps (``IVID_TPU_PAIR_RB``)."""
    v = os.environ.get("IVID_TPU_PAIR_RB")
    if v:
        rb = int(v)
        if rows % rb:
            raise ValueError(f"IVID_TPU_PAIR_RB={rb} must divide rows={rows}")
        return rb
    io_elems = c1 + c2 + o + (o if with_h else 0)
    per_row = n * (io_elems * itemsize * 2 + o * 4)
    cap = 10 * 2**20
    rb = 64
    while rb > 1 and (rb * per_row > cap or rows % rb):
        rb //= 2
    return rb


def _pair_kernel(x_ref, s_ref, h_ref, kx_ref, ks_ref, b_ref, o_ref):
    dims = (((2,), (0,)), ((), ()))
    acc = jax.lax.dot_general(
        x_ref[...], kx_ref[...], dims, preferred_element_type=jnp.float32
    )
    acc += jax.lax.dot_general(
        s_ref[...], ks_ref[...], dims, preferred_element_type=jnp.float32
    )
    acc += b_ref[0]
    if h_ref is not None:
        acc += h_ref[...].astype(jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _pair_conv_pallas(x, skip, h, kern_x, kern_s, bias, *, interpret=False):
    """x, skip: [N,H,W,C*]; h: [N,H,W,O] or None; kern_*: [C*,O]; bias [O]."""
    n, hh, ww, c1 = x.shape
    c2 = skip.shape[-1]
    o = kern_x.shape[-1]
    rows = hh * ww
    rb = _row_block(
        rows, n, c1, c2, o, jnp.dtype(x.dtype).itemsize, h is not None
    )

    # Layout-riding view: [N,H,W,C]{3,0,2,1} == [H*W,N,C] default layout.
    tr = lambda t: jnp.transpose(t, (1, 2, 0, 3)).reshape(rows, n, t.shape[-1])
    xt, st = tr(x), tr(skip)
    ht = tr(h) if h is not None else None

    dt = x.dtype
    kx = kern_x.astype(dt)
    ks = kern_s.astype(dt)
    b2 = bias.astype(jnp.float32).reshape(1, o)

    row_spec = lambda c: pl.BlockSpec((rb, n, c), lambda r: (r, 0, 0))
    full_spec = lambda a, b_: pl.BlockSpec((a, b_), lambda r: (0, 0))
    in_specs = [row_spec(c1), row_spec(c2)]
    args = [xt, st]
    if ht is not None:
        in_specs.append(row_spec(o))
        args.append(ht)
    in_specs += [full_spec(c1, o), full_spec(c2, o), full_spec(1, o)]
    args += [kx, ks, b2]

    def body(*refs):
        if ht is not None:
            x_r, s_r, h_r, kx_r, ks_r, b_r, o_r = refs
        else:
            x_r, s_r, kx_r, ks_r, b_r, o_r = refs
            h_r = None
        _pair_kernel(x_r, s_r, h_r, kx_r, ks_r, b_r, o_r)

    itemsize = jnp.dtype(dt).itemsize
    n_in = rows * n * (c1 + c2 + (o if ht is not None else 0))
    out_t = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((rows, n, o), dt),
        grid=(rows // rb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, n, o), lambda r: (r, 0, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * n * (c1 + c2) * o,
            bytes_accessed=(n_in + rows * n * o) * itemsize,
            transcendentals=0,
        ),
    )(*args)
    return jnp.transpose(out_t.reshape(hh, ww, n, o), (2, 0, 1, 3))


def _pair_conv_xla(x, skip, h, kern_x, kern_s, bias, dtype):
    """Unfused reference form (matches SplitConv's conv-pair semantics)."""
    dn = ("NHWC", "HWIO", "NHWC")
    ya = jax.lax.conv_general_dilated(
        x.astype(dtype), kern_x[None, None].astype(dtype), (1, 1), "SAME",
        dimension_numbers=dn,
    )
    yb = jax.lax.conv_general_dilated(
        skip.astype(dtype), kern_s[None, None].astype(dtype), (1, 1), "SAME",
        dimension_numbers=dn,
    )
    out = ya + yb + bias.astype(dtype)
    if h is not None:
        out = out + h.astype(dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def pair_conv1x1(x, skip, h, kern_x, kern_s, bias, dtype, interpret=False):
    """Fused ``conv1x1(x)+conv1x1(skip)+bias[+h]`` (see module docstring).

    ``h`` may be None (plain pair). ``dtype`` is the conv compute dtype
    (matches SplitConv's ``self.dtype``); accumulation is f32 in-kernel.
    """
    return _pair_conv_pallas(
        x.astype(dtype), skip.astype(dtype), h, kern_x, kern_s, bias,
        interpret=interpret,
    )


def _pair_fwd(x, skip, h, kern_x, kern_s, bias, dtype, interpret):
    out = pair_conv1x1(x, skip, h, kern_x, kern_s, bias, dtype, interpret)
    return out, (x, skip, kern_x, kern_s, h is None)


def _pair_bwd(dtype, interpret, res, g):
    """Backward through the unfused XLA form (exact: the op is linear)."""
    x, skip, kern_x, kern_s, h_none = res
    gd = g.astype(dtype)
    dn = ("NHWC", "HWIO", "NHWC")
    # d/dx of x @ kx is g @ kx^T — another 1x1 conv with transposed kernel.
    dx = jax.lax.conv_general_dilated(
        gd, jnp.swapaxes(kern_x[None, None], 2, 3).astype(dtype), (1, 1),
        "SAME", dimension_numbers=dn,
    ).astype(x.dtype)
    ds = jax.lax.conv_general_dilated(
        gd, jnp.swapaxes(kern_s[None, None], 2, 3).astype(dtype), (1, 1),
        "SAME", dimension_numbers=dn,
    ).astype(skip.dtype)
    flat = lambda t: t.reshape(-1, t.shape[-1])
    gf = flat(g).astype(jnp.float32)
    dkx = flat(x).astype(jnp.float32).T @ gf
    dks = flat(skip).astype(jnp.float32).T @ gf
    dbias = gf.sum(axis=0)
    dh = None if h_none else g
    return dx, ds, dh, dkx.astype(kern_x.dtype), dks.astype(kern_s.dtype), dbias


pair_conv1x1.defvjp(_pair_fwd, _pair_bwd)


def use_pair_skip() -> bool:
    """Production gate for the fused pair-skip kernel.

    Default OFF pending the round-5 model-step A/B (the only admissible
    evidence for defaults — BASELINE.md round-4 methodology lesson)."""
    return os.environ.get("IVID_TPU_PAIR_SKIP", "0") == "1"
