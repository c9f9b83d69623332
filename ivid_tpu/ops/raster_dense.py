"""Dense per-pixel triangle rasterization for SMALL primitive sets.

The frustum-padding skirt is ~1k triangles that can each span a large part of
the frame (the padding ring sits at depth 0.1 in front of the source camera,
so its vertices project far off-screen from a novel view). The lattice
sampler (`renderer._quad_fragments`) handles them by brute sampling —
~340k fragments per view slot, 40% of the raster bill, most of them
off-screen — because a sample lattice must cover the worst-case screen
extent everywhere.

For a primitive count this small the TPU-native shape is the opposite one:
iterate PIXELS densely and test every triangle per pixel. This module
evaluates edge functions for all T skirt triangles against blocks of pixels
as [block, T] panels (one [block,3]x[3,T] MXU matmul per interpolated
plane), takes the per-pixel depth-min winner with GL '<' semantics, and
interpolates the winner's attributes perspective-correctly via a one-hot
matmul against the per-triangle plane coefficients. Pixel coverage is exact
(pixel-center point-in-triangle, like the GL rasterizer it replaces —
reference: rgbd_3d/moderngl_renderer.py:296-315), where the lattice was a
coverage approximation.

Pure XLA (no Pallas): the panels are [1024, T] dense f32 blocks that XLA
tiles and fuses well on both TPU and CPU, and `lax.map` over pixel blocks
bounds live memory.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_FAR = 9.0  # matches raster_tiled sentinel; valid window z in [0, 1]


class DenseRaster(NamedTuple):
    """Per-pixel raster output in FLAT pixel order (row 0 = window bottom,
    matching fragment ``pixel = y * R + x`` ids before the final flip)."""

    attrs: jnp.ndarray   # [npix, A] winner attrs (tie-averaged), 0 where empty
    depth: jnp.ndarray   # [npix] window z, 1.0 where empty
    front: jnp.ndarray   # [npix] winner front-facing fraction > 0.5
    covered: jnp.ndarray  # [npix] bool


def _plane_coeffs(p, f):
    """Affine plane coefficients (a, b, c) with f(x, y) = a·x + b·y + c from
    values ``f`` [T, 3(, K)] at window positions ``p`` [T, 3, 2]."""
    x, y = p[..., 0], p[..., 1]
    det = (
        (x[:, 1] - x[:, 0]) * (y[:, 2] - y[:, 0])
        - (x[:, 2] - x[:, 0]) * (y[:, 1] - y[:, 0])
    )
    safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    if f.ndim == 2:
        f = f[..., None]
    f0, f1, f2 = f[:, 0], f[:, 1], f[:, 2]
    dy12 = (y[:, 1] - y[:, 0])[:, None]
    dy20 = (y[:, 2] - y[:, 0])[:, None]
    dx12 = (x[:, 1] - x[:, 0])[:, None]
    dx20 = (x[:, 2] - x[:, 0])[:, None]
    a = ((f1 - f0) * dy20 - (f2 - f0) * dy12) / safe[:, None]
    b = ((f2 - f0) * dx12 - (f1 - f0) * dx20) / safe[:, None]
    c = f0 - a * x[:, 0][:, None] - b * y[:, 0][:, None]
    return a, b, c, det


def rasterize_tris_dense(
    win: jnp.ndarray,
    w: jnp.ndarray,
    attrs: jnp.ndarray,
    tris: jnp.ndarray,
    render_size: int,
    discard_attr: Optional[int] = None,
    block_px: int = 2048,
) -> DenseRaster:
    """Rasterize ``tris`` (indices into ``win``/``w``/``attrs``) exactly per
    pixel. ``discard_attr``: attribute channel index whose perspective-correct
    value > 0.001 on a BACKFACE discards the candidate (the aggregation
    shader's backface-padding discard, shaders/aggregation.fsh:22-26);
    fragments merely behind others still lose the z-test as usual."""
    r = render_size
    npix = r * r
    if npix % block_px:
        # Whole framebuffer rows per block: r*k divides r² iff k divides r.
        k = max(d for d in range(1, r + 1) if r % d == 0 and r * d <= block_px)
        block_px = r * k
    A = attrs.shape[-1]

    p = win[tris]          # [T, 3, 3] (x, y, zwin)
    fw = w[tris]           # [T, 3]
    fa = attrs[tris]       # [T, 3, A]

    valid_tri = jnp.all(fw > 1e-6, axis=-1)
    inv_w = 1.0 / jnp.where(fw > 1e-6, fw, 1.0)

    # Front-facing via signed window area, matching raster.generate_fragments.
    e1 = p[:, 1, :2] - p[:, 0, :2]
    e2 = p[:, 2, :2] - p[:, 0, :2]
    area2 = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    front_tri = area2 > 0.0

    # Edge functions E_i(q) = cross(p_{i+1}-p_i, q-p_i); inside iff all E_i
    # share the sign of the area. Fold the sign in so inside == all(E >= 0).
    sgn = jnp.where(area2 >= 0.0, 1.0, -1.0)
    ex = jnp.stack([p[:, 1], p[:, 2], p[:, 0]], 1)[..., :2]  # [T,3,2] edge ends
    e0 = p[:, :, :2].reshape(-1, 3, 2)                         # edge starts
    ed = ex - e0
    # E(q) = ed.x·(qy−p.y) − ed.y·(qx−p.x)  →  a·x + b·y + c
    ea = (-ed[..., 1]) * sgn[:, None]                 # [T,3]
    eb = (ed[..., 0]) * sgn[:, None]
    ec = (ed[..., 1] * e0[..., 0] - ed[..., 0] * e0[..., 1]) * sgn[:, None]

    za, zb, zc, det = _plane_coeffs(p[..., :2], p[..., 2])
    za, zb, zc = za[:, 0], zb[:, 0], zc[:, 0]
    wa, wb, wc, _ = _plane_coeffs(p[..., :2], inv_w)
    wa, wb, wc = wa[:, 0], wb[:, 0], wc[:, 0]
    aw = fa * inv_w[..., None]                        # attrs pre-divided by w
    aa, ab, ac, _ = _plane_coeffs(p[..., :2], aw)     # [T, A] each

    valid_tri = valid_tri & (jnp.abs(det) > 1e-12)

    # Per-candidate coefficient matrix for the post-winner attr interpolation:
    # [T, 3*(A+1)] — attr/w planes plus the 1/w plane.
    coef = jnp.concatenate(
        [aa, ab, ac, wa[:, None], wb[:, None], wc[:, None]], axis=-1
    )  # [T, 3A+3]

    if discard_attr is not None:
        da, db, dc = aa[:, discard_attr], ab[:, discard_attr], ac[:, discard_attr]

    # Flat pixel id = y * r + x (window y-up; caller flips at the end).

    def block(start):
        pid = start + jnp.arange(block_px)
        qx = (pid % r).astype(jnp.float32) + 0.5
        qy = (pid // r).astype(jnp.float32) + 0.5

        def plane(a, b, c):
            return qx[:, None] * a[None, :] + qy[:, None] * b[None, :] + c[None, :]

        inside = (
            (plane(ea[:, 0], eb[:, 0], ec[:, 0]) >= 0.0)
            & (plane(ea[:, 1], eb[:, 1], ec[:, 1]) >= 0.0)
            & (plane(ea[:, 2], eb[:, 2], ec[:, 2]) >= 0.0)
        )  # [B, T]
        z = plane(za, zb, zc)
        ok = inside & valid_tri[None, :] & (z >= 0.0) & (z <= 1.0)
        if discard_attr is not None:
            dval = plane(da, db, dc) / jnp.maximum(plane(wa, wb, wc), 1e-12)
            ok = ok & ~((~front_tri)[None, :] & (dval > 0.001))
        zm = jnp.where(ok, z, _FAR)
        zmin = jnp.min(zm, axis=1)                    # [B]
        winner = (zm == zmin[:, None]) & ok           # [B, T] (ties all win)
        cnt = jnp.sum(winner, axis=1)
        covered = zmin < 1.5
        onehot = winner.astype(jnp.float32)
        sel = jax.lax.dot_general(
            onehot, coef, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, 3A+3] tie-summed plane coefficients
        denom = jnp.maximum(cnt, 1).astype(jnp.float32)
        sel = sel / denom[:, None]
        s_aa, s_ab, s_ac = sel[:, :A], sel[:, A:2 * A], sel[:, 2 * A:3 * A]
        s_wa, s_wb, s_wc = sel[:, 3 * A], sel[:, 3 * A + 1], sel[:, 3 * A + 2]
        num = qx[:, None] * s_aa + qy[:, None] * s_ab + s_ac
        den = qx * s_wa + qy * s_wb + s_wc
        attr_px = num / jnp.maximum(den, 1e-12)[:, None]
        frontf = jnp.sum(onehot * front_tri[None, :].astype(jnp.float32), axis=1)
        return (
            jnp.where(covered[:, None], attr_px, 0.0),
            jnp.where(covered, zmin, 1.0),
            (frontf * 2 > cnt) & covered,
            covered,
        )

    starts = jnp.arange(0, npix, block_px)
    attrs_o, depth_o, front_o, cov_o = jax.lax.map(block, starts)
    return DenseRaster(
        attrs=attrs_o.reshape(npix, A),
        depth=depth_o.reshape(npix),
        front=front_o.reshape(npix),
        covered=cov_o.reshape(npix),
    )


def merge_dense(
    payload: jnp.ndarray,
    depth_win: jnp.ndarray,
    covered: jnp.ndarray,
    dense_payload: jnp.ndarray,
    dense: DenseRaster,
    render_size: int,
):
    """Z-test merge of a resolved fragment framebuffer (image row order,
    [R,R,...]) with a dense raster pass (flat window order): the strictly
    nearer source wins; fragment winners keep ties."""
    r = render_size
    d_depth = jnp.flip(dense.depth.reshape(r, r), axis=0)
    d_cov = jnp.flip(dense.covered.reshape(r, r), axis=0)
    d_pay = jnp.flip(dense_payload.reshape(r, r, -1), axis=0)
    use = d_cov & (~covered | (d_depth < depth_win))
    out_payload = jnp.where(use[..., None], d_pay, payload)
    out_depth = jnp.where(use, d_depth, depth_win)
    return out_payload, out_depth, covered | d_cov
