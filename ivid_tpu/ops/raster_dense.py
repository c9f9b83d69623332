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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAR = 9.0  # matches raster_tiled sentinel; valid window z in [0, 1]
_P = 256   # pixels per kernel tile (matches raster_tiled)
_TC = 256  # triangles per kernel chunk


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


def _tri_planes(win, w, attrs, tris, discard_attr):
    """Per-triangle affine plane coefficients for edge functions, window z,
    1/w, attr/w channels, plus front/valid flags."""
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

    if discard_attr is not None:
        dnum = (aa[:, discard_attr], ab[:, discard_attr], ac[:, discard_attr])
    else:
        dnum = None
    return dict(
        ea=ea, eb=eb, ec=ec, za=za, zb=zb, zc=zc, wa=wa, wb=wb, wc=wc,
        aa=aa, ab=ab, ac=ac, dnum=dnum, front=front_tri, valid=valid_tri, A=A,
        py=p[..., 1],  # window-y per vertex, for chunk pruning
    )


def rasterize_tris_dense(
    win: jnp.ndarray,
    w: jnp.ndarray,
    attrs: jnp.ndarray,
    tris: jnp.ndarray,
    render_size: int,
    discard_attr: Optional[int] = None,
    block_px: int = 2048,
    interpret: bool = False,
) -> DenseRaster:
    """Rasterize ``tris`` (indices into ``win``/``w``/``attrs``) exactly per
    pixel. ``discard_attr``: attribute channel index whose perspective-correct
    value > 0.001 on a BACKFACE discards the candidate (the aggregation
    shader's backface-padding discard, shaders/aggregation.fsh:22-26);
    fragments merely behind others still lose the z-test as usual.

    Two implementations with identical semantics:
    - a Pallas TPU kernel (default on TPU when the tile shape divides the
      frame) — the [pixels x triangles] panels stay in VMEM, the plane
      evaluations are ONE [P,8]x[8,7·TC] MXU matmul per chunk, and winner
      attrs resolve by a one-hot matmul against the plane table. The XLA
      form of the same math materializes every panel through HBM (profiled
      7.5 ms/slot on v5e vs <1 ms for the kernel).
    - an XLA block map (CPU tests, odd sizes, ``IVID_TPU_SKIRT_IMPL=xla``).
    """
    import os

    r = render_size
    npix = r * r
    pln = _tri_planes(win, w, attrs, tris, discard_attr)
    impl = os.environ.get("IVID_TPU_SKIRT_IMPL", "auto")
    use_pallas = impl != "xla" and (
        interpret or jax.default_backend() == "tpu" or impl == "pallas"
    )
    if use_pallas:
        return _pallas_raster(pln, r, pln["py"], interpret=interpret)
    return _xla_raster(pln, r, npix, block_px)


def _xla_raster(pln, r, npix, block_px):
    if npix % block_px:
        # Whole framebuffer rows per block: r*k divides r² iff k divides r.
        k = max(d for d in range(1, r + 1) if r % d == 0 and r * d <= block_px)
        block_px = r * k
    A = pln["A"]
    ea, eb, ec = pln["ea"], pln["eb"], pln["ec"]
    za, zb, zc = pln["za"], pln["zb"], pln["zc"]
    wa, wb, wc = pln["wa"], pln["wb"], pln["wc"]
    aa, ab, ac = pln["aa"], pln["ab"], pln["ac"]
    front_tri, valid_tri = pln["front"], pln["valid"]
    discard = pln["dnum"] is not None
    if discard:
        da, db, dc = pln["dnum"]

    # Per-candidate coefficient matrix for the post-winner attr interpolation:
    # [T, 3*(A+1)] — attr/w planes plus the 1/w plane.
    coef = jnp.concatenate(
        [aa, ab, ac, wa[:, None], wb[:, None], wc[:, None]], axis=-1
    )  # [T, 3A+3]

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
        if discard:
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


def _skirt_kernel(hit_ref, geom_ref, pay_ref, out_ref, zbuf_s, acc_s, *, r, nc, pw):
    """One framebuffer ROW vs the y-overlapping triangle chunks.

    The grid is one program per row: ``qy`` is a per-program constant, so a
    plane evaluates as ONE [r, TC]-broadcast FMA (a [P,8]x[8,·] matmul form
    of the same math measured ~10x slower — the 8-deep contraction wastes
    the MXU and falls to VPU broadcast). Triangles are pre-sorted by window
    y, so the prefetched ``hit_ref[t, c]`` scalars skip chunks whose y-span
    misses this row — most (row, chunk) pairs in a skirt ring.

    geom_ref: VMEM [3, nc·7·TC] — rows (x-coef, y-coef, const) per chunk,
        plane order e0, e1, e2, z, dnum, dden, front.
    pay_ref:  VMEM [nc·TC, PW] — attr/w plane table + front + ones columns.
    out_ref:  VMEM [1, r, 1+PW] — col 0 zbuf, 1.. tie-summed payload planes.
    """
    t = pl.program_id(0)
    qx = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0).astype(jnp.float32) + 0.5
    qy = t.astype(jnp.float32) + 0.5

    zbuf_s[...] = jnp.full((r, 1), _FAR, jnp.float32)
    acc_s[...] = jnp.zeros((r, pw), jnp.float32)
    for c in range(nc):
        @pl.when(hit_ref[t, c] > 0)
        def _(c=c):
            g = geom_ref[:, c * 7 * _TC : (c + 1) * 7 * _TC]
            row = qy * g[1:2, :] + g[2:3, :]          # [1, 7·TC]
            G = qx * g[0:1, :] + row                   # [r, 7·TC]
            e0 = G[:, 0 * _TC : 1 * _TC]
            e1 = G[:, 1 * _TC : 2 * _TC]
            e2 = G[:, 2 * _TC : 3 * _TC]
            z = G[:, 3 * _TC : 4 * _TC]
            dnum = G[:, 4 * _TC : 5 * _TC]
            dden = G[:, 5 * _TC : 6 * _TC]
            front = G[:, 6 * _TC : 7 * _TC]
            ok = (
                (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                & (z >= 0.0) & (z <= 1.0)
                & ~((front < 0.5) & (dnum - 0.001 * dden > 0.0))
            )
            zm = jnp.where(ok, z, _FAR)
            zc = jnp.min(zm, axis=1, keepdims=True)
            win = ((zm == zc) & (zc < 1.5)).astype(jnp.float32)
            acc_c = jax.lax.dot_general(
                win, pay_ref[c * _TC : (c + 1) * _TC, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )  # [r, PW]
            zbuf = zbuf_s[...]
            less = zc < zbuf
            eq = zc == zbuf
            acc_s[...] = jnp.where(
                less, acc_c, jnp.where(eq, acc_s[...] + acc_c, acc_s[...])
            )
            zbuf_s[...] = jnp.minimum(zbuf, zc)
    out_ref[0, :, 0:1] = zbuf_s[...]
    out_ref[0, :, 1:] = acc_s[...]


def _pallas_raster(pln, r, win_y, interpret=False) -> DenseRaster:
    A = pln["A"]
    T = pln["front"].shape[0]
    npix = r * r
    nc = -(-T // _TC)
    Tp = nc * _TC
    pad = Tp - T

    valid = pln["valid"]
    # Window-y spans for chunk pruning: invalid tris get an empty interval.
    ymin = jnp.where(valid, jnp.min(win_y, axis=1), jnp.inf)
    ymax = jnp.where(valid, jnp.max(win_y, axis=1), -jnp.inf)
    # Sort by y-center so chunks are y-bands (ties/invalid go last).
    order = jnp.argsort(jnp.where(valid, 0.5 * (ymin + ymax), jnp.inf))
    perm = lambda x: x[order]

    def padt(x, fill=0.0):
        return jnp.pad(perm(x), [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    valid_s = padt(valid, False)
    # Fold validity into the z plane: invalid/padded tris interpolate z=_FAR
    # everywhere and fail the z-range test.
    za = jnp.where(valid_s, padt(pln["za"]), 0.0)
    zb = jnp.where(valid_s, padt(pln["zb"]), 0.0)
    zc = jnp.where(valid_s, padt(pln["zc"]), _FAR)
    if pln["dnum"] is not None:
        da, db, dc = (padt(v) for v in pln["dnum"])
    else:
        # Constant plane −1: the discard predicate dnum > 0.001·dden (dden =
        # interpolated 1/w > 0) is then never true.
        da = jnp.zeros((Tp,))
        db = jnp.zeros((Tp,))
        dc = jnp.full((Tp,), -1.0)
    frontf = padt(pln["front"].astype(jnp.float32))

    planes = [
        (padt(pln["ea"][:, 0]), padt(pln["eb"][:, 0]), padt(pln["ec"][:, 0])),
        (padt(pln["ea"][:, 1]), padt(pln["eb"][:, 1]), padt(pln["ec"][:, 1])),
        (padt(pln["ea"][:, 2]), padt(pln["eb"][:, 2]), padt(pln["ec"][:, 2])),
        (za, zb, zc),
        (da, db, dc),
        (padt(pln["wa"]), padt(pln["wb"]), padt(pln["wc"])),
        (jnp.zeros((Tp,)), jnp.zeros((Tp,)), frontf),
    ]
    # [3, 7, Tp] → chunk-major [3, nc, 7, TC] → [3, nc·7·TC].
    geom = jnp.stack([jnp.stack(p, 0) for p in planes], 1)  # [3, 7, Tp]
    geom = geom.reshape(3, 7, nc, _TC).transpose(0, 2, 1, 3).reshape(3, -1)

    pw = 3 * A + 5
    pay = jnp.concatenate(
        [
            padt(pln["aa"]), padt(pln["ab"]), padt(pln["ac"]),
            padt(pln["wa"])[:, None], padt(pln["wb"])[:, None],
            padt(pln["wc"])[:, None], frontf[:, None],
            jnp.ones((Tp, 1)),
        ],
        axis=-1,
    ).astype(jnp.float32)

    # Per (row, chunk) hit scalars: row t spans window y in [t, t+1).
    cymin = jnp.min(padt(ymin, jnp.inf).reshape(nc, _TC), axis=1)  # [nc]
    cymax = jnp.max(padt(ymax, -jnp.inf).reshape(nc, _TC), axis=1)
    rows = jnp.arange(r, dtype=jnp.float32)
    hit = (
        (cymax[None, :] >= rows[:, None]) & (cymin[None, :] <= rows[:, None] + 1)
    ).astype(jnp.int32)  # [r, nc]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((3, nc * 7 * _TC), lambda t, h: (0, 0)),
            pl.BlockSpec((Tp, pw), lambda t, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, 1 + pw), lambda t, h: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((r, 1), jnp.float32),
            pltpu.VMEM((r, pw), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        lambda h_ref, g_ref, p_ref, o_ref, zs, as_: _skirt_kernel(
            h_ref, g_ref, p_ref, o_ref, zs, as_, r=r, nc=nc, pw=pw
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, r, 1 + pw), jnp.float32),
        interpret=interpret,
    )(hit, geom.astype(jnp.float32), pay)

    out = out.reshape(npix, 1 + pw)
    zbuf = out[:, 0]
    acc = out[:, 1:]
    covered = zbuf < 1.5
    cnt = acc[:, 3 * A + 4]
    sel = acc / jnp.maximum(cnt, 1.0)[:, None]
    pid = jnp.arange(npix)
    qx = (pid % r).astype(jnp.float32) + 0.5
    qy = (pid // r).astype(jnp.float32) + 0.5
    s_aa, s_ab, s_ac = sel[:, :A], sel[:, A:2 * A], sel[:, 2 * A:3 * A]
    num = qx[:, None] * s_aa + qy[:, None] * s_ab + s_ac
    den = qx * sel[:, 3 * A] + qy * sel[:, 3 * A + 1] + sel[:, 3 * A + 2]
    attr_px = num / jnp.maximum(den, 1e-12)[:, None]
    frontn = acc[:, 3 * A + 3]
    return DenseRaster(
        attrs=jnp.where(covered[:, None], attr_px, 0.0),
        depth=jnp.where(covered, zbuf, 1.0),
        front=(frontn * 2 > cnt) & covered,
        covered=covered,
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
