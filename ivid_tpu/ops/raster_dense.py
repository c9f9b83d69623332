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

from ivid_tpu.ops import raster as _raster
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAR = 9.0  # matches raster_tiled sentinel; valid window z in [0, 1]
_TC = 128  # triangles per kernel chunk (keeps [row, 6·TC] panels in VMEM)
def _pwp(A: int) -> int:
    """Payload plane rows per chunk for A attr channels: 3A+5 rows (a/b/c
    plane per channel + 1/w planes + front + ones) rounded up to the 8-sublane
    tile. 24 for the classic A≤6 payloads; 40 for the 11-channel
    fragment-weight aggregation varyings."""
    return -(-(3 * A + 5) // 8) * 8
_BIG_SPAN = 32.0  # window-y span above which a triangle skips y-binning


def _use_pallas(interpret: bool) -> bool:
    """Dense-raster impl gate, shared by every entry point:
    ``IVID_TPU_SKIRT_IMPL`` ∈ {auto (Pallas on TPU, XLA elsewhere), pallas,
    xla}; ``interpret=True`` always takes the Pallas path (interpreted)."""
    import os

    impl = os.environ.get("IVID_TPU_SKIRT_IMPL", "auto")
    return impl != "xla" and (
        interpret or _raster.exec_platform() == "tpu" or impl == "pallas"
    )


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
    """Per-triangle planes for an indexed triangle set (vertex gathers)."""
    return _planes_from_corners(
        win[tris], w[tris], attrs[tris], discard_attr
    )


def grid_tri_corners(vertex_vals: jnp.ndarray, grid_size: int,
                     ft: jnp.ndarray) -> jnp.ndarray:
    """Per-face corner values [2·(g-1)², 3, C] for a regular-grid mesh,
    built from SLICES of the [g, g, C] vertex grid — no gathers. Matches
    ``geometry.triangulate``'s faces (tr, tl, ft ? br : bl) and
    (bl, br, ft ? tl : tr) in cell-major order (reference:
    rgbd_3d/utils.py:113-134)."""
    g = grid_size
    V = vertex_vals.reshape(g, g, -1)
    tl, tr = V[:-1, :-1], V[:-1, 1:]
    bl, br = V[1:, :-1], V[1:, 1:]
    f = ft[..., None]
    f0 = jnp.stack([tr, tl, jnp.where(f, br, bl)], axis=2)  # [n, n, 3, C]
    f1 = jnp.stack([bl, br, jnp.where(f, tl, tr)], axis=2)
    both = jnp.stack([f0, f1], axis=2)                      # [n, n, 2, 3, C]
    return both.reshape(-1, 3, V.shape[-1])


def _planes_from_corners(p, fw, fa, discard_attr):
    """Per-triangle affine plane coefficients for edge functions, window z,
    1/w, attr/w channels, plus front/valid flags. ``p`` [T,3,3] window
    positions, ``fw`` [T,3] clip w, ``fa`` [T,3,A] vertex attributes."""
    A = fa.shape[-1]

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
    pln = _tri_planes(win, w, attrs, tris, discard_attr)
    return _dispatch(pln, render_size, block_px, interpret)


def rasterize_tris_dense_batched(
    win: jnp.ndarray,
    w: jnp.ndarray,
    attrs: jnp.ndarray,
    tris: jnp.ndarray,
    render_size: int,
    discard_attr: Optional[int] = None,
    interpret: bool = False,
) -> DenseRaster:
    """Rasterize one triangle set per vertex set (e.g. one skirt ring per
    warp sample) into B stacked framebuffers with ONE kernel launch.
    ``win`` [B,V,3], ``w`` [B,V], ``attrs`` [B,V,A]; ``tris`` [T,3] shared
    indices or [B,T,3] per-sample (depth-mesh diagonal splits are
    data-dependent). Returns a DenseRaster over ``B·r²`` flat pixels —
    buffer b owns ids ``[b·r², (b+1)·r²)``, matching the global ids of the
    batched fragment resolve (`raster.resolve_zbuffer(num_buffers=B)`) so
    `merge_dense` applies per buffer."""
    B = win.shape[0]
    T = tris.shape[-2]
    if tris.ndim == 2:
        p, fw, fa = win[:, tris], w[:, tris], attrs[:, tris]
    else:
        gather = jax.vmap(lambda v, t: v[t])
        p, fw, fa = gather(win, tris), gather(w, tris), gather(attrs, tris)
    pln = _planes_from_corners(
        p.reshape(B * T, 3, 3),
        fw.reshape(B * T, 3),
        fa.reshape(B * T, 3, attrs.shape[-1]),
        discard_attr,
    )

    def rs(x):
        return x.reshape((B, T) + x.shape[1:])

    plnb = {
        k: (rs(v) if k not in ("A", "dnum") else v) for k, v in pln.items()
    }
    if pln["dnum"] is not None:
        plnb["dnum"] = tuple(rs(v) for v in pln["dnum"])

    use_pallas = _use_pallas(interpret)
    if use_pallas:
        return _pallas_raster_batched(plnb, render_size, interpret=interpret)

    # XLA fallback (CPU tests): per-sample block raster, concatenated flat.
    def one(p):
        d = dict(p)
        d["A"] = pln["A"]
        if "dnum_stack" in d:
            d["dnum"] = tuple(d.pop("dnum_stack"))
        else:
            d["dnum"] = None
        r = render_size
        return _xla_raster(d, r, r * r, 2048)

    pv = {k: v for k, v in plnb.items() if k not in ("A", "dnum")}
    if plnb["dnum"] is not None:
        pv["dnum_stack"] = jnp.stack(plnb["dnum"], 1)
    outs = jax.lax.map(one, pv)
    return DenseRaster(
        attrs=outs.attrs.reshape(-1, outs.attrs.shape[-1]),
        depth=outs.depth.reshape(-1),
        front=outs.front.reshape(-1),
        covered=outs.covered.reshape(-1),
    )


def rasterize_grid_dense(
    win: jnp.ndarray,
    w: jnp.ndarray,
    attrs: jnp.ndarray,
    positions: jnp.ndarray,
    grid_size: int,
    render_size: int,
    discard_attr: Optional[int] = None,
    block_px: int = 2048,
    interpret: bool = False,
) -> DenseRaster:
    """Per-pixel raster of an ENTIRE regular-grid depth mesh (all
    2·(g-1)² faces). Corner values come from grid slices instead of
    ``faces`` gathers (the profiled gathers were ~1.3 ms/slot on v5e),
    re-deriving the diagonal split from ``positions`` exactly as
    ``geometry.triangulate`` chose it."""
    from ivid_tpu.ops.geometry import triangulate_face_type

    g = grid_size
    ft = triangulate_face_type(positions.reshape(g, g, 3))
    packed = jnp.concatenate([win, w[:, None], attrs], axis=-1)
    corners = grid_tri_corners(packed, g, ft)     # [T, 3, 4+A]
    pln = _planes_from_corners(
        corners[..., :3], corners[..., 3], corners[..., 4:], discard_attr
    )
    return _dispatch(pln, render_size, block_px, interpret)


def rasterize_grid_dense_batched(
    win: jnp.ndarray,
    w: jnp.ndarray,
    attrs: jnp.ndarray,
    positions: jnp.ndarray,
    grid_size: int,
    render_size: int,
    discard_attr: Optional[int] = None,
    interpret: bool = False,
) -> DenseRaster:
    """B regular-grid depth meshes (e.g. one per aggregation view slot) in
    ONE per-row kernel launch — the batched form of
    :func:`rasterize_grid_dense`. ``win`` [B,V,3], ``w`` [B,V], ``attrs``
    [B,V,A], ``positions`` [B,V,3]. Buffer b owns flat pixels
    ``[b·r², (b+1)·r²)``; per-buffer plane tables stream through VMEM one
    buffer at a time (geom ≈ 6.4 MB per 130² mesh)."""
    from ivid_tpu.ops.geometry import triangulate_face_type

    g = grid_size
    B = win.shape[0]

    if not _use_pallas(interpret):
        # The XLA fallback rebuilds per-sample plane tables inside
        # rasterize_grid_dense; build nothing batched here.
        def one(args):
            return rasterize_grid_dense(*args, g, render_size,
                                        discard_attr=discard_attr)

        outs = jax.lax.map(one, (win, w, attrs, positions))
        return DenseRaster(
            attrs=outs.attrs.reshape(-1, outs.attrs.shape[-1]),
            depth=outs.depth.reshape(-1),
            front=outs.front.reshape(-1),
            covered=outs.covered.reshape(-1),
        )

    # ``IVID_TPU_AGG_PREP``: channelwise transposed prep (``cols``, DEFAULT)
    # builds plane columns straight from grid slices, skipping the
    # [B, T, 3, 4+A] corners intermediates whose (8,128) tiling made their
    # slices/copies ~0.95 ms/slot (see _grid_cols_t). Round-4 on-chip A/B
    # (bench_agg_batch.py, bucket 1, live meshes): cols 2.92-2.94 ms/slot vs
    # corners 3.84-4.01 — a 24% win, so cols is production; ``corners``
    # stays as the measured fallback. (A fused in-kernel epilogue lost the
    # same A/B at 4.45 ms/slot and VMEM-OOMed at bucket 8; deleted per the
    # round-4 verdict — numbers in BASELINE.md.)
    import os

    if os.environ.get("IVID_TPU_AGG_PREP", "cols") == "cols":
        A = attrs.shape[-1]
        npix = B * render_size * render_size

        def prep_one(win_v, w_v, attrs_v, pos_v):
            cols = _grid_cols_t(win_v, w_v, attrs_v, pos_v, g, discard_attr)
            return _prep_pack(*cols, render_size, A)

        tables = jax.vmap(prep_one)(win, w, attrs, positions)
        out = _launch_batched(tables, B, render_size, A, interpret)
        return _pallas_finish(
            out.reshape(npix, 1 + _pwp(A)), render_size, npix, A
        )

    def corners_one(win_v, w_v, attrs_v, pos_v):
        ft = triangulate_face_type(pos_v.reshape(g, g, 3))
        packed = jnp.concatenate([win_v, w_v[:, None], attrs_v], axis=-1)
        return grid_tri_corners(packed, g, ft)

    corners = jax.vmap(corners_one)(win, w, attrs, positions)  # [B,T,3,4+A]
    T = corners.shape[1]
    pln = _planes_from_corners(
        corners[..., :3].reshape(B * T, 3, 3),
        corners[..., 3].reshape(B * T, 3),
        corners[..., 4:].reshape(B * T, 3, corners.shape[-1] - 4),
        discard_attr,
    )

    def rs(x):
        return x.reshape((B, T) + x.shape[1:])

    plnb = {
        k: (rs(v) if k not in ("A", "dnum") else v) for k, v in pln.items()
    }
    if pln["dnum"] is not None:
        plnb["dnum"] = tuple(rs(v) for v in pln["dnum"])

    return _pallas_raster_batched(plnb, render_size, interpret=interpret)


def _dispatch(pln, render_size, block_px, interpret):
    use_pallas = _use_pallas(interpret)
    if use_pallas:
        return _pallas_raster(pln, render_size, interpret=interpret)
    return _xla_raster(pln, render_size, render_size * render_size, block_px)


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


def _dense_kernel(lohi_ref, span_ref, glob_ref, geom_ref, pay_ref, out_ref,
                  zbuf_s, acc_s, *, r):
    """See :func:`_dense_kernel_impl`; single-buffer grid ``(r,)``."""
    _dense_kernel_impl(
        lohi_ref, span_ref, glob_ref, geom_ref, pay_ref, out_ref,
        zbuf_s, acc_s, r=r, rows_per_buf=None,
    )


def _dense_kernel_impl(lohi_ref, span_ref, glob_ref, geom_ref, pay_ref,
                       out_ref, zbuf_s, acc_s, *, r, rows_per_buf,
                       chunks_per_buf=None):
    """One framebuffer ROW vs its y-overlapping triangle chunks.

    One program per row: ``qy`` is a per-program constant, so a plane
    evaluates as ONE [r, 6·TC]-broadcast FMA (an MXU matmul form of the
    same math measured ~10x slower — an 8-deep contraction wastes the
    systolic array and falls to VPU broadcast). Triangles are pre-sorted
    by window ymin with large-span triangles split off to a global tail,
    so each row runs two compact ``fori_loop``s: its contiguous y-band
    chunk range [lo, hi) plus the global range — a handful of chunks out
    of potentially hundreds — with a per-chunk prefetched span check
    skipping the rest. Chunks straddling the band/global boundary may be
    processed twice; the equal-z merge path then double-adds the same
    winner sums AND the count column, which the tie-average normalization
    cancels exactly.

    lohi_ref: SMEM [2, r] — per-row y-band chunk ranges (lo row 0, hi row 1).
    span_ref: SMEM [2, nc] — per-chunk integer window-y spans.
    glob_ref: SMEM [2] — big-triangle chunk range (shared by all rows).
    geom_ref: VMEM [nc·8, 6·TC] — rows 0-2 of each 8-row chunk group are
        (x-coef, y-coef, const); plane order e0, e1, e2, z, D, front with
        D = dnum − 0.001·dden folding the backface-padding discard test
        into a single affine plane.
    pay_ref:  VMEM [nc·PWP, TC] — payload planes per chunk (attr/w planes,
        1/w plane, front, ones), tri-major on lanes.
    out_ref:  VMEM [1, r, 1+PWP] — col 0 zbuf, 1.. tie-summed planes.

    Batched form (``rows_per_buf`` set): the grid is ``(B·r,)`` over B
    stacked framebuffers; program ``t`` rasterizes LOCAL row ``t % r`` of
    buffer ``b = t // r``. Triangle planes stay in each buffer's own window
    coords; ``geom_ref``/``pay_ref`` are PER-BUFFER blocks (index ``t // r``,
    so VMEM holds one buffer's tables at a time and consecutive rows of the
    same buffer reuse the resident block), ``lohi``/``glob`` hold LOCAL
    chunk ids, ``span`` is the stacked [2, B·nc] table indexed at
    ``b·chunks_per_buf + c``. Buffer isolation is structural — row programs
    only ever loop over their own buffer's chunk ranges.
    """
    t = pl.program_id(0)
    # Prefetch arrays are [2, N] (pairs on sublanes): SMEM pads the LAST axis
    # to 128 lanes, so an [N, 2] layout would blow the 1 MB SMEM budget at
    # batched sizes (8·384 rows × 128-lane pad × 4 B = 1.5 MB, measured).
    if rows_per_buf is None:
        ty = t
        glob_lo, glob_hi = glob_ref[0], glob_ref[1]
        span_off = 0
    else:
        b = t // rows_per_buf
        ty = t - b * rows_per_buf
        glob_lo, glob_hi = glob_ref[0, b], glob_ref[1, b]
        span_off = b * chunks_per_buf
    _raster_row(lohi_ref, span_ref, glob_lo, glob_hi, geom_ref, pay_ref,
                zbuf_s, acc_s, t, ty, span_off, r)
    out_ref[0, :, 0:1] = zbuf_s[...]
    out_ref[0, :, 1:] = acc_s[...]


def _raster_row(lohi_ref, span_ref, glob_lo, glob_hi, geom_ref, pay_ref,
                zbuf_s, acc_s, t, ty, span_off, r):
    """The shared per-row chunk loops: z-test every y-overlapping triangle
    chunk and leave (zbuf_s [r,1], acc_s [r,PWP]) holding the per-pixel
    winner depth and tie-summed payload planes + count."""
    qx = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0).astype(jnp.float32) + 0.5
    qy = ty.astype(jnp.float32) + 0.5

    pwp = acc_s.shape[1]
    zbuf_s[...] = jnp.full((r, 1), _FAR, jnp.float32)
    acc_s[...] = jnp.zeros((r, pwp), jnp.float32)

    def chunk(c, carry):
        @pl.when(
            (span_ref[0, span_off + c] <= ty)
            & (span_ref[1, span_off + c] >= ty)
        )
        def _():
            g = geom_ref[pl.ds(c * 8, 8), :]           # [8, 6·TC]
            row = qy * g[1:2, :] + g[2:3, :]           # [1, 6·TC]
            G = qx * g[0:1, :] + row                   # [r, 6·TC]
            e0 = G[:, 0 * _TC : 1 * _TC]
            e1 = G[:, 1 * _TC : 2 * _TC]
            e2 = G[:, 2 * _TC : 3 * _TC]
            z = G[:, 3 * _TC : 4 * _TC]
            D = G[:, 4 * _TC : 5 * _TC]
            front = G[:, 5 * _TC : 6 * _TC]
            ok = (
                (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                & (z >= 0.0) & (z <= 1.0)
                & ~((front < 0.5) & (D > 0.0))
            )
            zm = jnp.where(ok, z, _FAR)
            zc = jnp.min(zm, axis=1, keepdims=True)
            win = ((zm == zc) & (zc < 1.5)).astype(jnp.float32)
            acc_c = jax.lax.dot_general(
                win, pay_ref[pl.ds(c * pwp, pwp), :],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )  # [r, PWP]
            zbuf = zbuf_s[...]
            less = zc < zbuf
            eq = zc == zbuf
            acc_s[...] = jnp.where(
                less, acc_c, jnp.where(eq, acc_s[...] + acc_c, acc_s[...])
            )
            zbuf_s[...] = jnp.minimum(zbuf, zc)
        return carry

    jax.lax.fori_loop(lohi_ref[0, t], lohi_ref[1, t], chunk, 0)
    jax.lax.fori_loop(glob_lo, glob_hi, chunk, 0)


def _pallas_prep(pln, r, A):
    """Host-side packing for the per-row kernel: y-sort with big-span split,
    chunked plane tables, per-row chunk ranges. Returns
    ``(lohi [r,2], spans [nc,2], glob [2], geom [nc·8, 6TC], pay [nc·PWP, TC])``
    — all in LOCAL chunk ids / window y, so the batched launcher can stack B
    preps and offset the chunk ids."""
    T = pln["front"].shape[0]
    valid = pln["valid"]
    win_y = pln["py"]

    # Window-y spans; invalid tris get an empty interval.
    ymin = jnp.where(valid, jnp.min(win_y, axis=1), jnp.inf)
    ymax = jnp.where(valid, jnp.max(win_y, axis=1), -jnp.inf)
    # Fold validity into the z plane: invalid/padded tris interpolate z=_FAR
    # everywhere and fail the z-range test.
    za = jnp.where(valid, pln["za"], 0.0)
    zb = jnp.where(valid, pln["zb"], 0.0)
    zcc = jnp.where(valid, pln["zc"], _FAR)
    wa, wb, wc = pln["wa"], pln["wb"], pln["wc"]
    if pln["dnum"] is not None:
        # D = dnum − 0.001·dden: one affine plane for the whole discard test.
        da = pln["dnum"][0] - 0.001 * wa
        db = pln["dnum"][1] - 0.001 * wb
        dc = pln["dnum"][2] - 0.001 * wc
    else:
        da = jnp.zeros((T,))
        db = jnp.zeros((T,))
        dc = jnp.full((T,), -1.0)
    frontf = pln["front"].astype(jnp.float32)
    zero = jnp.zeros((T,))

    geom_cols = [
        pln["ea"][:, 0], pln["eb"][:, 0], pln["ec"][:, 0],
        pln["ea"][:, 1], pln["eb"][:, 1], pln["ec"][:, 1],
        pln["ea"][:, 2], pln["eb"][:, 2], pln["ec"][:, 2],
        za, zb, zcc, da, db, dc, zero, zero, frontf,
    ]
    pay_cols = (
        [pln["aa"][:, i] for i in range(A)]
        + [pln["ab"][:, i] for i in range(A)]
        + [pln["ac"][:, i] for i in range(A)]
        + [wa, wb, wc, frontf]
    )
    return _prep_pack(geom_cols, pay_cols, ymin, ymax, valid, r, A)


def _prep_pack(geom_cols, pay_cols, ymin, ymax, valid, r, A):
    """Shared tail of the per-row kernel prep, from plane COLUMN lists
    ([T] arrays each — geometry 18, payload 3A+4) to the kernel tables.
    Taking columns (not [T, C] stacks) keeps every op 1-D: [T, small-C]
    intermediates tile to (8, 128) on TPU and their slices/copies cost
    ~20× their logical bytes (profiled ~1 ms/slot on the corners path)."""
    T = geom_cols[0].shape[0]
    nc = -(-T // _TC)
    Tp = nc * _TC
    pad = Tp - T
    big = (ymax - ymin) > _BIG_SPAN

    # Sort key: y-binnable tris by ymin, then big tris, then invalid — the
    # per-row chunk ranges below assume exactly this grouping.
    key = jnp.where(
        valid & ~big, jnp.clip(ymin, -1e6, 1e6), jnp.where(valid, 2e6, 3e6)
    )
    key_s, order = jax.lax.sort(
        (key, jnp.arange(T, dtype=jnp.int32)), num_keys=1
    )
    n_small = jnp.sum(valid & ~big)
    n_valid = jnp.sum(valid)

    # ONE packed [T, 44] table so the y-sort permutation is a single row
    # gather: 18 geometry plane coefficients (6 planes × x/y/const), then
    # 3A+4 payload plane columns, then the y-span pair.
    pwp = _pwp(A)
    packed = jnp.stack(
        geom_cols + pay_cols
        + [jnp.clip(ymin, -1e6, 1e6), jnp.clip(ymax, -1e6, 1e6)],
        axis=-1,
    ).astype(jnp.float32)[order]
    ng, npay = 18, 3 * A + 4
    packed = jnp.pad(packed, ((0, pad), (0, 0)))
    # Padding rows: z plane must be invalid (const FAR), spans empty.
    if pad:
        fill = jnp.zeros((pad, packed.shape[1]))
        fill = fill.at[:, 11].set(_FAR)
        fill = fill.at[:, ng + npay].set(1e6)
        fill = fill.at[:, ng + npay + 1].set(-1e6)
        packed = packed.at[T:].set(fill)

    # geom [nc·8, 6·TC]: per chunk, sublane rows 0-2 = x/y/const coefficient
    # rows over plane-major lanes; rows 3-7 pad to the 8-sublane tile.
    g3 = packed[:, :ng].reshape(nc, _TC, 6, 3).transpose(0, 3, 2, 1)
    geom = jnp.pad(
        g3.reshape(nc, 3, 6 * _TC), ((0, 0), (0, 5), (0, 0))
    ).reshape(nc * 8, 6 * _TC)

    # pay [nc·PWP, TC]: payload planes on sublanes, tris on lanes; the ones
    # (winner count) row rides in the slot after the gathered columns.
    payp = jnp.concatenate(
        [
            packed[:, ng : ng + npay],
            jnp.ones((Tp, 1)),
            jnp.zeros((Tp, pwp - npay - 1)),
        ],
        axis=-1,
    )
    pay = payp.reshape(nc, _TC, pwp).transpose(0, 2, 1).reshape(nc * pwp, _TC)

    ymin_s = packed[:, ng + npay]
    ymax_s = packed[:, ng + npay + 1]

    # Per-row y-band chunk ranges over the small-tri prefix. hi: first tri
    # with ymin > t+1 (searchsorted on the sort key). lo: first index whose
    # running-max ymax reaches t — every earlier tri ends strictly below
    # this row, so the range [lo, hi) is a superset of the row's overlaps.
    rows_f = jnp.arange(r, dtype=jnp.float32)
    is_small = key_s < 1.5e6
    key_pad = jnp.pad(key_s, (0, pad), constant_values=3e6)
    hi_tri = jnp.searchsorted(key_pad, rows_f + 1.0, side="right")
    cm = jax.lax.associative_scan(
        jnp.maximum, jnp.where(jnp.pad(is_small, (0, pad)), ymax_s, -jnp.inf)
    )
    lo_tri = jnp.searchsorted(cm, rows_f, side="left")
    lohi = jnp.stack(
        [lo_tri // _TC, -(-hi_tri // _TC)], axis=-1
    ).astype(jnp.int32)

    # Per-chunk integer window-y spans for the in-range skip check.
    cymin = jnp.min(ymin_s.reshape(nc, _TC), axis=1)
    cymax = jnp.max(ymax_s.reshape(nc, _TC), axis=1)
    spans = jnp.stack(
        [jnp.floor(cymin), jnp.ceil(cymax)], axis=-1
    ).astype(jnp.int32)

    glob = jnp.stack([n_small // _TC, -(-n_valid // _TC)]).astype(jnp.int32)
    return lohi, spans, glob, geom, pay


def _pallas_raster(pln, r, interpret=False) -> DenseRaster:
    A = pln["A"]
    npix = r * r
    lohi, spans, glob, geom, pay = _pallas_prep(pln, r, A)
    lohi, spans = lohi.T, spans.T  # [2, N] — see the kernel's SMEM note
    nc = geom.shape[0] // 8
    pwp = _pwp(A)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((nc * 8, 6 * _TC), lambda t, lh, sp, gl: (0, 0)),
            pl.BlockSpec((nc * pwp, _TC), lambda t, lh, sp, gl: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, 1 + pwp), lambda t, lh, sp, gl: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((r, 1), jnp.float32),
            pltpu.VMEM((r, pwp), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        lambda lh, sp, gl, g_ref, p_ref, o_ref, zs, as_: _dense_kernel(
            lh, sp, gl, g_ref, p_ref, o_ref, zs, as_, r=r
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, r, 1 + pwp), jnp.float32),
        interpret=interpret,
    )(lohi, spans, glob, geom, pay)

    return _pallas_finish(out.reshape(npix, 1 + pwp), r, npix, A)


def _pallas_raster_batched(pln, r, interpret=False) -> DenseRaster:
    """B stacked framebuffers in ONE kernel launch; ``pln`` fields carry a
    leading [B, T, ...] batch axis. Grid ``(B·r,)``: program ``t`` does local
    row ``t % r`` of buffer ``t // r`` over that buffer's chunk ranges (ids
    offset by ``b·nc`` on the host). Returns a DenseRaster over ``B·r·r``
    flat pixels — buffer b occupies ids ``[b·r², (b+1)·r²)`` in the same
    window order as the single-buffer raster, matching the batched fragment
    resolve's global pixel ids."""
    A = pln["A"]
    B = pln["front"].shape[0]
    npix = B * r * r

    def prep(p):
        d = dict(p)
        d["A"] = A
        if d.get("dnum_stack") is not None:
            d["dnum"] = tuple(d.pop("dnum_stack"))
        else:
            d.pop("dnum_stack", None)
            d["dnum"] = None
        return _pallas_prep(d, r, A)

    # vmap over the batch: dict fields are [B, ...] arrays; 'A'/'dnum' are
    # re-attached inside (vmap carries only arrays).
    pv = {k: v for k, v in pln.items() if k not in ("A", "dnum")}
    if pln["dnum"] is not None:
        # [B, 3, T] so vmap's axis-0 mapping keeps the batch leading.
        pv["dnum_stack"] = jnp.stack(pln["dnum"], 1)
    tables = jax.vmap(prep)(pv)
    out = _launch_batched(tables, B, r, A, interpret)
    return _pallas_finish(out.reshape(npix, 1 + _pwp(A)), r, npix, A)


def _launch_batched(tables, B, r, A, interpret):
    """Launch the batched per-row PLANE kernel from vmapped prep tables.
    Returns the raw [B·r, r, 1+PWP] accumulator output."""
    lohi, spans, glob, geom, pay = tables
    nc = geom.shape[1] // 8  # chunks per buffer
    # lohi/glob keep LOCAL chunk ids — geom/pay are PER-BUFFER VMEM blocks
    # (index t // r), so the resident table always belongs to the program's
    # buffer; only the span table is stacked and indexed at b·nc + c.
    # [2, N] layouts — see the kernel's SMEM note.
    lohi = lohi.reshape(B * r, 2).T
    glob = glob.reshape(B, 2).T
    spans = spans.reshape(B * nc, 2).T
    geom = geom.reshape(B * nc * 8, 6 * _TC)
    pwp = _pwp(A)
    pay = pay.reshape(B * nc * pwp, _TC)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B * r,),
        in_specs=[
            pl.BlockSpec((nc * 8, 6 * _TC), lambda t, lh, sp, gl: (t // r, 0)),
            pl.BlockSpec((nc * pwp, _TC), lambda t, lh, sp, gl: (t // r, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, 1 + pwp), lambda t, lh, sp, gl: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((r, 1), jnp.float32),
            pltpu.VMEM((r, pwp), jnp.float32),
        ],
    )
    return pl.pallas_call(
        lambda lh, sp, gl, g_ref, p_ref, o_ref, zs, as_: _dense_kernel_impl(
            lh, sp, gl, g_ref, p_ref, o_ref, zs, as_, r=r, rows_per_buf=r,
            chunks_per_buf=nc,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * r, r, 1 + pwp), jnp.float32),
        interpret=interpret,
    )(lohi, spans, glob, geom, pay)


def _grid_cols_t(win, w, attrs, positions, grid_size, discard_attr):
    """Channelwise plane columns for a regular-grid depth mesh: the full
    :func:`_planes_from_corners` math rewritten over 1-D [T] arrays built
    straight from [g, g] grid slices, in BLOCK face order (t = f·n² + cell;
    triangle order is semantically free — the y-sort in `_prep_pack`
    reorders anyway and z-test ties resolve by order-independent sums).

    The corners path materializes [T, 3, 4+A] intermediates whose (8, 128)
    TPU tiling inflates every slice/copy ~20×— profiled ~0.95 ms/slot of
    pure data formatting at 384². Here every op is elementwise on [T]
    vectors, which XLA folds into a handful of loop fusions.

    Returns ``(geom_cols, pay_cols, ymin, ymax, valid)`` ready for
    :func:`_prep_pack` (z-validity and the backface-discard plane already
    folded)."""
    from ivid_tpu.ops.geometry import triangulate_face_type

    g = grid_size
    A = attrs.shape[-1]
    ft = triangulate_face_type(positions.reshape(g, g, 3))
    f = ft.reshape(-1)

    def corners(vals):
        """[g, g] vertex grid -> per-face corner values, 3 × [T]. Matches
        geometry.triangulate's faces (tr, tl, ft ? br : bl) and
        (bl, br, ft ? tl : tr), block order (all face-0 then all face-1)."""
        G = vals.reshape(g, g)
        tl = G[:-1, :-1].reshape(-1)
        tr = G[:-1, 1:].reshape(-1)
        bl = G[1:, :-1].reshape(-1)
        br = G[1:, 1:].reshape(-1)
        c0 = jnp.concatenate([tr, bl])
        c1 = jnp.concatenate([tl, br])
        c2 = jnp.concatenate([jnp.where(f, br, bl), jnp.where(f, tl, tr)])
        return c0, c1, c2

    x0, x1, x2 = corners(win[:, 0])
    y0, y1, y2 = corners(win[:, 1])
    z0, z1, z2 = corners(win[:, 2])
    w0, w1, w2 = corners(w)

    valid = (w0 > 1e-6) & (w1 > 1e-6) & (w2 > 1e-6)
    iw0 = 1.0 / jnp.where(w0 > 1e-6, w0, 1.0)
    iw1 = 1.0 / jnp.where(w1 > 1e-6, w1, 1.0)
    iw2 = 1.0 / jnp.where(w2 > 1e-6, w2, 1.0)

    dx10, dy10 = x1 - x0, y1 - y0
    dx20, dy20 = x2 - x0, y2 - y0
    area2 = dx10 * dy20 - dx20 * dy10
    front = area2 > 0.0
    valid = valid & (jnp.abs(area2) > 1e-12)
    sgn = jnp.where(area2 >= 0.0, 1.0, -1.0)
    safe = jnp.where(jnp.abs(area2) > 1e-12, area2, 1.0)

    def edge(px, py, qx, qy):
        dx, dy = qx - px, qy - py
        return -dy * sgn, dx * sgn, (dy * px - dx * py) * sgn

    ea0, eb0, ec0 = edge(x0, y0, x1, y1)
    ea1, eb1, ec1 = edge(x1, y1, x2, y2)
    ea2, eb2, ec2 = edge(x2, y2, x0, y0)

    def plane(f0, f1, f2):
        a = ((f1 - f0) * dy20 - (f2 - f0) * dy10) / safe
        b = ((f2 - f0) * dx10 - (f1 - f0) * dx20) / safe
        return a, b, f0 - a * x0 - b * y0

    za, zb, zc = plane(z0, z1, z2)
    wa, wb, wc = plane(iw0, iw1, iw2)
    aa, ab, ac = [], [], []
    for i in range(A):
        a0, a1, a2 = corners(attrs[:, i])
        pa, pb, pc = plane(a0 * iw0, a1 * iw1, a2 * iw2)
        aa.append(pa)
        ab.append(pb)
        ac.append(pc)

    # Folds (mirrors _pallas_prep): z plane invalid -> const FAR; the
    # backface-padding discard as one plane D = dnum − 0.001·dden.
    za_f = jnp.where(valid, za, 0.0)
    zb_f = jnp.where(valid, zb, 0.0)
    zc_f = jnp.where(valid, zc, _FAR)
    if discard_attr is not None:
        da = aa[discard_attr] - 0.001 * wa
        db = ab[discard_attr] - 0.001 * wb
        dc = ac[discard_attr] - 0.001 * wc
    else:
        T = x0.shape[0]
        da = jnp.zeros((T,))
        db = jnp.zeros((T,))
        dc = jnp.full((T,), -1.0)
    frontf = front.astype(jnp.float32)
    zero = jnp.zeros_like(frontf)

    geom_cols = [
        ea0, eb0, ec0, ea1, eb1, ec1, ea2, eb2, ec2,
        za_f, zb_f, zc_f, da, db, dc, zero, zero, frontf,
    ]
    pay_cols = aa + ab + ac + [wa, wb, wc, frontf]
    ymin = jnp.where(valid, jnp.minimum(jnp.minimum(y0, y1), y2), jnp.inf)
    ymax = jnp.where(valid, jnp.maximum(jnp.maximum(y0, y1), y2), -jnp.inf)
    return geom_cols, pay_cols, ymin, ymax, valid


def _pallas_finish(out, r, npix, A):
    zbuf = out[:, 0]
    acc = out[:, 1:]
    covered = zbuf < 1.5
    cnt = acc[:, 3 * A + 4]
    sel = acc / jnp.maximum(cnt, 1.0)[:, None]
    pid = jnp.arange(npix)
    qx = (pid % r).astype(jnp.float32) + 0.5
    # LOCAL window row (mod r covers the batched multi-buffer layout, where
    # buffer b owns flat pixels [b·r², (b+1)·r²) and planes are per-buffer).
    qy = ((pid // r) % r).astype(jnp.float32) + 0.5
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
