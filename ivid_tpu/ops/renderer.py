"""Mesh renderers: textured z-buffer raster and weighted multi-view aggregation.

JAX equivalents of the reference's two OpenGL renderers and their GLSL shader
suite (reference: rgbd_3d/moderngl_renderer.py SimpleRenderer:11-148,
AggregationRenderer:151-340; rgbd_3d/shaders/*.{vsh,fsh,csh}), running entirely
on-device:

- :func:`render_simple` — single textured depth-mesh raster with depth test;
  fragment alpha is zeroed on edge flags and backfaces but depth still writes
  (reference: shaders/simple.fsh:13-18).
- :func:`render_aggregation` — each view's mesh is rasterized into its OWN
  z-buffer (occlusion is per-view), then fused per-pixel by view-angle weights
  ``exp(-20·acos(dir·normal))`` with the eroded/edge/padding down-weighting and
  the near-zero-weight depth-max branch of the compute shader
  (reference: shaders/aggregation.fsh:28-49, aggregation.csh:27-38).

Window-depth conventions match GL exactly (affine interpolation of window z,
clear depth 1.0, '<' test), so the linearized readbacks are comparable to the
reference pipeline (reference: moderngl_renderer.py:131-140,318-331).

The frustum-padding skirt (the only large triangles in a depth mesh) is
rasterized in a separate dense quad-lattice pass; interior faces use a compact
triangle lattice sized to the SSAA factor.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ivid_tpu.ops import camera as cam
from ivid_tpu.ops import raster
from ivid_tpu.ops import raster_dense
from ivid_tpu.ops.geometry import Mesh


def _skirt_mode() -> str:
    """``dense`` (default): exact per-pixel raster of the ~1k skirt triangles
    (ops/raster_dense) — removes ~340k lattice fragments (40% of the slot
    raster bill: sort, depth-test chunks, fragment-gen einsums) AND upgrades
    skirt coverage from lattice sampling to exact pixel-center tests.
    ``lattice``: the round-2 dense-quad-lattice sampler (A/B fallback)."""
    import os

    v = os.environ.get("IVID_TPU_SKIRT", "dense")
    assert v in ("dense", "lattice"), v
    return v


def _raster_mode(override: Optional[str] = None) -> str:
    """``full``: the ENTIRE mesh (interior + skirt) goes through ONE
    per-pixel dense Pallas raster (ops/raster_dense.rasterize_grid_dense) —
    no fragment generation, no 516k-fragment sort, no tiled resolve, and
    exact GL pixel-center coverage instead of SSAA lattice sampling.
    ``hybrid``: interior faces via the fragment pipeline + skirt per
    ``IVID_TPU_SKIRT`` (round-2 production path; CPU default — the dense
    panels are O(pixels × triangles) and only pay off on the TPU kernel).
    ``auto`` resolves to full on TPU, hybrid elsewhere.

    ``override`` is a per-call-site choice (e.g. the warp path is measured
    faster hybrid); the ``IVID_TPU_RASTER_MODE`` env var, when set to a
    non-auto value, still wins for A/B runs."""
    import os

    v = os.environ.get("IVID_TPU_RASTER_MODE", "auto")
    assert v in ("auto", "full", "hybrid"), v
    if v == "auto" and override is not None:
        v = override
        assert v in ("auto", "full", "hybrid"), v
    if v == "auto":
        from ivid_tpu.ops.raster import exec_platform

        return "full" if exec_platform() == "tpu" else "hybrid"
    return v


def _ring_face_split(grid_size: int):
    """Static face-index split: (interior_faces, ring_faces). Face ``2k``/
    ``2k+1`` triangulate grid cell ``k`` (geometry.triangulate ordering)."""
    n = grid_size - 1
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ring = (i == 0) | (i == n - 1) | (j == 0) | (j == n - 1)
    cells = np.arange(n * n)
    ring_cells = cells[ring.reshape(-1)]
    int_cells = cells[~ring.reshape(-1)]
    expand = lambda c: np.stack([2 * c, 2 * c + 1], -1).reshape(-1)
    return expand(int_cells), expand(ring_cells)


def _texture_nearest(color: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """GL_NEAREST, clamp-to-edge texture lookup. ``uv.y`` indexes image rows
    directly (texture row v corresponds to data row, moderngl upload order)."""
    s = color.shape[0]
    j = jnp.clip(jnp.floor(uv[..., 0] * s).astype(jnp.int32), 0, s - 1)
    i = jnp.clip(jnp.floor(uv[..., 1] * s).astype(jnp.int32), 0, s - 1)
    return color[i, j]


def _unpacked_flags(flag: jnp.ndarray) -> jnp.ndarray:
    """Unpack the per-vertex flag bits to (edge, padding, eroded) floats, which
    are then interpolated like GL varyings (reference: shaders/aggregation.vsh:26-28)."""
    edge = jnp.mod(flag, 2.0)
    padding = jnp.mod(jnp.floor(flag / 2.0), 2.0)
    eroded = jnp.mod(jnp.floor(flag / 4.0), 2.0)
    return jnp.stack([edge, padding, eroded], axis=-1)


def _quad_fragments(
    win, w, attrs, grid_size: int, render_size: int, cell_mask: np.ndarray,
    level_i: int, level_j: int,
) -> raster.FragmentBatch:
    """Dense bilinear-lattice sampling of a static set of grid cells — the
    frustum-padding skirt, whose quads can span the whole frame. ``level_i``
    samples along each cell's i (row) axis, ``level_j`` along j; the caller
    picks the dense axis to match the cell's screen-space elongation
    (top/bottom skirt cells stretch along i, left/right along j, corners
    both — a single orientation left whole skirt rows at zero coverage)."""
    n = grid_size - 1
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    bi, bj = i[cell_mask], j[cell_mask]
    idx = np.arange(grid_size * grid_size).reshape(grid_size, grid_size)
    tl = idx[bi, bj]
    tr = idx[bi, bj + 1]
    bl = idx[bi + 1, bj]
    br = idx[bi + 1, bj + 1]
    corners = jnp.asarray(np.stack([tl, tr, bl, br], axis=-1))  # [Q,4]

    # ``a`` interpolates tl/tr → bl/br (the i axis), ``b`` along j.
    au = (np.arange(level_i) + 0.5) / level_i
    av = (np.arange(level_j) + 0.5) / level_j
    aa, bb = np.meshgrid(au, av, indexing="ij")
    wts = np.stack(
        [(1 - aa) * (1 - bb), (1 - aa) * bb, aa * (1 - bb), aa * bb], axis=-1
    ).reshape(-1, 4).astype(np.float32)  # [S,4]
    wts = jnp.asarray(wts)

    qv = win[corners]  # [Q,4,3]
    qw = w[corners]  # [Q,4]
    qa = attrs[corners]  # [Q,4,A]

    e1 = qv[:, 1, :2] - qv[:, 0, :2]
    e2 = qv[:, 2, :2] - qv[:, 0, :2]
    area2 = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    # Corner order (tl, tr, bl) has NEGATIVE window area when front-facing under
    # the grid triangulation's CCW convention (top row is +y).
    front = area2 < 0.0
    face_valid = jnp.all(qw > 1e-6, axis=-1)

    pos = jnp.einsum("sk,qkc->qsc", wts, qv, precision=jax.lax.Precision.HIGHEST)
    inv_w = 1.0 / qw
    num = jnp.einsum("sk,qka->qsa", wts, qa * inv_w[..., None], precision=jax.lax.Precision.HIGHEST)
    den = jnp.einsum("sk,qk->qs", wts, inv_w, precision=jax.lax.Precision.HIGHEST)
    interp = num / den[..., None]

    x = jnp.floor(pos[..., 0]).astype(jnp.int32)
    y = jnp.floor(pos[..., 1]).astype(jnp.int32)
    d = pos[..., 2]
    valid = (
        (x >= 0) & (x < render_size) & (y >= 0) & (y < render_size)
        & (d >= 0.0) & (d <= 1.0) & face_valid[:, None]
    )
    q, s = d.shape
    pixel = jnp.where(valid, y * render_size + x, render_size * render_size)
    return raster.FragmentBatch(
        pixel=pixel.reshape(-1),
        depth=d.reshape(-1),
        attrs=interp.reshape(q * s, -1),
        front=jnp.broadcast_to(front[:, None], (q, s)).reshape(-1),
        valid=valid.reshape(-1),
    )


def _raster_mesh(
    mesh: Mesh,
    vertex_attrs: jnp.ndarray,
    modelview: jnp.ndarray,
    projection: jnp.ndarray,
    render_size: int,
    interior_level: int,
    skirt_level: int,
    has_skirt: bool,
    raster_mode: Optional[str] = None,
):
    """Rasterize one mesh: fragment batches plus (dense modes) a triangle
    set for the per-pixel pass. Returns ``(frags, dense)`` where ``dense``
    is ``None`` (lattice mode handles the skirt in ``frags``),
    ``("tris", win, w, skirt_faces)`` (hybrid: skirt only), or
    ``("grid", win, w, grid_size)`` (full: the whole mesh, no fragments)."""
    mvp = projection @ modelview
    win, w = raster.project_vertices(mesh.positions, mvp, render_size)
    grid_size = int(round(np.sqrt(mesh.positions.shape[0])))

    # Full-dense only pays while screen-space triangle spans are small: the
    # per-row kernel's work scales with triangles-per-y-band, so the 130²
    # condition-aggregation mesh (33k tris, pixel-scale tris from near-source
    # views) runs 3.17 ms vs 7.7 ms for the fragment pipeline — but warp
    # meshes have frame-spanning triangles (the padding=128 skirt ring, and
    # stretched interior tris seen from a jittered pose), which blow up
    # per-row trip counts: fwd warp render 11.8 ms dense vs 4.2 hybrid
    # (bench_warp.py). Span-sensitive call sites pass raster_mode="hybrid"
    # explicitly; the tri-count gate is only a backstop against giant meshes
    # where the O(rows x chunks) prefetch scan itself would dominate.
    dense_max = int(os.environ.get("IVID_TPU_DENSE_MAX_TRIS", "100000"))
    if _raster_mode(raster_mode) == "full" and mesh.faces.shape[0] <= dense_max:
        # Meshes without a skirt are still full grids — the padding ring
        # simply isn't flagged; the dense pass rasterizes every face. The
        # grid corner-slice path requires depth_to_mesh's row-major vertex
        # order + triangulate() faces; other meshes (e.g. the quad smoke
        # test) go through the indexed-tris dense path.
        is_grid = (
            grid_size * grid_size == mesh.positions.shape[0]
            and mesh.faces.shape[0] == 2 * (grid_size - 1) ** 2
            and grid_size >= 3
        )
        if is_grid:
            return [], ("grid", win, w, grid_size)
        return [], ("tris", win, w, mesh.faces)

    if has_skirt and _skirt_mode() == "dense":
        int_idx, ring_idx = _ring_face_split(grid_size)
        frags = [
            raster.generate_fragments(
                win, w, vertex_attrs, mesh.faces[jnp.asarray(int_idx)],
                render_size, interior_level,
            )
        ]
        return frags, ("tris", win, w, mesh.faces[jnp.asarray(ring_idx)])

    frags = [
        raster.generate_fragments(
            win, w, vertex_attrs, mesh.faces, render_size, interior_level
        )
    ]
    if has_skirt:  # lattice skirt mode

        n = grid_size - 1
        i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        on_i = (i == 0) | (i == n - 1)
        on_j = (j == 0) | (j == n - 1)
        corner = on_i & on_j
        # Dense axis follows each skirt cell's screen-space elongation.
        for mask, li, lj in (
            (on_i & ~corner, skirt_level, 2),   # top/bottom: stretch along i
            (on_j & ~corner, 2, skirt_level),   # left/right: stretch along j
            (corner, skirt_level, skirt_level),
        ):
            frags.append(
                _quad_fragments(
                    win, w, vertex_attrs, grid_size, render_size, mask, li, lj
                )
            )
    return frags, None


def _dense_raster(dense, attrs, mesh, render_size, discard_attr=None):
    """Run the per-pixel pass described by ``_raster_mesh``'s dense spec."""
    if dense[0] == "tris":
        return raster_dense.rasterize_tris_dense(
            dense[1], dense[2], attrs, dense[3], render_size,
            discard_attr=discard_attr,
        )
    return raster_dense.rasterize_grid_dense(
        dense[1], dense[2], attrs, mesh.positions, dense[3], render_size,
        discard_attr=discard_attr,
    )


def _empty_framebuffer(render_size, k):
    """Cleared (payload, depth_win, covered) buffers for full-dense mode,
    where no fragment batches exist to resolve."""
    r = render_size
    return (
        jnp.zeros((r, r, k)), jnp.ones((r, r)), jnp.zeros((r, r), bool)
    )


def render_simple(
    mesh: Mesh,
    color: jnp.ndarray,
    modelview: jnp.ndarray,
    fov: float = 45.0,
    render_size: int = 384,
    near: float = 0.01,
    far: float = 200.0,
    interior_level: int = 4,
    skirt_level: int = 192,
    has_skirt: bool = True,
    raster_mode: Optional[str] = None,
) -> dict:
    """Textured single-mesh raster (reference: moderngl_renderer.py:91-148 +
    shaders/simple.{vsh,fsh}). Returns ``color`` [R,R,3], ``depth`` [R,R,1]
    linearized with THIS renderer's near/far, ``mask`` [R,R,1] bool.
    ``raster_mode`` overrides the auto full/hybrid choice per call site."""
    flags = _unpacked_flags(mesh.flag)
    attrs = jnp.concatenate([mesh.uv, flags[:, :1]], axis=-1)  # uv, edge
    frags, dense = _raster_mesh(
        mesh, attrs, modelview, cam.perspective(fov, 1.0, near, far),
        render_size, interior_level, skirt_level, has_skirt,
        raster_mode=raster_mode,
    )

    # Payload carries uv, not rgb: the texture lookup happens ONCE per resolved
    # pixel instead of once per fragment (~6x fewer gathers at SSAA density).
    # Reference fragment shader semantics (simple.fsh:12-18): backfaces write
    # vec4(0,0,0,0) — black color AND zero alpha; edge-flagged FRONT faces
    # write (texture, 0) — textured color, zero alpha. Both still write depth.
    payloads = [_simple_payload(f.attrs, f.front) for f in frags]

    if frags:
        payload, depth_win, covered = raster.resolve_zbuffer(
            frags, payloads, render_size
        )
    else:
        payload, depth_win, covered = _empty_framebuffer(render_size, 4)
    if dense is not None:
        sk = _dense_raster(dense, attrs, mesh, render_size)
        sk_payload = _simple_payload(sk.attrs, sk.front)
        payload, depth_win, covered = raster_dense.merge_dense(
            payload, depth_win, covered, sk_payload, sk, render_size
        )
    del covered
    front_mask = payload[..., 3:4] > 0.5
    rgb = _texture_nearest(color, payload[..., 0:2]) * front_mask
    depth = near * far / (far - depth_win * (far - near))
    return {
        "color": rgb,
        "depth": depth[..., None],
        "mask": payload[..., 2:3] > 0.5,
    }


def render_simple_batch(
    mesh: Mesh,
    color: jnp.ndarray,
    modelview: jnp.ndarray,
    fov: float = 45.0,
    render_size: int = 384,
    near: float = 0.01,
    far: float = 200.0,
    interior_level: int = 4,
    has_skirt: bool = True,
) -> dict:
    """B independent :func:`render_simple` calls fused into ONE raster pass
    (the cond trainer's warp synthesis runs one pair per batch sample —
    reference hides this in CPU dataloader workers, datasets/base.py:215-238;
    here the per-sample sorts/kernel launches amortize instead).

    ``mesh`` fields carry a leading batch axis ([B,V,3] positions, [B,F,3]
    faces — topology may differ per sample, the diagonal split is
    data-dependent); ``color`` [B,s,s,3]; ``modelview`` [B,4,4]. Always the
    HYBRID fragment path (warp renders measured faster there — see
    `_raster_mesh`): interior faces become fragments with GLOBAL pixel ids
    ``b·R² + y·R + x`` resolved in one pass (`resolve_zbuffer(num_buffers)`),
    the skirt rings go through one batched per-row dense raster. Returns
    ``color``/``depth``/``mask`` with a leading batch axis."""
    B = mesh.positions.shape[0]
    grid_size = int(round(np.sqrt(mesh.positions.shape[1])))
    npix = render_size * render_size
    proj = cam.perspective(fov, 1.0, near, far)
    win, w = jax.vmap(
        lambda p, mv: raster.project_vertices(p, proj @ mv, render_size)
    )(mesh.positions, modelview)

    flags = _unpacked_flags(mesh.flag)
    attrs = jnp.concatenate([mesh.uv, flags[..., :1]], axis=-1)  # [B,V,3]

    dense_skirt = has_skirt and _skirt_mode() == "dense"
    if dense_skirt:
        int_idx, ring_idx = _ring_face_split(grid_size)
        int_faces = mesh.faces[:, jnp.asarray(int_idx)]
        ring_faces = mesh.faces[:, jnp.asarray(ring_idx)]
    else:
        int_faces, ring_faces = mesh.faces, None

    off = (jnp.arange(B, dtype=jnp.int32) * npix)[:, None]

    def flatten(frag):
        """Sample-local fragments → one batch with GLOBAL pixel ids."""
        return raster.FragmentBatch(
            pixel=jnp.where(frag.valid, frag.pixel + off, B * npix).reshape(-1),
            depth=frag.depth.reshape(-1),
            attrs=frag.attrs.reshape(-1, frag.attrs.shape[-1]),
            front=frag.front.reshape(-1),
            valid=frag.valid.reshape(-1),
        )

    flats = [
        flatten(jax.vmap(
            lambda wn, ww, aa, ff: raster.generate_fragments(
                wn, ww, aa, ff, render_size, interior_level
            )
        )(win, w, attrs, int_faces))
    ]
    if has_skirt and not dense_skirt:  # lattice skirt (A/B fallback)
        n = grid_size - 1
        i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        on_i = (i == 0) | (i == n - 1)
        on_j = (j == 0) | (j == n - 1)
        corner = on_i & on_j
        skirt_level = 192
        for mask, li, lj in (
            (on_i & ~corner, skirt_level, 2),
            (on_j & ~corner, 2, skirt_level),
            (corner, skirt_level, skirt_level),
        ):
            flats.append(flatten(jax.vmap(
                lambda wn, ww, aa: _quad_fragments(
                    wn, ww, aa, grid_size, render_size, mask, li, lj
                )
            )(win, w, attrs)))
    payloads = [_simple_payload(f.attrs, f.front) for f in flats]
    fb, depth_win, covered = raster.resolve_zbuffer(
        flats, payloads, render_size, num_buffers=B
    )

    if ring_faces is not None:
        sk = raster_dense.rasterize_tris_dense_batched(
            win, w, attrs, ring_faces, render_size
        )
        sk_payload = _simple_payload(sk.attrs, sk.front)
        per = lambda x: x.reshape((B, npix) + x.shape[1:])
        skb = raster_dense.DenseRaster(
            attrs=per(sk.attrs), depth=per(sk.depth),
            front=per(sk.front), covered=per(sk.covered),
        )
        fb, depth_win, covered = jax.vmap(
            lambda p, dw, cv, sp, s: raster_dense.merge_dense(
                p, dw, cv, sp, s, render_size
            )
        )(fb, depth_win, covered, per(sk_payload), skb)

    front_mask = fb[..., 3:4] > 0.5
    rgb = jax.vmap(_texture_nearest)(color, fb[..., 0:2]) * front_mask
    depth = near * far / (far - depth_win * (far - near))
    return {
        "color": rgb,
        "depth": depth[..., None],
        "mask": fb[..., 2:3] > 0.5,
    }


def _simple_payload(attrs: jnp.ndarray, front) -> jnp.ndarray:
    """render_simple's fragment payload (uv, alpha, frontness) — see the
    shader-semantics note in :func:`render_simple`."""
    if front.dtype == jnp.bool_:
        frontf = front.astype(jnp.float32)
        alpha = jnp.where(front & (attrs[:, 2] <= 0.999), 1.0, 0.0)
    else:
        frontf = front
        alpha = jnp.where((front > 0.5) & (attrs[:, 2] <= 0.999), 1.0, 0.0)
    return jnp.concatenate(
        [attrs[:, 0:2], alpha[:, None], frontf[:, None]], axis=-1
    )


def _agg_weight_mode() -> str:
    """``fragment`` (default): reference-exact — world position and normal
    ride as varyings and the ``exp(-20·acos(dir·normal))`` weight is computed
    per resolved FRAGMENT (aggregation.fsh:28-35). ``vertex``: the round-2/3
    approximation — weight computed per vertex and interpolated. The GLSL
    oracle (tests/test_aggregation_oracle.py) measured the vertex mode
    shifting blend ratios by >0.05 on ~8% of two-view overlap pixels when
    normals are noisy at face scale; fragment mode costs 5 extra interpolated
    attr channels + per-pixel transcendentals (TPU A/B: bench_agg.py)."""
    v = os.environ.get("IVID_TPU_AGG_WEIGHT", "fragment")
    assert v in ("fragment", "vertex"), v
    return v


def _aggregation_attrs(mesh: Mesh, mode: Optional[str] = None) -> jnp.ndarray:
    """Per-vertex aggregation varyings.

    fragment mode: uv(2), edge/pad/eroded flags(3), world position(3),
    normalized normal(3) — the literal aggregation.vsh varying set (the
    weight is then computed per fragment in :func:`_agg_alpha`).
    vertex mode: uv(2), flags(3), precomputed view-angle weight(1)."""
    flags = _unpacked_flags(mesh.flag)
    nrm = mesh.normal / jnp.maximum(
        jnp.linalg.norm(mesh.normal, axis=-1, keepdims=True), 1e-12
    )
    if (mode or _agg_weight_mode()) == "fragment":
        return jnp.concatenate(
            [mesh.uv, flags, mesh.positions, nrm], axis=-1
        )
    sample_camera = cam.camera_position(mesh.modelview)
    direction = sample_camera[None, :] - mesh.positions
    direction = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-12
    )
    cos = jnp.clip(jnp.sum(direction * nrm, axis=-1), 0.0, 1.0)
    wgt_vertex = jnp.exp(jnp.maximum(-20.0 * jnp.arccos(cos), -50.0))
    return jnp.concatenate([mesh.uv, flags, wgt_vertex[:, None]], axis=-1)


def _agg_alpha_from_attrs(attrs_t, front, sample_camera, mode):
    """Fragment-shader weight from interpolated varyings ``attrs_t`` [A, ...]
    (channel-leading). fragment mode recomputes dir/normal per fragment
    (aggregation.fsh:28-35); vertex mode reads the interpolated weight."""
    edge, padding, eroded = attrs_t[2], attrs_t[3], attrs_t[4]
    if mode == "fragment":
        pos = jnp.moveaxis(attrs_t[5:8], 0, -1)
        nrm = jnp.moveaxis(attrs_t[8:11], 0, -1)
        direction = sample_camera - pos
        direction = direction / jnp.maximum(
            jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-12
        )
        nrm = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12
        )
        cos = jnp.clip(jnp.sum(direction * nrm, axis=-1), 0.0, 1.0)
        wgt_raw = jnp.exp(jnp.maximum(-20.0 * jnp.arccos(cos), -50.0))
    else:
        wgt_raw = attrs_t[5]
    return _agg_alpha(edge, padding, eroded, wgt_raw, front)


def _agg_alpha(edge, padding, eroded, wgt_raw, front):
    """Aggregation fragment-shader weighting clamps (aggregation.fsh:36-49)."""
    wgt = jnp.maximum(wgt_raw, 1e-4)
    wgt = jnp.where(eroded >= 0.999, wgt * 1e-8, wgt)
    wgt = jnp.where((padding > 0.001) | (edge > 0.999), 1e-16, wgt)
    wgt = jnp.maximum(wgt, 1e-16)
    # Backfaces (when not discarded) write depth with zero weight
    # (aggregation.fsh:22-26).
    return jnp.where(front, wgt, 0.0)


def _aggregation_view_buffers_all(
    meshes: Mesh,
    colors: jnp.ndarray,
    modelview: jnp.ndarray,
    projection: jnp.ndarray,
    render_size: int,
):
    """ALL N view slots rastered into their own z-buffers by ONE batched
    per-row dense launch (full-raster mode): the per-slot kernel dispatches
    and the plane-building / texture / weighting glue amortize across the
    slot bucket instead of paying per view. Returns
    (rgb [N,R,R,3], alpha [N,R,R], window depth [N,R,R]) — identical to N
    `_aggregation_view_buffers` calls in full mode."""
    n = meshes.positions.shape[0]
    r = render_size
    mode = _agg_weight_mode()
    grid_size = int(round(np.sqrt(meshes.positions.shape[1])))
    attrs = jax.vmap(lambda m: _aggregation_attrs(m, mode))(meshes)
    # ``modelview``: one shared render camera [4,4], or per-slot [N,4,4]
    # (the batched-over-samples form, where each sample may aim elsewhere).
    mvp = projection @ modelview
    if mvp.ndim == 2:
        win, w = jax.vmap(
            lambda p: raster.project_vertices(p, mvp, r)
        )(meshes.positions)
    else:
        win, w = jax.vmap(
            lambda p, m: raster.project_vertices(p, m, r)
        )(meshes.positions, mvp)
    sample_cams = jax.vmap(cam.camera_position)(meshes.modelview)  # [N,3]
    # (A fused in-kernel aggregation epilogue lived here through round 4;
    # the on-chip A/B measured it LOSING to the cols-prep plane kernel,
    # 4.48 vs 2.92 ms/slot, and it was deleted per the round-4 verdict —
    # numbers in BASELINE.md.)
    sk = raster_dense.rasterize_grid_dense_batched(
        win, w, attrs, meshes.positions, grid_size, r, discard_attr=3
    )
    alpha = jax.vmap(
        lambda a, f, sc: _agg_alpha_from_attrs(
            jnp.moveaxis(a, -1, 0), f, sc, mode
        )
    )(
        sk.attrs.reshape(n, r * r, -1), sk.front.reshape(n, r * r),
        sample_cams,
    ).reshape(n * r * r)
    alpha = jnp.where(sk.covered, alpha, 0.0)
    depth_win = jnp.where(sk.covered, sk.depth, 1.0)
    uv = jnp.flip(sk.attrs[:, 0:2].reshape(n, r, r, 2), axis=1)
    alpha = jnp.flip(alpha.reshape(n, r, r), axis=1)
    depth_win = jnp.flip(depth_win.reshape(n, r, r), axis=1)
    cov = jnp.flip(sk.covered.reshape(n, r, r), axis=1)
    rgb = jax.vmap(_texture_nearest)(colors, uv) * cov[..., None]
    return rgb, alpha, depth_win


def _aggregation_view_buffers(
    mesh: Mesh,
    color: jnp.ndarray,
    modelview: jnp.ndarray,
    projection: jnp.ndarray,
    render_size: int,
    interior_level: int,
    skirt_level: int,
    has_skirt: bool,
):
    """One view's raster into its own z-buffer, with the aggregation fragment
    shader's view-angle weighting (reference: shaders/aggregation.fsh:19-51).
    Returns (rgb [R,R,3], weight alpha [R,R], window depth [R,R])."""
    mode = _agg_weight_mode()
    attrs = _aggregation_attrs(mesh, mode)
    sample_cam = cam.camera_position(mesh.modelview)
    frags, dense = _raster_mesh(
        mesh, attrs, modelview, projection, render_size,
        interior_level, skirt_level, has_skirt,
    )

    def frag_alpha(frag_attrs, front):
        return _agg_alpha_from_attrs(frag_attrs.T, front, sample_cam, mode)

    payloads = []
    new_frags = []
    for f in frags:
        alpha = frag_alpha(f.attrs, f.front)
        # Backface padding fragments discard entirely (no depth write).
        discard = (~f.front) & (f.attrs[:, 3] > 0.001)
        new_frags.append(f._replace(valid=f.valid & ~discard))
        payloads.append(
            jnp.concatenate([f.attrs[:, 0:2], alpha[:, None]], axis=-1)
        )

    if new_frags:
        payload, depth_win, covered = raster.resolve_zbuffer(
            new_frags, payloads, render_size
        )
    else:
        payload, depth_win, covered = _empty_framebuffer(render_size, 3)
    if dense is not None:
        # discard_attr=3: the interpolated padding channel drives the
        # backface-padding discard inside the per-pixel z-test.
        sk = _dense_raster(dense, attrs, mesh, render_size, discard_attr=3)
        sk_alpha = frag_alpha(sk.attrs, sk.front)
        sk_alpha = jnp.where(sk.covered, sk_alpha, 0.0)
        sk_payload = jnp.concatenate(
            [sk.attrs[:, 0:2], sk_alpha[:, None]], axis=-1
        )
        payload, depth_win, covered = raster_dense.merge_dense(
            payload, depth_win, covered, sk_payload, sk, render_size
        )
    rgb = _texture_nearest(color, payload[..., 0:2]) * covered[..., None]
    return rgb, payload[..., 2], depth_win


def render_aggregation(
    meshes: Mesh,
    colors: jnp.ndarray,
    valid: jnp.ndarray,
    modelview: jnp.ndarray,
    fov: float = 45.0,
    render_size: int = 384,
    near: float = 0.01,
    far: float = 200.0,
    interior_level: int = 4,
    skirt_level: int = 192,
    has_skirt: bool = True,
) -> dict:
    """Weighted multi-view fusion render (reference: moderngl_renderer.py:260-340
    + shaders/aggregation.csh).

    ``meshes`` is a stacked Mesh pytree with leading view axis N (fixed slot
    count, like the reference's max_views=27 VBO slots, moderngl_renderer.py:161);
    ``colors`` [N,s,s,3]; ``valid`` [N] bool marks live slots. Returns ``color``
    [R,R,3], ``depth`` [R,R,1] (linearized), ``mask_color``/``mask_depth``
    [R,R,1] bool.
    """
    projection = cam.perspective(fov, 1.0, near, far)
    r = render_size

    # Full-raster mode on grid meshes: ONE batched per-row dense launch
    # rasters every slot's z-buffer (see _aggregation_view_buffers_all);
    # the scan below then only runs the elementwise accumulation. Mirrors
    # _raster_mesh's full-mode gate.
    if _agg_full_gate(meshes):
        bufs = _aggregation_view_buffers_all(
            meshes, colors, modelview, projection, r
        )
        return _accumulate_agg_buffers(bufs, valid, r, near, far)

    def body(state, view):
        mesh, color, is_valid = view
        rgb, alpha, d = _aggregation_view_buffers(
            mesh, color, modelview, projection, r,
            interior_level, skirt_level, has_skirt,
        )
        return _agg_accumulate_step(state, rgb, alpha, d, is_valid), None

    state, _ = jax.lax.scan(body, _agg_init_state(r), (meshes, colors, valid))
    return _agg_readback(state, near, far)


def _agg_full_gate(meshes: Mesh) -> bool:
    """True when the stacked slots are dense-raster-compatible grid meshes and
    full-raster mode is on (mirrors _raster_mesh's full-mode gate)."""
    v_cnt, f_cnt = meshes.positions.shape[-2], meshes.faces.shape[-2]
    g = int(round(np.sqrt(v_cnt)))
    dense_max = int(os.environ.get("IVID_TPU_DENSE_MAX_TRIS", "100000"))
    return (
        _raster_mode() == "full"
        and g * g == v_cnt and f_cnt == 2 * (g - 1) ** 2 and g >= 3
        and f_cnt <= dense_max
    )


def _agg_init_state(r: int):
    return (
        jnp.zeros((r, r, 3)), jnp.zeros((r, r)), jnp.zeros((r, r)),
        jnp.zeros((r, r)), jnp.zeros((r, r)), jnp.zeros((r, r)),
    )


def _agg_accumulate_step(state, rgb, alpha, d, is_valid):
    """One view's aggregation.csh accumulation (reference:
    shaders/aggregation.csh:14-49)."""
    alpha = alpha * is_valid.astype(alpha.dtype)

    acc_rgb, acc_a, acc_d, acc_dw, acc_md, acc_mc = state
    weight_color = alpha
    weight_depth = jnp.where(
        alpha > 1e-14, 1.0, jnp.where(alpha > 0.0, 1e-8, 0.0)
    )
    mask_color = (alpha > 1e-6).astype(jnp.float32)
    mask_depth = (alpha > 1e-14).astype(jnp.float32)

    # Near-zero-weight depth-max branch (aggregation.csh:27-38): while only
    # padding/edge-weight fragments have accumulated, keep the FARTHEST.
    both_pad = (jnp.abs(acc_dw - 1e-8) < 1e-8) & (
        jnp.abs(weight_depth - 1e-8) < 1e-8
    )
    replace = both_pad & (d * 1e-8 > acc_d)

    def upd(acc, new, add):
        return jnp.where(replace, new, jnp.where(both_pad, acc, acc + add))

    contrib_rgb = rgb * weight_color[..., None]
    acc_rgb = jnp.where(
        replace[..., None],
        contrib_rgb,
        jnp.where(both_pad[..., None], acc_rgb, acc_rgb + contrib_rgb),
    )
    acc_a = upd(acc_a, weight_color, weight_color)
    acc_d = upd(acc_d, d * 1e-8, d * weight_depth)
    acc_dw = upd(acc_dw, 1e-8, weight_depth)
    acc_md = acc_md + mask_depth
    acc_mc = acc_mc + mask_color
    return (acc_rgb, acc_a, acc_d, acc_dw, acc_md, acc_mc)


def _agg_readback(state, near, far):
    """Readback normalization (moderngl_renderer.py:318-331)."""
    acc_rgb, acc_a, acc_d, acc_dw, acc_md, acc_mc = state
    color = jnp.where(
        acc_a[..., None] > 0.0, acc_rgb / jnp.maximum(acc_a[..., None], 1e-24), 0.0
    )
    depth_win = jnp.where(acc_dw > 0.0, acc_d / jnp.maximum(acc_dw, 1e-24), 0.0)
    depth = near * far / (far - depth_win * (far - near))
    return {
        "color": color,
        "depth": depth[..., None],
        "mask_color": (acc_mc > 0.5)[..., None],
        "mask_depth": (acc_md > 0.5)[..., None],
    }


def _accumulate_agg_buffers(bufs, valid, r, near, far):
    """Scan the csh accumulation over pre-rastered view buffers
    (rgb [N,R,R,3], alpha [N,R,R], depth [N,R,R])."""

    def body(state, view):
        rgb, alpha, d, is_valid = view
        return _agg_accumulate_step(state, rgb, alpha, d, is_valid), None

    state, _ = jax.lax.scan(body, _agg_init_state(r), bufs + (valid,))
    return _agg_readback(state, near, far)


def render_aggregation_batch(
    meshes: Mesh,
    colors: jnp.ndarray,
    valid: jnp.ndarray,
    modelview: jnp.ndarray,
    fov: float = 45.0,
    render_size: int = 384,
    near: float = 0.01,
    far: float = 200.0,
) -> dict:
    """B samples' aggregation renders in ONE raster launch.
    ``meshes``/``colors`` carry leading [B, N] axes; ``valid`` [N] is shared
    (all samples expose the same live slot count); ``modelview`` is one
    shared render camera [4,4] or per-sample [B,4,4]. Returns the
    :func:`render_aggregation` dict with a leading B axis.

    In full-raster mode all B·N slot z-buffers come from a single batched
    per-row dense launch, amortizing the plane-building / weighting glue
    across the whole batch instead of per sample (the round-3 slot batching,
    extended across the sample axis). Callers bound peak memory by chunking B
    (plane tables + framebuffers are ~8 MB/slot at 384**2)."""
    b, n = colors.shape[0], colors.shape[1]
    r = render_size
    per_sample_mv = modelview.ndim == 3
    if not _agg_full_gate(meshes):
        if per_sample_mv:
            return jax.lax.map(
                lambda mc: render_aggregation(
                    mc[0], mc[1], valid, mc[2], fov, r, near, far
                ),
                (meshes, colors, modelview),
            )
        return jax.lax.map(
            lambda mc: render_aggregation(
                mc[0], mc[1], valid, modelview, fov, r, near, far
            ),
            (meshes, colors),
        )
    projection = cam.perspective(fov, 1.0, near, far)
    flat = jax.tree.map(
        lambda x: x.reshape((b * n,) + x.shape[2:]), meshes
    )
    mv_flat = (
        jnp.repeat(modelview, n, axis=0) if per_sample_mv else modelview
    )
    rgb, alpha, d = _aggregation_view_buffers_all(
        flat, colors.reshape((b * n,) + colors.shape[2:]), mv_flat,
        projection, r,
    )
    bufs = (
        rgb.reshape(b, n, r, r, 3),
        alpha.reshape(b, n, r, r),
        d.reshape(b, n, r, r),
    )
    return jax.vmap(
        lambda bb: _accumulate_agg_buffers(bb, valid, r, near, far)
    )(bufs)


def stack_meshes(meshes: list) -> Mesh:
    """Stack single meshes into a leading-view-axis Mesh pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *meshes)
