"""On-device z-buffer rasterizer for depth-map grid meshes.

This replaces the reference's native layer — moderngl/EGL raster + GLSL shaders
(reference: rgbd_3d/moderngl_renderer.py, rgbd_3d/shaders/) — with a pure-JAX
sample-scatter rasterizer so the whole conditioning-view loop runs inside one XLA
program on TPU, eliminating the per-view GPU→CPU→OpenGL→CPU round trip that
dominates the reference inference pipeline (reference: inference/sample.py:83-126,
moderngl_renderer.py:318-331).

Algorithm (TPU-first; scatter-based, static shapes):

1. Project vertices to window space (GL viewport conventions: y up, window depth
   ``d = (ndc.z+1)/2`` — affine in screen space, so z-testing on interpolated
   ``d`` matches the GL hardware z-buffer exactly).
2. For each triangle, generate a fixed lattice of barycentric sample points
   (uniform under affine maps, so coverage is uniform for any warp). Depth-map
   meshes have near-unit-sized triangles at SSAA resolution; the only large
   triangles are the statically-known frustum-padding skirt, which gets its own
   pass with a denser lattice.
3. Scatter-min window depth per pixel; a second scatter resolves the winning
   sample's attributes (ties average — equal-depth co-surface samples).
4. Attributes are perspective-correct: interpolate ``attr/w`` and ``1/w``.

Differences from a hardware rasterizer: pixel coverage is sample-based rather
than analytic point-in-triangle, so silhouettes can differ by ≲1 SSAA subpixel;
the downstream 0.75-coverage threshold and LANCZOS downsample
(reference: rgbd_3d/utils.py:387,404-407) operate at 3-5x supersampling, which
absorbs this. Exactness can be tightened by raising samples-per-face.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def exec_platform() -> str:
    """Platform the CURRENT computation executes on.

    Honors the ``jax.default_device`` scope — a host-side CPU program built
    inside a TPU session (loader-worker warp synthesis, data/warp_host.py)
    must pick the CPU raster path even though the process default backend is
    "tpu" (caught live: the tiled resolve traced with interpret=False on a
    CPU placement and failed to lower)."""
    import jax

    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", str(dev))
    return jax.default_backend()



def barycentric_lattice(level: int) -> np.ndarray:
    """``level**2`` sample points uniformly covering the unit triangle, via the
    parallelogram fold: grid points with a+b>1 are mirrored to (1-a, 1-b)."""
    i, j = np.meshgrid(np.arange(level), np.arange(level), indexing="ij")
    a = (i.reshape(-1) + 0.5) / level
    b = (j.reshape(-1) + 0.5) / level
    flip = a + b > 1.0
    a = np.where(flip, 1.0 - a, a)
    b = np.where(flip, 1.0 - b, b)
    return np.stack([1.0 - a - b, a, b], axis=-1).astype(np.float32)  # [S,3]


def project_vertices(
    positions: jnp.ndarray, mvp: jnp.ndarray, render_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Window-space vertices from world positions.

    Returns ``(win [V,3], w [V])`` where ``win = (x_px, y_px, d)`` with y up
    (GL viewport; outputs are flipped to image row order at readback) and
    ``d ∈ [0,1]`` window depth."""
    ones = jnp.ones(positions.shape[:-1] + (1,), positions.dtype)
    clip = jnp.matmul(
        jnp.concatenate([positions, ones], axis=-1), mvp.T,
        precision=jax.lax.Precision.HIGHEST,
    )
    w = clip[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    ndc = clip[..., :3] / safe_w[..., None]
    win = jnp.stack(
        [
            (ndc[..., 0] + 1.0) * 0.5 * render_size,
            (ndc[..., 1] + 1.0) * 0.5 * render_size,
            (ndc[..., 2] + 1.0) * 0.5,
        ],
        axis=-1,
    )
    return win, w


class FragmentBatch(NamedTuple):
    """Flat per-sample fragment data ready for the z-buffer scatter."""

    pixel: jnp.ndarray  # [N] int32 flattened pixel index (row-major, y up)
    depth: jnp.ndarray  # [N] window depth in [0,1]
    attrs: jnp.ndarray  # [N, A] perspective-correct interpolated attributes
    front: jnp.ndarray  # [N] bool front-facing
    valid: jnp.ndarray  # [N] bool


def generate_fragments(
    win: jnp.ndarray,
    w: jnp.ndarray,
    attrs: jnp.ndarray,
    faces: jnp.ndarray,
    render_size: int,
    level: int,
) -> FragmentBatch:
    """Sample ``level**2`` fragments per face with perspective-correct attributes."""
    bary = jnp.asarray(barycentric_lattice(level))  # [S,3]
    fv = win[faces]  # [F,3,3]
    fw = w[faces]  # [F,3]
    fa = attrs[faces]  # [F,3,A]

    # Front-facing via signed area in window space (y up, CCW front;
    # reference: moderngl_renderer.py 'front_face = ccw').
    e1 = fv[:, 1, :2] - fv[:, 0, :2]
    e2 = fv[:, 2, :2] - fv[:, 0, :2]
    area2 = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]  # [F]
    front = area2 > 0.0

    # A face is valid only if fully in front of the camera (no near clipping of
    # partial triangles — acceptable for depth-mesh geometry where the frustum
    # skirt sits at depth 0.1, ahead of the near plane).
    face_valid = jnp.all(fw > 1e-6, axis=-1)

    # Window position and depth are affine in window barycentrics.
    pos = jnp.einsum("sk,fkc->fsc", bary, fv, precision=jax.lax.Precision.HIGHEST)  # [F,S,3]
    # Perspective-correct attributes: interp(attr/w) / interp(1/w).
    inv_w = 1.0 / fw  # [F,3]
    attr_over_w = fa * inv_w[..., None]  # [F,3,A]
    num = jnp.einsum("sk,fka->fsa", bary, attr_over_w, precision=jax.lax.Precision.HIGHEST)
    den = jnp.einsum("sk,fk->fs", bary, inv_w, precision=jax.lax.Precision.HIGHEST)
    interp = num / den[..., None]

    x = jnp.floor(pos[..., 0]).astype(jnp.int32)
    y = jnp.floor(pos[..., 1]).astype(jnp.int32)
    d = pos[..., 2]
    in_bounds = (x >= 0) & (x < render_size) & (y >= 0) & (y < render_size)
    in_depth = (d >= 0.0) & (d <= 1.0)
    valid = in_bounds & in_depth & face_valid[:, None]

    f, s = d.shape
    pixel = jnp.where(valid, y * render_size + x, render_size * render_size)
    return FragmentBatch(
        pixel=pixel.reshape(-1),
        depth=d.reshape(-1),
        attrs=interp.reshape(f * s, -1),
        front=jnp.broadcast_to(front[:, None], (f, s)).reshape(-1),
        valid=valid.reshape(-1),
    )


def resolve_zbuffer_scatter(
    fragments: Sequence[FragmentBatch],
    payloads: Sequence[jnp.ndarray],
    render_size: int,
    num_buffers: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scatter-based depth test (reference semantics; see
    :func:`resolve_zbuffer`). Kept for cross-checking — XLA:TPU scatters
    serialize and dominate render time; the sorted resolve below is the
    production path. ``num_buffers``: see :func:`resolve_zbuffer`."""
    npix = num_buffers * render_size * render_size
    pix = jnp.concatenate([f.pixel for f in fragments])
    d = jnp.concatenate([f.depth for f in fragments])
    valid = jnp.concatenate([f.valid for f in fragments])
    payload = jnp.concatenate(payloads, axis=0)

    d_masked = jnp.where(valid, d, jnp.inf)
    # Pass 1: min depth per pixel (GL depth_func '<', clear depth 1.0).
    zbuf = jnp.full((npix + 1,), jnp.inf, jnp.float32).at[pix].min(d_masked)
    # Pass 2: winners write payload; equal-depth ties average.
    win = valid & (d_masked <= zbuf[pix])
    winf = win.astype(payload.dtype)
    acc = jnp.zeros((npix + 1, payload.shape[-1]), payload.dtype)
    acc = acc.at[pix].add(payload * winf[:, None])
    cnt = jnp.zeros((npix + 1,), payload.dtype).at[pix].add(winf)
    out = acc[:npix] / jnp.maximum(cnt[:npix], 1.0)[:, None]

    covered = jnp.isfinite(zbuf[:npix])
    depth_win = jnp.where(covered, zbuf[:npix], 1.0)

    return _flip_to_image_rows(out, depth_win, covered, render_size, num_buffers)


def _flip_to_image_rows(out, depth_win, covered, render_size, num_buffers):
    """Reshape flat framebuffers and flip GL bottom-up rows to image top-down
    rows (per buffer when batched)."""
    r = render_size
    if num_buffers > 1:
        b = num_buffers
        out = jnp.flip(out.reshape(b, r, r, -1), axis=1)
        depth_win = jnp.flip(depth_win.reshape(b, r, r), axis=1)
        covered = jnp.flip(covered.reshape(b, r, r), axis=1)
        return out, depth_win, covered
    out = jnp.flip(out.reshape(r, r, -1), axis=0)
    depth_win = jnp.flip(depth_win.reshape(r, r), axis=0)
    covered = jnp.flip(covered.reshape(r, r), axis=0)
    return out, depth_win, covered


def resolve_zbuffer(
    fragments: Sequence[FragmentBatch],
    payloads: Sequence[jnp.ndarray],
    render_size: int,
    num_buffers: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Default depth-test resolve.

    ``num_buffers`` > 1 resolves B independent framebuffers in ONE pass:
    fragments carry GLOBAL pixel ids ``b·R² + y·R + x`` and the outputs gain
    a leading buffer axis — batching the per-sample warp renders this way
    amortizes the sort/kernel launches instead of ``lax.map``-ing them.

    On TPU the tile-parallel Pallas kernel (:mod:`ivid_tpu.ops.raster_tiled`)
    is the production path — measured 3.0 ms per 733k-fragment 384² raster on
    v5e vs 25.7 ms for the XLA scatter resolve. On CPU (tests) the scatter
    resolve is the default (Pallas runs interpreted there).

    Override with ``IVID_TPU_RASTER`` ∈ {auto, tiled, scatter}. Two
    retired A/B variants were deleted after the round-3/4 measurement
    campaign settled the production path (ledger, BASELINE.md): a
    sort + segmented-scan pure-XLA resolve (34.9 ms/slot) and a sequential
    VMEM fragment-replay Pallas kernel (40.7 ms/slot) — both dominated by
    the tiled sort+dense-depth-test kernel (3.0 ms).
    """
    import os

    import jax

    choice = os.environ.get("IVID_TPU_RASTER", "auto")
    if choice == "auto":
        choice = "tiled" if exec_platform() == "tpu" else "scatter"
        if choice == "tiled":
            from ivid_tpu.ops import raster_tiled

            npix = num_buffers * render_size * render_size
            # The tiled kernel requires P-aligned framebuffers and exact f32
            # pixel keys (npix < 2^24); fall back rather than assert on
            # non-standard render sizes.
            if npix % raster_tiled.P or npix >= 2**24:
                choice = "scatter"
    if choice == "tiled":
        from ivid_tpu.ops.raster_tiled import resolve_zbuffer_tiled

        return resolve_zbuffer_tiled(
            fragments, payloads, render_size,
            interpret=exec_platform() != "tpu",
            num_buffers=num_buffers,
        )
    return resolve_zbuffer_scatter(
        fragments, payloads, render_size, num_buffers=num_buffers
    )
