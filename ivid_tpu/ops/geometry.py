"""RGBD geometry: depth lifting, grid meshing, discontinuity masks, normals.

JAX re-design of the reference's NumPy geometry kernel library
(reference: rgbd_3d/utils.py:38-332). Everything here is jittable with static
shapes — the regular-grid triangulation is index arithmetic (topology is static,
only the diagonal-split choice is data-dependent, utils.py:113-134), so meshes are
fixed-size pytrees and the whole depth→mesh→render chain can live in one XLA
program. Flag-bit semantics match the GLSL vertex unpacking
(reference: rgbd_3d/shaders/aggregation.vsh:26-28): 1=edge, 2=padding, 4=eroded.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ivid_tpu.ops import camera as cam


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["positions", "uv", "flag", "normal", "faces", "depth", "modelview"],
    meta_fields=["fov"],
)
@dataclasses.dataclass
class Mesh:
    """A depth-map mesh (reference: rgbd_3d/utils.py:144-260 return value).

    ``positions`` are world-space [V,3]; ``uv`` in [0,1]^2 indexes the source
    color image (u → column, v → row); ``flag`` [V] carries the edge/padding/
    eroded bits; ``faces`` [F,3] int32; ``depth`` [H,W,1] is the source
    (unpadded) linearized depth; ``fov`` degrees (static); ``modelview`` [4,4].
    """

    positions: jax.Array
    uv: jax.Array
    flag: jax.Array
    normal: Optional[jax.Array]
    faces: jax.Array
    depth: jax.Array
    modelview: jax.Array
    fov: float = 45.0

    @property
    def num_vertices(self) -> int:
        return self.positions.shape[0]


def linearize_depth(depth, near=0.5, far=100.0, mode="z_buffer"):
    """Map stored depth to metric depth (reference: rgbd_3d/utils.py:38-59)."""
    if mode == "z_buffer":
        depth = jnp.clip(depth, 1e-6, 1.0 - 1e-6)
        return near * far / (far - (far - near) * depth)
    if mode == "linear":
        return near + (far - near) * depth
    raise ValueError(mode)


def project_depth(depth, near=0.5, far=100.0, mode="z_buffer"):
    """Inverse of :func:`linearize_depth` (reference: rgbd_3d/utils.py:62-67)."""
    if mode == "z_buffer":
        depth = jnp.clip(depth, near, far)
        return (1 / near - 1 / depth) / (1 / near - 1 / far)
    if mode == "linear":
        return (depth - near) / (far - near)
    raise ValueError(mode)


def image_uv(image_size: int) -> jnp.ndarray:
    """Pixel-center uv grid [H,W,2] (reference: rgbd_3d/utils.py:70-86)."""
    c = (jnp.arange(image_size, dtype=jnp.float32) + 0.5) / image_size
    u = jnp.broadcast_to(c[None, :], (image_size, image_size))
    v = jnp.broadcast_to(c[:, None], (image_size, image_size))
    return jnp.stack([u, v], axis=-1)


def unproject(depth: jnp.ndarray, fov: float = 45.0):
    """Lift a linearized depth map to camera-space points [H,W,3]
    (reference: rgbd_3d/utils.py:89-110). Image row 0 (top) maps to +y; the
    camera looks down -z. Returns (points, uv)."""
    s = depth.shape[0]
    focal = 0.5 / np.tan(0.5 * np.deg2rad(fov))
    uv = image_uv(s)
    # Ray directions, with the vertical flip of the reference (pts[::-1]):
    # row i takes the ray of grid row s-1-i so the top image row points up.
    x = (uv[..., 0] - 0.5) / focal
    y = ((jnp.flip(uv[..., 1], axis=0)) - 0.5) / focal
    rays = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    return rays * depth, uv


def triangulate_face_type(points: jnp.ndarray) -> jnp.ndarray:
    """Diagonal-split choice per grid cell: True picks the (i,j)-(i+1,j+1)
    diagonal when it is shorter (reference: rgbd_3d/utils.py:113-134)."""
    d_main = jnp.linalg.norm(points[:-1, :-1] - points[1:, 1:], axis=-1)
    d_anti = jnp.linalg.norm(points[:-1, 1:] - points[1:, :-1], axis=-1)
    return d_main < d_anti


def triangulate(points: jnp.ndarray) -> jnp.ndarray:
    """Regular-grid triangulation [2*(S-1)^2, 3] with data-dependent diagonal
    split (reference: rgbd_3d/utils.py:113-134)."""
    s0, s1 = points.shape[:2]
    idx = jnp.arange(s0 * s1, dtype=jnp.int32).reshape(s0, s1)
    ft = triangulate_face_type(points)
    tl, tr = idx[:-1, :-1], idx[:-1, 1:]
    bl, br = idx[1:, :-1], idx[1:, 1:]
    faces = jnp.stack(
        [
            tr.reshape(-1),
            tl.reshape(-1),
            jnp.where(ft, br, bl).reshape(-1),
            bl.reshape(-1),
            br.reshape(-1),
            jnp.where(ft, tl, tr).reshape(-1),
        ],
        axis=-1,
    )
    return faces.reshape(-1, 3)


def mask_discontinuity(faces, depths, atol=0.02, rtol=0.02):
    """Per-face discontinuity mask: large absolute AND inverse-depth spread
    (reference: rgbd_3d/utils.py:137-141)."""
    d = depths.reshape(-1)[faces]  # [F,3]
    diff = d.max(axis=-1) - d.min(axis=-1)
    inv = (1.0 / d).max(axis=-1) - (1.0 / d).min(axis=-1)
    return (diff > atol) & (inv > rtol)


def cal_depth_normal(points: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel normals via Sobel-filtered point differences
    (reference: rgbd_3d/utils.py:263-274)."""
    p = jnp.pad(points, ((1, 1), (1, 1), (0, 0)), mode="edge")
    ex = p[:, 2:] - p[:, :-2]
    ey = p[:-2, :] - p[2:, :]
    ex = (ex[:-2] + 2 * ex[1:-1] + ex[2:]) / 4
    ey = (ey[:, :-2] + 2 * ey[:, 1:-1] + ey[:, 2:]) / 4
    n = jnp.cross(ex, ey)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def cal_mesh_normal(positions: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Angle-weighted vertex normals (reference: rgbd_3d/utils.py:277-308)."""
    p = positions[faces]  # [F,3,3]
    e0 = p[:, 1] - p[:, 0]
    e1 = p[:, 2] - p[:, 1]
    e2 = p[:, 0] - p[:, 2]
    norm = lambda v: v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    e0, e1, e2 = norm(e0), norm(e1), norm(e2)
    fn = norm(jnp.cross(e0, -e2))
    angles = jnp.arccos(
        jnp.clip(
            jnp.stack(
                [
                    jnp.sum(-e0 * e2, axis=-1),
                    jnp.sum(-e0 * e1, axis=-1),
                    jnp.sum(-e1 * e2, axis=-1),
                ],
                axis=-1,
            ),
            -1.0,
            1.0,
        )
    )  # [F,3]
    v = positions.shape[0]
    contrib = fn[:, None, :] * angles[:, :, None]  # [F,3,3]
    normals = jnp.zeros((v, 3), positions.dtype).at[faces.reshape(-1)].add(
        contrib.reshape(-1, 3)
    )
    return normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)


def depth_edge(depth: jnp.ndarray, atol=0.02, rtol=0.02) -> jnp.ndarray:
    """4-direction depth-edge vote; True where depth is NOT an edge
    (reference: rgbd_3d/utils.py:311-332 — returns ``mask < 3``)."""

    def diff(x, y):
        x = jnp.maximum(x, 1e-6)
        y = jnp.maximum(y, 1e-6)
        return ((jnp.abs(x - y) > atol) & (jnp.abs(1 / x - 1 / y) > rtol)).astype(
            jnp.uint8
        )

    h, w = depth.shape[:2]
    d = depth[..., 0] if depth.ndim == 3 else depth
    mask = jnp.zeros((h, w), jnp.uint8)
    m = diff(d[:, 1:], d[:, :-1])
    mask = mask.at[:, 1:].add(m).at[:, :-1].add(m)
    m = diff(d[1:, :], d[:-1, :])
    mask = mask.at[1:, :].add(m).at[:-1, :].add(m)
    m = diff(d[1:, 1:], d[:-1, :-1])
    mask = mask.at[1:, 1:].add(m).at[:-1, :-1].add(m)
    m = diff(d[1:, :-1], d[:-1, 1:])
    mask = mask.at[1:, :-1].add(m).at[:-1, 1:].add(m)
    return (mask < 3)[..., None]


def erode(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Morphological erosion (min-filter) with a (2r+1)^2 ones kernel, matching
    cv2.erode's border handling (border does not erode)."""
    if radius <= 0:
        return mask
    k = 2 * radius + 1
    squeeze = mask.ndim == 3
    m = mask[..., 0] if squeeze else mask
    out = jax.lax.reduce_window(
        m.astype(jnp.float32), jnp.inf, jax.lax.min, (k, k), (1, 1), "SAME"
    )
    return out[..., None] if squeeze else out


def depth_to_mesh(
    depth: jnp.ndarray,
    padding: Union[None, float, str] = None,
    fov: float = 45.0,
    modelview: Optional[jnp.ndarray] = None,
    atol: Optional[float] = None,
    rtol: Optional[float] = None,
    erode_rgb: Optional[int] = None,
    cal_normal: bool = False,
) -> Mesh:
    """Lift a linearized depth map to a world-space grid mesh with flags
    (reference: rgbd_3d/utils.py:144-260).

    ``padding``: None, a pixel count (border ring pushed outward in the image
    plane), or ``'frustum'`` (border ring pushed out one pixel then pulled to
    depth 0.1 along the ray — a near-plane skirt that keeps novel views inside
    the original frustum conditioned, utils.py:190-200).
    """
    s = depth.shape[0]
    if depth.ndim == 2:
        depth = depth[..., None]
    image_plane_size = 2 * np.tan(0.5 * np.deg2rad(fov))
    points, uv = unproject(depth, fov)
    normal = cal_depth_normal(points) if cal_normal else None
    src_depth = depth

    if padding is not None:
        points = jnp.pad(points, ((1, 1), (1, 1), (0, 0)), mode="edge")
        uv = jnp.pad(uv, ((1, 1), (1, 1), (0, 0)), mode="edge")
        depth = jnp.pad(depth, ((1, 1), (1, 1), (0, 0)), mode="edge")
        if cal_normal:
            normal = jnp.pad(normal, ((1, 1), (1, 1), (0, 0)), mode="edge")
        ppp = image_plane_size / s
        if padding != "frustum":
            ppp = padding * ppp
        points = points.at[0, :, 1].add(ppp * depth[0, :, 0])
        points = points.at[-1, :, 1].add(-ppp * depth[-1, :, 0])
        points = points.at[:, 0, 0].add(-ppp * depth[:, 0, 0])
        points = points.at[:, -1, 0].add(ppp * depth[:, -1, 0])
        if padding == "frustum":
            # Pull the skirt to depth 0.1 along each ray (utils.py:196-200).
            pull = lambda p: p * (-0.1 / p[..., 2:])
            points = points.at[0, :].set(pull(points[0, :]))
            points = points.at[-1, :].set(pull(points[-1, :]))
            points = points.at[:, 0].set(pull(points[:, 0]))
            points = points.at[:, -1].set(pull(points[:, -1]))
        padding_flag = jnp.zeros((s + 2, s + 2), bool)
        padding_flag = padding_flag.at[0, :].set(True).at[-1, :].set(True)
        padding_flag = padding_flag.at[:, 0].set(True).at[:, -1].set(True)
        s_out = s + 2
    else:
        padding_flag = jnp.zeros((s, s), bool)
        s_out = s

    faces = triangulate(points)
    positions = points.reshape(-1, 3)
    uv = uv.reshape(-1, 2)
    flat_depth = depth.reshape(-1)
    padding_flag = padding_flag.reshape(-1)
    if cal_normal:
        normal = normal.reshape(-1, 3)

    v = s_out * s_out
    discontinuity_flag = jnp.zeros((v,), bool)
    if atol is not None or rtol is not None:
        face_mask = mask_discontinuity(
            faces, flat_depth, atol=atol or 0.0, rtol=rtol or 0.0
        )
        discontinuity_flag = discontinuity_flag.at[faces.reshape(-1)].max(
            jnp.repeat(face_mask, 3)
        )

    if modelview is not None:
        c2w = cam.inverse(modelview)
        positions = cam.transform_points(c2w, positions)
        if cal_normal:
            normal = cam.transform_dirs(c2w, normal)
    else:
        modelview = jnp.eye(4, dtype=jnp.float32)

    erosion_flag = jnp.zeros((v,), bool)
    if erode_rgb is not None and erode_rgb > 0:
        keep = (~discontinuity_flag).astype(jnp.float32).reshape(s_out, s_out)
        keep = erode(keep, erode_rgb)
        erosion_flag = (keep.reshape(-1) == 0)

    flag = (
        1.0 * discontinuity_flag.astype(jnp.float32)
        + 2.0 * padding_flag.astype(jnp.float32)
        + 4.0 * erosion_flag.astype(jnp.float32)
    )

    return Mesh(
        positions=positions,
        uv=uv,
        flag=flag,
        normal=normal,
        faces=faces,
        depth=src_depth,
        modelview=modelview,
        fov=float(fov),
    )
