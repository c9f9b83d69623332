"""Camera math: look-at views, perspective projections, homogeneous transforms.

Replaces the reference's pyglm dependency (reference: inference/sample.py:305-336,
rgbd_3d/utils.py:234-237) with plain jnp 4x4 matrices in standard math (row-vector
free) convention: ``clip = P @ MV @ [x, y, z, 1]^T``. OpenGL conventions are kept —
right-handed eye space looking down ``-z``, NDC z in [-1, 1] — so depth-buffer
semantics match the reference GL pipeline exactly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def look_at(eye, center, up) -> jnp.ndarray:
    """Right-handed view matrix, glm.lookAt-compatible."""
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = (center - eye)
    f = f / jnp.linalg.norm(f)
    s = jnp.cross(f, up)
    s = s / jnp.linalg.norm(s)
    u = jnp.cross(s, f)
    m = jnp.stack([
        jnp.concatenate([s, -jnp.dot(s, eye)[None]]),
        jnp.concatenate([u, -jnp.dot(u, eye)[None]]),
        jnp.concatenate([-f, jnp.dot(f, eye)[None]]),
        jnp.array([0.0, 0.0, 0.0, 1.0]),
    ])
    return m


def perspective(fov_y_deg: float, aspect: float, near: float, far: float) -> jnp.ndarray:
    """Right-handed perspective projection with NDC z in [-1, 1]
    (glm.perspective-compatible; reference: rgbd_3d/moderngl_renderer.py:113)."""
    t = 1.0 / np.tan(np.deg2rad(fov_y_deg) / 2.0)
    return jnp.array([
        [t / aspect, 0, 0, 0],
        [0, t, 0, 0],
        [0, 0, -(far + near) / (far - near), -2.0 * far * near / (far - near)],
        [0, 0, -1.0, 0],
    ], jnp.float32)


def transform_points(m: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 homogeneous transform to [..., 3] points (affine, w dropped)."""
    out = jnp.matmul(pts, m[:3, :3].T, precision=jax.lax.Precision.HIGHEST) + m[:3, 3]
    return out


def transform_points_h(m: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to [..., 3] points, returning homogeneous [..., 4]."""
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    return jnp.matmul(
        jnp.concatenate([pts, ones], axis=-1), m.T,
        precision=jax.lax.Precision.HIGHEST,
    )


def transform_dirs(m: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Rotate direction vectors by the upper 3x3 of a 4x4 transform."""
    return jnp.matmul(dirs, m[:3, :3].T, precision=jax.lax.Precision.HIGHEST)


def inverse(m: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.inv(m)


def camera_position(modelview: jnp.ndarray) -> jnp.ndarray:
    """World-space camera position from a view matrix
    (reference: moderngl_renderer.py:308-310 — ``glm.inverse(mv)[3]``)."""
    return inverse(modelview)[:3, 3]


def orbit_modelview(yaw: float, pitch: float, radius: float = 1.0) -> jnp.ndarray:
    """Camera on a sphere looking at the origin — the viewset/trajectory
    parameterization (reference: inference/sample.py:311-336, render.py:42-60)."""
    eye = jnp.array([
        radius * np.sin(yaw) * np.cos(pitch),
        radius * np.sin(pitch),
        radius * np.cos(yaw) * np.cos(pitch),
    ], jnp.float32)
    return look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
