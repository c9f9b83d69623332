"""Analytic tests for the RGBD geometry library (reference math:
rgbd_3d/utils.py — the reference cannot be imported here because pyglm/cv2-gl
are not installed, so expected values are derived analytically)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ivid_tpu.ops import camera as cam
from ivid_tpu.ops import geometry as geom


def test_linearize_project_roundtrip():
    d = jnp.linspace(0.01, 0.99, 50)
    for mode in ["z_buffer", "linear"]:
        z = geom.linearize_depth(d, 0.5, 100.0, mode)
        d2 = geom.project_depth(z, 0.5, 100.0, mode)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-4)
    # z_buffer endpoints: 0 -> near, 1 -> far.
    np.testing.assert_allclose(
        float(geom.linearize_depth(jnp.array(0.0), 0.5, 100.0)), 0.5, rtol=1e-4
    )
    np.testing.assert_allclose(
        float(geom.linearize_depth(jnp.array(1.0), 0.5, 100.0)), 100.0, rtol=1e-3
    )


def test_unproject_geometry():
    s = 8
    depth = jnp.full((s, s, 1), 2.0)
    pts, uv = geom.unproject(depth, fov=90.0)
    # fov 90: focal = 0.5 → image plane half-extent 1 at unit depth.
    # Top-left pixel (row 0, col 0): x negative, y positive, z = -depth.
    assert pts[0, 0, 0] < 0 and pts[0, 0, 1] > 0
    np.testing.assert_allclose(np.asarray(pts[..., 2]), -2.0, atol=1e-6)
    # Center symmetric: pixel centers straddle 0.
    np.testing.assert_allclose(float(pts[:, s // 2 - 1, 0] + pts[:, s // 2, 0]).real if False else float(pts[0, s // 2 - 1, 0] + pts[0, s // 2, 0]), 0.0, atol=1e-6)
    # Extent: outermost pixel center at ±(1 - 1/s) * tan(fov/2) * depth.
    np.testing.assert_allclose(
        float(pts[0, -1, 0]), (1 - 1 / s) * 1.0 * 2.0, rtol=1e-5
    )
    # uv is unflipped pixel centers.
    np.testing.assert_allclose(float(uv[0, 0, 0]), 0.5 / s)
    np.testing.assert_allclose(float(uv[0, 0, 1]), 0.5 / s)


def test_triangulate_matches_reference_formula():
    """Re-derive the reference triangulation (rgbd_3d/utils.py:113-134) in numpy
    and compare on random points."""
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(5, 4, 3)).astype(np.float32)

    indices = np.arange(pts.shape[0] * pts.shape[1]).reshape(pts.shape[:2])
    ft = (
        np.linalg.norm(pts[:-1, :-1] - pts[1:, 1:], axis=-1)
        < np.linalg.norm(pts[:-1, 1:] - pts[1:, :-1], axis=-1)
    )
    expected = np.stack(
        [
            indices[:-1, 1:].reshape(-1),
            indices[:-1, :-1].reshape(-1),
            np.where(ft, indices[1:, 1:], indices[1:, :-1]).reshape(-1),
            indices[1:, :-1].reshape(-1),
            indices[1:, 1:].reshape(-1),
            np.where(ft, indices[:-1, :-1], indices[:-1, 1:]).reshape(-1),
        ],
        axis=-1,
    ).reshape(-1, 3)

    got = np.asarray(geom.triangulate(jnp.asarray(pts)))
    np.testing.assert_array_equal(got, expected)


def test_depth_edge():
    d = np.full((8, 8, 1), 1.0, np.float32)
    d[:, 4:] = 3.0  # strong vertical edge
    keep = np.asarray(geom.depth_edge(jnp.asarray(d), atol=0.02, rtol=0.02))
    # Columns 3 and 4 adjoin the edge; votes: col 3 gets horiz+2 diag = 3 → masked.
    assert not keep[2:6, 3].any() and not keep[2:6, 4].any()
    assert keep[:, :3].all() and keep[:, 5:].all()


def test_depth_to_mesh_flat_plane():
    s = 16
    depth = jnp.full((s, s, 1), 1.0)
    mesh = geom.depth_to_mesh(depth, padding=None, fov=90.0)
    assert mesh.positions.shape == (s * s, 3)
    assert mesh.faces.shape == (2 * (s - 1) ** 2, 3)
    np.testing.assert_allclose(np.asarray(mesh.positions[:, 2]), -1.0, atol=1e-6)
    assert np.asarray(mesh.flag).sum() == 0

    # With frustum padding: skirt vertices pulled to depth 0.1 (utils.py:196-200).
    mesh_p = geom.depth_to_mesh(depth, padding="frustum", fov=90.0)
    assert mesh_p.positions.shape == ((s + 2) ** 2, 3)
    pos = np.asarray(mesh_p.positions).reshape(s + 2, s + 2, 3)
    np.testing.assert_allclose(pos[0, :, 2], -0.1, atol=1e-6)
    np.testing.assert_allclose(pos[:, -1, 2], -0.1, atol=1e-6)
    np.testing.assert_allclose(pos[1:-1, 1:-1, 2], -1.0, atol=1e-6)
    flag = np.asarray(mesh_p.flag).reshape(s + 2, s + 2)
    assert (flag[0] == 2).all() and (flag[:, 0] == 2).all()
    assert (flag[1:-1, 1:-1] == 0).all()


def test_depth_to_mesh_discontinuity_and_erosion():
    s = 16
    d = np.full((s, s, 1), 1.0, np.float32)
    d[:, 8:] = 3.0
    mesh = geom.depth_to_mesh(jnp.asarray(d), atol=0.02, rtol=0.02, erode_rgb=1)
    flag = np.asarray(mesh.flag).reshape(s, s)
    edge = np.mod(flag, 2)
    eroded = np.mod(np.floor(flag / 4), 2)
    # The two columns spanning the jump are edge-flagged.
    assert edge[:, 7].all() and edge[:, 8].all()
    assert not edge[:, :7].any() and not edge[:, 9:].any()
    # Erosion grows by one: columns 6 and 9 eroded too.
    assert eroded[:, 6].all() and eroded[:, 9].all()
    assert not eroded[:, :6].any() and not eroded[:, 10:].any()


def test_depth_to_mesh_modelview_transform():
    s = 8
    depth = jnp.full((s, s, 1), 1.0)
    mv = cam.look_at(jnp.array([0.0, 0.0, 1.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    mesh = geom.depth_to_mesh(depth, modelview=mv, fov=90.0)
    # Camera at (0,0,1) looking at origin: camera-space plane z=-1 → world z=0.
    np.testing.assert_allclose(np.asarray(mesh.positions[:, 2]), 0.0, atol=1e-5)


def test_normals_flat_plane_face_camera():
    s = 8
    depth = jnp.full((s, s, 1), 1.0)
    mesh = geom.depth_to_mesh(depth, fov=60.0, cal_normal=True)
    n = np.asarray(mesh.normal)
    np.testing.assert_allclose(n[:, 2], 1.0, atol=1e-5)


def test_camera_look_at_perspective():
    mv = cam.look_at(jnp.array([0.0, 0.0, 1.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    # Origin maps to (0,0,-1) in eye space.
    np.testing.assert_allclose(
        np.asarray(cam.transform_points(mv, jnp.zeros((1, 3)))), [[0, 0, -1]], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(cam.camera_position(mv)), [0, 0, 1], atol=1e-6)
    p = cam.perspective(90.0, 1.0, 0.1, 100.0)
    # Point at eye depth = near maps to ndc z = -1; far → +1.
    for z, expect in [(-0.1, -1.0), (-100.0, 1.0)]:
        clip = p @ jnp.array([0.0, 0.0, z, 1.0])
        np.testing.assert_allclose(float(clip[2] / clip[3]), expect, atol=1e-4)
