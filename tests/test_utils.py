"""Utility-module tests: image grids, depth colorize, PLY export, summary."""

import numpy as np
import pytest

from ivid_tpu.utils.images import colorize_depth, make_grid, parse_int_list, to8b


def test_parse_int_list():
    assert parse_int_list("0-3,7,10-11") == [0, 1, 2, 3, 7, 10, 11]
    assert parse_int_list("5") == [5]


def test_make_grid_layout():
    imgs = np.zeros((5, 4, 4, 3), np.float32)
    imgs[3] = 1.0
    grid = make_grid(imgs, nrow=3, normalize=False, pad=1)
    assert grid.shape == (2 * 5 + 1, 3 * 5 + 1, 3)
    # Image 3 sits at row 1, col 0.
    assert grid[6:10, 1:5].min() == 1.0
    assert grid[1:5, 1:5].max() == 0.0


def test_colorize_depth_shape_and_range():
    d = np.linspace(-1, 1, 64, dtype=np.float32).reshape(8, 8)
    out = colorize_depth(d)
    assert out.shape == (8, 8, 3)
    assert out.min() >= -1 - 1e-6 and out.max() <= 1 + 1e-6
    batched = colorize_depth(np.stack([d, d])[..., None])
    assert batched.shape == (2, 8, 8, 3)


def test_save_ply_roundtrip(tmp_path):
    from ivid_tpu.ops.plyio import save_ply

    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    col = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    path = tmp_path / "m.ply"
    save_ply(str(path), pos, col, faces)
    data = path.read_bytes()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode()
    assert "element vertex 3" in header and "element face 1" in header
    body = data[header_end:]
    # 3 vertices x (12B xyz + 3B rgb) + 1 face x (1B + 12B).
    assert len(body) == 3 * 15 + 13
    xyz = np.frombuffer(body[:12], "<f4")
    np.testing.assert_array_equal(xyz, [0, 0, 0])
    assert body[12:15] == bytes([255, 0, 0])


def test_mesh_to_ply(tmp_path):
    import jax.numpy as jnp

    from ivid_tpu.ops import geometry as geom
    from ivid_tpu.ops.plyio import mesh_to_ply

    mesh = geom.depth_to_mesh(jnp.full((8, 8, 1), 1.0), fov=60.0)
    img = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
    mesh_to_ply(str(tmp_path / "mesh.ply"), mesh, img)
    assert (tmp_path / "mesh.ply").stat().st_size > 64 * 15


def test_model_summary():
    import jax
    import jax.numpy as jnp

    from ivid_tpu.models import build_adm_unet
    from ivid_tpu.utils.summary import model_summary

    cfg = dict(
        image_size=16, in_channels=4, out_channels=4, model_channels=32,
        num_res_blocks=1, channel_mult=[1, 2], attention_resolutions=[8],
        num_groups=8, num_heads=None, num_head_channels=16,
        num_classes=None, has_null_class=False, dropout=0.0, use_fp16=False,
    )
    model = build_adm_unet(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32)
    )["params"]
    s = model_summary(
        model, params, (jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32), None)
    )
    assert "Total params:" in s
    assert "mid_attn" in s


def test_viewsets_numpy_lookat_matches_camera_op():
    """viewsets builds camera matrices in plain numpy (host-side, avoids
    per-op relay dispatches); it must match ops.camera.look_at exactly."""
    import jax.numpy as jnp

    from ivid_tpu.inference import viewsets as vs
    from ivid_tpu.ops import camera as cam

    rng = np.random.default_rng(0)
    for _ in range(5):
        yaw, pitch = rng.uniform(-0.6, 0.6), rng.uniform(-0.3, 0.3)
        a = vs._orbit(yaw, pitch)
        b = np.asarray(cam.orbit_modelview(yaw, pitch))
        np.testing.assert_allclose(a, b, atol=1e-6)
    np.testing.assert_allclose(
        vs.canonical_view(),
        np.asarray(cam.look_at([0, 0, 1], [0, 0, 0], [0, 1, 0])),
        atol=1e-6,
    )


def test_scene_modelview_layout_normalization():
    """Column-major (glm-pickled reference) modelviews are transposed back;
    row-major ones pass through untouched."""
    from ivid_tpu.inference.scene_io import _normalize_modelview
    from ivid_tpu.inference.viewsets import _orbit

    mv = _orbit(0.3, 0.1)
    np.testing.assert_array_equal(_normalize_modelview(mv), mv)
    np.testing.assert_allclose(_normalize_modelview(mv.T), mv, atol=1e-6)


def test_augment_blur_matches_cv2():
    """gaussian_blur_random_sigma mirrors cv2.GaussianBlur's default
    BORDER_REFLECT_101 border (reference: datasets/base.py:247)."""
    cv2 = pytest.importorskip("cv2")
    import jax
    import jax.numpy as jnp

    from ivid_tpu.ops import image as im_ops

    rng = jax.random.PRNGKey(42)
    sigma = float(jax.random.uniform(rng, ()) + 1e-3)
    img = np.random.default_rng(0).uniform(size=(17, 13, 3)).astype(np.float32)

    got = np.asarray(im_ops.gaussian_blur_random_sigma(rng, jnp.asarray(img)))
    want = cv2.GaussianBlur(img, (3, 3), sigma)
    np.testing.assert_allclose(got, want, atol=2e-6)
