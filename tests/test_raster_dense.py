"""Unit tests for the dense per-pixel triangle rasterizer (ops/raster_dense)."""

import numpy as np
import jax.numpy as jnp

from ivid_tpu.ops.raster_dense import rasterize_tris_dense


def _brute_force(win, w, attrs, tris, r, discard_attr=None):
    """Reference rasterizer: per pixel center, test every triangle, keep the
    nearest valid candidate (ties averaged)."""
    npix = r * r
    A = attrs.shape[-1]
    out_a = np.zeros((npix, A))
    out_z = np.ones((npix,))
    out_f = np.zeros((npix,), bool)
    cov = np.zeros((npix,), bool)
    for pid in range(npix):
        qx, qy = pid % r + 0.5, pid // r + 0.5
        best_z, winners = None, []
        for t in range(len(tris)):
            p = win[tris[t]]
            fw = w[tris[t]]
            if np.any(fw <= 1e-6):
                continue
            e1 = p[1, :2] - p[0, :2]
            e2 = p[2, :2] - p[0, :2]
            area = e1[0] * e2[1] - e1[1] * e2[0]
            if abs(area) < 1e-12:
                continue
            b = []
            q = np.array([qx, qy])
            for i in range(3):
                a0, a1 = p[i, :2], p[(i + 1) % 3, :2]
                e = (a1[0] - a0[0]) * (q[1] - a0[1]) - (a1[1] - a0[1]) * (q[0] - a0[0])
                b.append(e)
            b = np.array(b) / area
            if np.any(b * np.sign(1.0) < 0):  # bary must be >= 0 (sign folded)
                continue
            lam = np.array([b[1], b[2], b[0]])  # bary for v0, v1, v2
            z = float(lam @ p[:, 2])
            if not (0.0 <= z <= 1.0):
                continue
            inv_w = 1.0 / fw
            den = float(lam @ inv_w)
            aval = (lam @ (attrs[tris[t]] * inv_w[:, None])) / den
            front = area > 0
            if discard_attr is not None and not front and aval[discard_attr] > 0.001:
                continue
            if best_z is None or z < best_z - 1e-9:
                best_z, winners = z, [(aval, front)]
            elif abs(z - best_z) <= 1e-9:
                winners.append((aval, front))
        if best_z is not None:
            cov[pid] = True
            out_z[pid] = best_z
            out_a[pid] = np.mean([wv for wv, _ in winners], axis=0)
            out_f[pid] = sum(f for _, f in winners) * 2 > len(winners)
    return out_a, out_z, out_f, cov


def _random_scene(seed, r, n_tri, behind=False):
    rng = np.random.default_rng(seed)
    v = n_tri * 3
    win = np.zeros((v, 3), np.float32)
    win[:, 0] = rng.uniform(-5, r + 5, v)
    win[:, 1] = rng.uniform(-5, r + 5, v)
    win[:, 2] = rng.uniform(0.05, 0.95, v)
    w = rng.uniform(0.5, 3.0, v).astype(np.float32)
    if behind:
        w[rng.integers(0, v, v // 6)] = 1e-8  # some verts behind the camera
    attrs = rng.uniform(0, 1, (v, 4)).astype(np.float32)
    tris = np.arange(v, dtype=np.int32).reshape(n_tri, 3)
    return win, w, attrs, tris


import pytest


@pytest.mark.parametrize("interpret", [False, True],
                         ids=["xla", "pallas-interpret"])
def test_dense_matches_brute_force(interpret):
    r = 16
    win, w, attrs, tris = _random_scene(0, r, 12)
    got = rasterize_tris_dense(
        jnp.asarray(win), jnp.asarray(w), jnp.asarray(attrs),
        jnp.asarray(tris), r, interpret=interpret,
    )
    ref_a, ref_z, ref_f, ref_c = _brute_force(win, w, attrs, tris, r)
    np.testing.assert_array_equal(np.asarray(got.covered), ref_c)
    np.testing.assert_allclose(np.asarray(got.depth), ref_z, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.attrs), ref_a, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.front), ref_f)


@pytest.mark.parametrize("interpret", [False, True],
                         ids=["xla", "pallas-interpret"])
def test_dense_discard_and_invalid(interpret):
    r = 16
    win, w, attrs, tris = _random_scene(3, r, 16, behind=True)
    got = rasterize_tris_dense(
        jnp.asarray(win), jnp.asarray(w), jnp.asarray(attrs),
        jnp.asarray(tris), r, discard_attr=2, interpret=interpret,
    )
    ref_a, ref_z, ref_f, ref_c = _brute_force(
        win, w, attrs, tris, r, discard_attr=2
    )
    np.testing.assert_array_equal(np.asarray(got.covered), ref_c)
    np.testing.assert_allclose(np.asarray(got.depth), ref_z, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.attrs), ref_a, atol=1e-4)


def test_dense_multichunk_pallas_matches_xla():
    """T > _TC forces multiple kernel chunks; r > _BIG_SPAN produces
    large-span triangles routed to the global tail. The XLA block map is
    the (brute-force-verified) reference."""
    r = 48
    win, w, attrs, tris = _random_scene(7, r, 300, behind=True)
    args = (jnp.asarray(win), jnp.asarray(w), jnp.asarray(attrs),
            jnp.asarray(tris), r)
    got = rasterize_tris_dense(*args, discard_attr=1, interpret=True)
    import os
    os.environ["IVID_TPU_SKIRT_IMPL"] = "xla"
    try:
        ref = rasterize_tris_dense(*args, discard_attr=1)
    finally:
        del os.environ["IVID_TPU_SKIRT_IMPL"]
    np.testing.assert_array_equal(np.asarray(got.covered), np.asarray(ref.covered))
    np.testing.assert_allclose(np.asarray(got.depth), np.asarray(ref.depth),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.attrs), np.asarray(ref.attrs),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.front), np.asarray(ref.front))


@pytest.mark.parametrize("interpret", [False, True],
                         ids=["xla", "pallas-interpret"])
def test_grid_dense_matches_indexed(interpret):
    """rasterize_grid_dense (slice-built corners) must agree with the
    indexed-triangle path over geometry.triangulate's faces."""
    from ivid_tpu.ops import geometry
    from ivid_tpu.ops.raster import project_vertices
    from ivid_tpu.ops import camera as cam
    from ivid_tpu.ops.raster_dense import rasterize_grid_dense

    g, r = 9, 16
    rng = np.random.default_rng(11)
    depth = 1.0 + 0.4 * rng.random((g, g)).astype(np.float32)
    pts, _ = geometry.unproject(jnp.asarray(depth)[..., None])
    positions = pts.reshape(-1, 3)
    mvp = cam.perspective(45.0, 1.0, 0.1, 10.0)
    win, w = project_vertices(positions, jnp.asarray(mvp), r)
    attrs = rng.random((g * g, 5)).astype(np.float32)
    faces = geometry.triangulate(pts)
    ref = rasterize_tris_dense(
        win, w, jnp.asarray(attrs), faces, r,
        discard_attr=3, interpret=interpret,
    )
    got = rasterize_grid_dense(
        win, w, jnp.asarray(attrs), positions, g, r,
        discard_attr=3, interpret=interpret,
    )
    np.testing.assert_array_equal(np.asarray(got.covered), np.asarray(ref.covered))
    np.testing.assert_allclose(np.asarray(got.depth), np.asarray(ref.depth),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.attrs), np.asarray(ref.attrs),
                               atol=1e-5)


def test_dense_empty():
    r = 8
    win = np.array([[0, 0, 0.5], [1, 0, 0.5], [0, 1, 0.5]], np.float32)
    w = np.full((3,), 1e-9, np.float32)  # all behind: nothing rasterizes
    attrs = np.ones((3, 2), np.float32)
    got = rasterize_tris_dense(
        jnp.asarray(win), jnp.asarray(w), jnp.asarray(attrs),
        jnp.asarray([[0, 1, 2]]), r,
    )
    assert not np.asarray(got.covered).any()
    np.testing.assert_array_equal(np.asarray(got.depth), 1.0)
