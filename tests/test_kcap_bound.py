"""Numerical measurement of the K-nearest-view aggregation cap (--max_agg_views).

The pipeline's K-cap aggregates only the K angularly-nearest prior views per
novel view. The ``exp(-20·acos(d·n))`` falloff
(reference: rgbd_3d/shaders/aggregation.fsh:28-35) makes far views negligible
for COLOR — but the compute shader accumulates DEPTH with a binary weight
(1.0 for ANY view whose color weight exceeds 1e-14, aggregation.csh:19), so
every view within ~1.6 rad contributes depth equally and the cap is NOT a
small perturbation of the depth/mask conditioning on wide-baseline viewsets.

This test measures that on a geometrically consistent synthetic scene (an
analytically ray-traced textured sphere + enclosing background sphere seen
from the full 3x9 orbit — every view agrees on the world, like real pipeline
outputs) at the LAST (hardest) novel view, and asserts the calibrated facts:
the deviation is substantial at K=8 and shrinks monotonically with K.

Measured on TPU at the production 128² resolution (2026-08-17; this file at
IVID_TPU_KCAP_SIZE=128):

    K=8 : mask flips 26.7% of px, color mean|Δ| 0.102, depth mean|Δ| 0.096
    K=12: mask 15.1%, color 0.056, depth 0.055
    K=16: mask  5.2%, color 0.026, depth 0.024

These numbers are cited in sample.py's --max_agg_views help: the cap is a
LOSSY speed knob on wide-baseline viewsets, not an exact shortcut (exactness
holds only for K >= live views, tests/test_pipeline.py).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ivid_tpu.inference import viewsets as vs
from ivid_tpu.inference.pipeline import select_nearest_views
from ivid_tpu.ops import geometry as geom
from ivid_tpu.ops import warp as warp_ops

SIZE = int(os.environ.get("IVID_TPU_KCAP_SIZE", "48"))
FOV, NEAR, FAR = 45.0, 0.6, 5.0
SPHERE_R = 0.35
BG_R = 3.0  # world-anchored background sphere; inside [NEAR, FAR] from r=1 orbit


def _sphere_view(mv: np.ndarray, size: int) -> np.ndarray:
    """Analytic RGBD of a world-anchored textured sphere from modelview ``mv``.

    Returns [s, s, 4] in [0,1]: rgb + z_buffer-encoded depth, row 0 = top
    (image convention used by the datasets/pipeline)."""
    rot, t = mv[:3, :3], mv[:3, 3]
    half = np.tan(np.radians(FOV) / 2)
    # Pixel centers; +y up in camera space, image row 0 at the top.
    xs = (np.arange(size) + 0.5) / size * 2 - 1
    ys = 1 - (np.arange(size) + 0.5) / size * 2
    xx, yy = np.meshgrid(xs * half, ys * half, indexing="xy")
    d = np.stack([xx, yy, -np.ones_like(xx)], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    c = (mv @ np.array([0.0, 0.0, 0.0, 1.0]))[:3]  # world origin in camera coords
    b = np.einsum("hwc,c->hw", d, c)
    disc = b * b - (np.dot(c, c) - SPHERE_R ** 2)
    hit = disc > 0
    s_hit = b - np.sqrt(np.maximum(disc, 0.0))
    hit = hit & (s_hit > 0)

    # Background: a world-anchored ENCLOSING sphere (radius BG_R around the
    # origin), so every view agrees on the same world geometry — a flat
    # per-view backdrop would make the far views genuinely disagree and the
    # K-cap comparison meaningless.
    s_bg = b + np.sqrt(np.maximum(b * b - (np.dot(c, c) - BG_R ** 2), 0.0))
    s_all = np.where(hit, s_hit, s_bg)
    eye_depth = -s_all * d[..., 2]

    p_cam = s_all[..., None] * d
    p_world = np.einsum("ij,hwj->hwi", rot.T, p_cam - t)
    freq = np.where(hit[..., None], np.array([9.0, 11.0, 13.0]), np.array([2.0, 2.5, 3.0]))
    rgb = 0.5 + 0.5 * np.sin(
        p_world * freq + np.array([0.0, 1.0, 2.0])
    )
    zbuf = np.asarray(
        geom.project_depth(eye_depth[..., None], NEAR, FAR, "z_buffer")
    )
    return np.concatenate([rgb, zbuf], axis=-1).astype(np.float32)


def test_kcap_aggregation_deviation():
    mvs = np.stack(vs.build_viewset("3x9", 1), axis=0).astype(np.float32)  # [27,4,4]
    n_prior = 26
    views = np.stack([_sphere_view(mvs[j], SIZE) for j in range(n_prior)], 0)

    def lift(rgbd, mv):
        return geom.depth_to_mesh(
            geom.linearize_depth(rgbd[..., 3:], NEAR, FAR),
            padding="frustum", fov=FOV, modelview=mv,
            atol=0.03, rtol=0.03, erode_rgb=3, cal_normal=True,
        )

    meshes = jax.vmap(lift)(jnp.asarray(views), jnp.asarray(mvs[:n_prior]))
    colors = jnp.asarray(views[..., :3])
    target = jnp.asarray(mvs[26])

    agg = jax.jit(
        lambda m, c, v: warp_ops.aggregate_conditions(
            m, c, v, target, fov=FOV, near=NEAR, far=FAR,
            atol=0.03, rtol=0.03, erode_rgb=3, ssaa=3,
        )
    )

    full = jax.device_get(agg(meshes, colors, jnp.ones((n_prior,), bool)))

    report = {}
    for k in (8, 16):
        idx = select_nearest_views(mvs[None], 26, k)[0]
        take = lambda x: x[jnp.asarray(idx)]
        capped = jax.device_get(
            agg(jax.tree.map(take, meshes), take(colors), jnp.ones((k,), bool))
        )
        report[k] = {
            key: float(np.abs(full[key] - capped[key]).mean())
            for key in ["color", "depth", "mask", "mask_rgb", "depth_convex"]
        }
        print(f"\nK={k} vs all-{n_prior} mean|Δ| at {SIZE}²: " + " ".join(
            f"{key}={v:.4f}" for key, v in report[k].items()
        ))

    # Calibrated facts (see module docstring): the cap is LOSSY — the binary
    # depth weights make dropped views matter — and its error shrinks with K.
    assert report[8]["mask"] > 0.05, report  # substantial at K=8, by design
    for key in ["color", "depth", "mask"]:
        assert report[16][key] < report[8][key] * 0.8, (key, report)
    # Sanity ceiling: even the worst cap stays bounded on a consistent scene.
    for k in report:
        assert report[k]["mask"] < 0.5 and report[k]["color"] < 0.25, report
