"""Forward-backward warping and multi-view condition aggregation, in-graph.

These are the two top-level geometry pipelines of the method, re-designed to run
entirely on-device (the reference round-trips CPU↔OpenGL for both —
rgbd_3d/utils.py:335-417,420-477):

- :func:`forward_backward_warp` synthesizes the conditional model's training
  pairs from still RGBD images: lift to a mesh, render from a jittered pose,
  re-lift, render back, and mask under-covered / depth-edge pixels. The
  reference runs this per-sample inside CPU dataloader workers with a per-worker
  EGL context (reference: datasets/base.py:215-238); here it is a jittable
  function vmapped over the training batch inside the train step.
- :func:`aggregate_conditions` builds the inpainting condition for a novel view
  by fused weighted rendering of all previously generated views.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ivid_tpu.ops import camera as cam
from ivid_tpu.ops import geometry as geom
from ivid_tpu.ops import image as im
from ivid_tpu.ops import renderer as rend


def default_modelview() -> jnp.ndarray:
    """The canonical first-view camera at (0,0,1) looking at the origin
    (reference: rgbd_3d/utils.py:355-360, inference/sample.py:305-309)."""
    return cam.look_at(
        jnp.array([0.0, 0.0, 1.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )


def forward_backward_warp(
    rgbd: jnp.ndarray,
    modelview1: jnp.ndarray,
    modelview0: Optional[jnp.ndarray] = None,
    padding=None,
    fov: float = 45.0,
    near: float = 0.5,
    far: float = 100.0,
    mode: str = "z_buffer",
    atol: float = 0.02,
    rtol: float = 0.02,
    ssaa: int = 3,
    render_near: float = 0.1,
    render_far: float = 200.0,
) -> dict:
    """Warp an RGBD image to ``modelview1`` and back (reference:
    rgbd_3d/utils.py:335-417). ``rgbd`` is [s,s,4] with color in [0,1] and depth
    stored per ``mode`` in [0,1]. Returns ``color``/``depth``/``mask`` at [s,s,·]
    with unseen pixels zeroed. The renderer supersamples by ``ssaa`` with its own
    near/far (reference: datasets/base.py:217-219 — SimpleRenderer(s*3, s, 0.1, 200))."""
    s = rgbd.shape[0]
    render_size = s * ssaa
    if modelview0 is None:
        modelview0 = default_modelview()

    # Lift view0 with the large-padding skirt (reference: base.py:238 padding=s).
    mesh0 = geom.depth_to_mesh(
        geom.linearize_depth(rgbd[..., 3:], near, far, mode),
        padding=padding,
        fov=fov,
        modelview=modelview0,
    )
    has_skirt0 = padding is not None

    # Render from view1. Warp renders a mesh from a JITTERED pose, which
    # stretches screen-space triangle spans — the span-sensitive full-dense
    # per-row raster measured ~2x slower here (pair 20.7 vs 12.2 ms,
    # bench_warp.py), so both warp renders pin the hybrid fragment path.
    res = rend.render_simple(
        mesh0, rgbd[..., :3], modelview1, fov, render_size,
        render_near, render_far, has_skirt=has_skirt0, raster_mode="hybrid",
    )
    color1 = im.resize_lanczos_8bit(res["color"], s)
    depth1 = im.ssaa_subsample(res["depth"], ssaa)

    # Lift view1 (no padding, with discontinuity flags) and render back to view0.
    mesh1 = geom.depth_to_mesh(
        depth1, padding=None, fov=fov, modelview=modelview1, atol=atol, rtol=rtol
    )
    res = rend.render_simple(
        mesh1, color1, modelview0, fov, render_size,
        render_near, render_far, has_skirt=False, raster_mode="hybrid",
    )
    color = im.resize_lanczos_8bit(res["color"], s)
    depth = im.ssaa_subsample(res["depth"], ssaa)
    depth = geom.project_depth(depth, near, far, mode)
    mask = im.coverage_mask(res["mask"], ssaa)
    mask = mask & geom.depth_edge(depth, atol=atol, rtol=rtol)
    maskf = mask.astype(jnp.float32)
    return {"color": color * maskf, "depth": depth * maskf, "mask": maskf}


def forward_backward_warp_batch(
    rgbd: jnp.ndarray,
    modelview1: jnp.ndarray,
    modelview0: Optional[jnp.ndarray] = None,
    padding=None,
    fov: float = 45.0,
    near: float = 0.5,
    far: float = 100.0,
    mode: str = "z_buffer",
    atol: float = 0.02,
    rtol: float = 0.02,
    ssaa: int = 3,
    render_near: float = 0.1,
    render_far: float = 200.0,
) -> dict:
    """B :func:`forward_backward_warp` calls fused into two batched raster
    passes (`renderer.render_simple_batch`): ``rgbd`` [B,s,s,4],
    ``modelview1`` [B,4,4] (``modelview0`` likewise, default canonical). The
    per-sample sorts, resolve kernels, and pixel glue all amortize across the
    batch — this is the cond trainer's warp-synthesis hot path (the reference
    hides it in CPU dataloader workers, datasets/base.py:215-238). Returns
    the same dict with a leading batch axis; semantics match the per-sample
    function (the only difference is fragment summation order inside
    equal-depth ties)."""
    B, s = rgbd.shape[0], rgbd.shape[1]
    render_size = s * ssaa
    if modelview0 is None:
        modelview0 = jnp.broadcast_to(default_modelview(), (B, 4, 4))

    mesh0 = jax.vmap(
        lambda d, mv: geom.depth_to_mesh(
            geom.linearize_depth(d, near, far, mode),
            padding=padding, fov=fov, modelview=mv,
        )
    )(rgbd[..., 3:], modelview0)
    has_skirt0 = padding is not None

    res = rend.render_simple_batch(
        mesh0, rgbd[..., :3], modelview1, fov, render_size,
        render_near, render_far, has_skirt=has_skirt0,
    )
    color1 = jax.vmap(lambda c: im.resize_lanczos_8bit(c, s))(res["color"])
    depth1 = jax.vmap(lambda d: im.ssaa_subsample(d, ssaa))(res["depth"])

    mesh1 = jax.vmap(
        lambda d, mv: geom.depth_to_mesh(
            d, padding=None, fov=fov, modelview=mv, atol=atol, rtol=rtol
        )
    )(depth1, modelview1)
    res = rend.render_simple_batch(
        mesh1, color1, modelview0, fov, render_size,
        render_near, render_far, has_skirt=False,
    )

    def tail(res_color, res_depth, res_mask):
        color = im.resize_lanczos_8bit(res_color, s)
        depth = im.ssaa_subsample(res_depth, ssaa)
        depth = geom.project_depth(depth, near, far, mode)
        mask = im.coverage_mask(res_mask, ssaa)
        mask = mask & geom.depth_edge(depth, atol=atol, rtol=rtol)
        maskf = mask.astype(jnp.float32)
        return {
            "color": color * maskf, "depth": depth * maskf, "mask": maskf
        }

    return jax.vmap(tail)(res["color"], res["depth"], res["mask"])


def aggregate_conditions(
    meshes: geom.Mesh,
    colors: jnp.ndarray,
    valid: jnp.ndarray,
    modelview: jnp.ndarray,
    fov: float = 45.0,
    near: float = 0.5,
    far: float = 100.0,
    mode: str = "z_buffer",
    atol: float = 0.02,
    rtol: float = 0.02,
    erode_rgb: int = 2,
    ssaa: int = 3,
    render_near: float = 0.01,
    render_far: float = 200.0,
) -> dict:
    """Aggregate previously generated views into the condition for a novel view
    (reference: rgbd_3d/utils.py:420-477). ``meshes`` is a stacked Mesh pytree
    (fixed slots, ``valid`` marks live views); ``colors`` [N,s,s,3] in [0,1].

    Returns ``color``/``depth``/``mask``/``mask_rgb``/``depth_convex`` at image
    resolution, depth stored per ``mode``."""
    s = colors.shape[1]
    render_size = s * ssaa

    res = rend.render_aggregation(
        meshes, colors, valid, modelview, fov, render_size,
        render_near, render_far,
    )
    return _condition_tail(res, s, ssaa, near, far, mode, atol, rtol, erode_rgb)


def aggregate_conditions_batch(
    meshes: geom.Mesh,
    colors: jnp.ndarray,
    valid: jnp.ndarray,
    modelview: jnp.ndarray,
    fov: float = 45.0,
    near: float = 0.5,
    far: float = 100.0,
    mode: str = "z_buffer",
    atol: float = 0.02,
    rtol: float = 0.02,
    erode_rgb: int = 2,
    ssaa: int = 3,
    render_near: float = 0.01,
    render_far: float = 200.0,
) -> dict:
    """B samples' :func:`aggregate_conditions` of the SAME novel view in one
    raster launch (meshes/colors carry leading [B, N] axes, ``valid`` [N]
    shared). The slot rasters of the whole sample batch amortize into a
    single batched dense launch (rend.render_aggregation_batch); the tail
    image ops vmap over B."""
    s = colors.shape[2]
    render_size = s * ssaa
    res = rend.render_aggregation_batch(
        meshes, colors, valid, modelview, fov, render_size,
        render_near, render_far,
    )
    return jax.vmap(
        lambda r: _condition_tail(
            r, s, ssaa, near, far, mode, atol, rtol, erode_rgb
        )
    )(res)


def _condition_tail(res, s, ssaa, near, far, mode, atol, rtol, erode_rgb):
    """Condition post-processing shared by the single and batched forms
    (reference: rgbd_3d/utils.py:455-477)."""
    color = im.resize_lanczos_8bit(res["color"], s)
    depth = im.ssaa_subsample(res["depth"], ssaa)
    depth = geom.project_depth(depth, near, far, mode)
    mask = im.coverage_mask(res["mask_depth"], ssaa)
    mask_rgb = im.coverage_mask(res["mask_color"], ssaa)
    depth_convex = depth

    edge = geom.depth_edge(depth, atol=atol, rtol=rtol)
    mask = mask & edge
    # cv2.erode with a (2·erode_rgb−1)² kernel == radius erode_rgb−1
    # (reference: utils.py:464).
    mask_rgb = mask_rgb & (
        geom.erode(mask.astype(jnp.float32), erode_rgb - 1) > 0
    )

    maskf = mask.astype(jnp.float32)
    mask_rgbf = mask_rgb.astype(jnp.float32)
    return {
        "color": color * mask_rgbf,
        "depth": depth * maskf,
        "mask": maskf,
        "mask_rgb": mask_rgbf,
        "depth_convex": depth_convex,
    }
