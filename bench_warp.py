"""Per-component timing of the cond trainer's warp synthesis on TPU.

Times, for ONE sample (K-rep in-program scan, varied input, dispatch floor
subtracted): the full forward_backward_warp, each of its two render_simple
calls in isolation, and the InpaintTrainer augment tail — so the cond-step
warp bill (reference hides it in CPU dataloader workers,
datasets/base.py:215-238) is attributable per stage and per raster mode.

Run: [IVID_TPU_RASTER_MODE=hybrid] python bench_warp.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from ivid_tpu.ops import camera as cam
from ivid_tpu.ops import geometry as geom
from ivid_tpu.ops import image as im
from ivid_tpu.ops import renderer as rend
from ivid_tpu.ops import warp as warp_ops

K = 8
S = 128


def timed(fn, *args):
    """Best-of-3 of a jitted K-rep scan, floor-subtracted, per-rep ms."""
    jfn = jax.jit(fn)
    _ = float(jfn(jnp.int32(0), *args))

    @jax.jit
    def nop(seed):
        return jnp.sum(seed * jnp.ones((8, 128)))

    _ = float(nop(jnp.int32(0)))
    t0 = time.perf_counter()
    for r in range(5):
        _ = float(nop(jnp.int32(r + 1)))
    floor = (time.perf_counter() - t0) / 5

    best = 1e9
    for r in range(3):
        t0 = time.perf_counter()
        _ = float(jfn(jnp.int32(r + 1), *args))
        best = min(best, time.perf_counter() - t0)
    return (best - floor) / K * 1e3


def main():
    print(f"device: {jax.devices()[0]}  "
          f"mode={os.environ.get('IVID_TPU_RASTER_MODE', 'auto')}")
    rgbd = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(0), (S, S, 4)), 0.01, 0.99
    )
    mv0 = warp_ops.default_modelview()
    mv1 = cam.orbit_modelview(0.2, 0.1)
    rs = S * 3

    def scan(body):
        def fn(seed):
            def step(c, i):
                out = body((i + seed).astype(jnp.float32) * 1e-6)
                return c + jnp.sum(jax.tree.leaves(out)[0]), None

            total, _ = jax.lax.scan(step, 0.0, jnp.arange(K, dtype=jnp.int32))
            return total

        return fn

    # Full warp pair.
    t = timed(scan(lambda e: warp_ops.forward_backward_warp(
        rgbd + e, mv1, padding=S, near=0.5, far=100.0)))
    print(f"forward_backward_warp (pair):        {t:7.2f} ms")

    # Stage 1: lift + forward render (skirted mesh, novel view).
    mesh0 = geom.depth_to_mesh(
        geom.linearize_depth(rgbd[..., 3:], 0.5, 100.0), padding=S,
        fov=45.0, modelview=mv0,
    )

    t = timed(scan(lambda e: geom.depth_to_mesh(
        geom.linearize_depth(rgbd[..., 3:] + e, 0.5, 100.0), padding=S,
        fov=45.0, modelview=mv0).positions))
    print(f"depth_to_mesh (view0, skirt):        {t:7.2f} ms")

    t = timed(scan(lambda e: rend.render_simple(
        mesh0, rgbd[..., :3] + e, mv1, 45.0, rs, 0.1, 200.0,
        has_skirt=True)["color"]))
    print(f"render_simple fwd (skirt mesh):      {t:7.2f} ms")

    # Stage 2: re-lift at S and backward render.
    res = rend.render_simple(
        mesh0, rgbd[..., :3], mv1, 45.0, rs, 0.1, 200.0, has_skirt=True
    )
    color1 = im.resize_lanczos_8bit(res["color"], S)
    depth1 = im.ssaa_subsample(res["depth"], 3)
    mesh1 = geom.depth_to_mesh(
        depth1, padding=None, fov=45.0, modelview=mv1, atol=0.02, rtol=0.02
    )

    t = timed(scan(lambda e: rend.render_simple(
        mesh1, color1 + e, mv0, 45.0, rs, 0.1, 200.0,
        has_skirt=False)["color"]))
    print(f"render_simple bwd (flagged mesh):    {t:7.2f} ms")

    t = timed(scan(lambda e: im.resize_lanczos_8bit(res["color"] + e, S)))
    print(f"resize_lanczos_8bit (384->128):      {t:7.2f} ms")

    # Batched warp groups (the trainer's production path): per-sample ms.
    for g in (4, 8):
        rgbds = jnp.stack([rgbd + 0.001 * i for i in range(g)])
        mv1s = jnp.stack(
            [cam.orbit_modelview(0.2 + 0.02 * i, 0.1) for i in range(g)]
        )
        t = timed(scan(lambda e: warp_ops.forward_backward_warp_batch(
            rgbds + e, mv1s, padding=S, near=0.5, far=100.0)))
        print(f"forward_backward_warp_batch (G={g}):  {t:7.2f} ms"
              f"  ({t / g:6.2f} ms/sample)")


if __name__ == "__main__":
    main()
