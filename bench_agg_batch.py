"""Batch-16 aggregation raster A/B on TPU: sample-batched dense launch vs
per-sample sequential map, sweeping IVID_TPU_AGG_GROUP.

The headline eval protocol charges one whole-batch slot raster per cond view
(bench.py); the 3x9 sequence charges ~390 of them. The sample-batched path
(`aggregate_conditions_batch`) rasters groups of samples' slot z-buffers in
ONE dense launch; this measures the real per-batch cost at production shapes
(128^2 rgbd -> depth mesh, 384^2 raster, batch 16).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import ivid_tpu.inference.viewsets as vs
from ivid_tpu.config import Config, build_backbone, build_framework_from_config
from ivid_tpu.inference.pipeline import ScenePipeline

K = 8
S = 128
BATCH = 16


def main():
    print(f"device: {jax.devices()[0]}  batch={BATCH}")

    def build(path):
        cfg = Config.load(path)
        model = build_backbone(cfg)
        return build_framework_from_config(cfg, model)

    fw_u = build("configs/rgbd_imagenet_adm_128_large_cfg.json")
    fw_c = build("configs/rgbd_imagenet_adm_128_large_cond.json")
    pipe = ScenePipeline(fw_u, fw_c, image_size=S, steps_uncond=1000,
                         steps_cond=50, guidance=0.5)

    state = pipe.init_state(BATCH)
    # Structured depth (smooth ramp + gentle bumps): i.i.d.-noise depth fails
    # the mesh atol/rtol disconnect test on nearly every face, leaving only
    # the skirt in the raster — unrepresentatively cheap. A smooth field
    # keeps all ~32k faces/sample live like a real scene.
    ii = jnp.linspace(0, 1, S)
    yy, xx = jnp.meshgrid(ii, ii, indexing="ij")
    base = 0.35 + 0.3 * yy + 0.05 * jnp.sin(xx * 21) * jnp.sin(yy * 17)
    ph = jnp.arange(BATCH, dtype=jnp.float32)[:, None, None] * 0.7
    depth = jnp.clip(base[None] + 0.02 * jnp.sin(xx[None] * 9 + ph), 0.05, 0.95)
    rgb = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(1), (BATCH, S, S, 3)), 0.01, 0.99
    )
    rgbd01 = jnp.concatenate([rgb, depth[..., None]], axis=-1)
    mv0 = jnp.broadcast_to(jnp.asarray(vs.canonical_view()), (BATCH, 4, 4))
    state = pipe.add_view(state, 0, rgbd01, mv0)
    sl = lambda x: x[:, :1]
    meshes = jax.tree.map(sl, state.meshes)
    colors = sl(state.colors)
    valid = jnp.asarray(state.valid[:1])

    @jax.jit
    def nop(seed):
        return jnp.sum(seed * jnp.ones((8, 128)))

    _ = float(nop(jnp.int32(0)))
    t0 = time.perf_counter()
    for r in range(5):
        _ = float(nop(jnp.int32(r + 1)))
    floor = (time.perf_counter() - t0) / 5
    print(f"dispatch floor: {floor*1e3:.1f} ms")

    def measure(mode, group):
        pipe.agg_batch_mode = mode
        os.environ["IVID_TPU_AGG_GROUP"] = str(group)

        @jax.jit
        def run(seed):
            def body(c, i):
                eps = (i + seed).astype(jnp.float32) * 1e-6
                agg = pipe._agg_body(meshes, colors, valid, mv0 + eps)
                return c + jnp.sum(agg["color"]), None

            total, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.int32))
            return total

        t0 = time.perf_counter()
        val = float(run(jnp.int32(0)))
        tc = time.perf_counter() - t0
        best = 1e9
        for r in range(3):
            t0 = time.perf_counter()
            _ = float(run(jnp.int32(r + 1)))
            best = min(best, time.perf_counter() - t0)
        per = (best - floor) / K * 1e3
        label = f"{mode}" + (f" group={group}" if mode == "batch" else "")
        print(f"{label:24s} {per:8.2f} ms/batch-slot  ({per/BATCH:6.2f} ms/sample)"
              f"  [compile+1st {tc:.0f}s, sum {val:.1f}]")
        return per

    if os.environ.get("IVID_TPU_BENCH_AGG_MODES", "1") == "1":
        measure("map", 0)
        for g in (2, 4, 8):
            try:
                measure("batch", g)
            except Exception as e:  # VMEM OOM at large groups is a data point
                print(f"batch group={g} FAILED: {type(e).__name__}: {str(e)[:200]}")

    # --- slot-bucket scaling (map mode): the 3x9 sequence rasters buckets of
    # up to 24 prior-view slots per launch; if the marginal slot cost falls
    # with bucket size, charging 390 x t(bucket=1) overstates the agg leg.
    pipe.agg_batch_mode = "map"
    mvs = vs.build_viewset("3x9", 1)
    for v in range(1, 24):
        mv = jnp.broadcast_to(jnp.asarray(mvs[v % len(mvs)]), (BATCH, 4, 4))
        state = pipe.add_view(state, v, rgbd01, mv)
    prev = None
    buckets = tuple(
        int(x) for x in
        os.environ.get("IVID_TPU_BENCH_BUCKETS", "1,4,8,16,24").split(",")
    )
    for nslots in buckets:
        slc = lambda x: x[:, :nslots]
        m = jax.tree.map(slc, state.meshes)
        c = slc(state.colors)
        va = jnp.asarray(state.valid[:nslots])

        @jax.jit
        def run(seed, m=m, c=c, va=va):
            def body(acc, i):
                eps = (i + seed).astype(jnp.float32) * 1e-6
                agg = pipe._agg_body(m, c, va, mv0 + eps)
                return acc + jnp.sum(agg["color"]), None

            total, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.int32))
            return total

        t0 = time.perf_counter()
        _ = float(run(jnp.int32(0)))
        tc = time.perf_counter() - t0
        best = 1e9
        for r in range(3):
            t0 = time.perf_counter()
            _ = float(run(jnp.int32(r + 1)))
            best = min(best, time.perf_counter() - t0)
        per = (best - floor) / K * 1e3
        marg = "" if prev is None else f"  marginal {(per-prev[1])/(nslots-prev[0])/BATCH:6.2f} ms/slot/sample"
        print(f"bucket={nslots:2d}  {per:8.2f} ms/batch ({per/nslots/BATCH:6.2f} ms/slot/sample)"
              f"  [compile+1st {tc:.0f}s]{marg}")
        prev = (nslots, per)


if __name__ == "__main__":
    main()
