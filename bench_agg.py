"""Amortized per-slot aggregation raster cost on TPU: tiled vs scatter.

Builds one realistic mesh state (128² rgbd → depth mesh, 384² raster) and
times pipe._agg_body for batch-1 inside an in-program scan (K reps, varying
the modelview) to amortize the ~40 ms relay dispatch floor.
"""

import os
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


def main():
    print(f"device: {jax.devices()[0]}")

    def build(path):
        cfg = Config.load(path)
        model = build_backbone(cfg)
        fw = build_framework_from_config(cfg, model)
        return fw

    fw_u = build("configs/rgbd_imagenet_adm_128_large_cfg.json")
    fw_c = build("configs/rgbd_imagenet_adm_128_large_cond.json")
    pipe = ScenePipeline(fw_u, fw_c, image_size=S, steps_uncond=1000,
                         steps_cond=50, guidance=0.5)

    state = pipe.init_state(1)
    rgbd01 = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(1), (1, S, S, 4)), 0.01, 0.99
    )
    mv0 = jnp.broadcast_to(jnp.asarray(vs.canonical_view()), (1, 4, 4))
    state = pipe.add_view(state, 0, rgbd01, mv0)
    sl = lambda x: x[:, :1]
    meshes = jax.tree.map(sl, state.meshes)
    colors = sl(state.colors)
    valid = jnp.asarray(state.valid[:1])

    @jax.jit
    def run(seed):
        def body(c, i):
            eps = (i + seed).astype(jnp.float32) * 1e-6
            agg = pipe._agg_body(meshes, colors, valid, mv0 + eps)
            return c + jnp.sum(agg["color"]), None

        total, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.int32))
        return total

    @jax.jit
    def nop(seed):
        return jnp.sum(seed * jnp.ones((8, 128)))

    _ = float(nop(jnp.int32(0)))
    t0 = time.perf_counter()
    for r in range(5):
        _ = float(nop(jnp.int32(r + 1)))
    floor = (time.perf_counter() - t0) / 5
    print(f"dispatch floor: {floor*1e3:.1f} ms")

    _ = float(run(jnp.int32(0)))
    best = 1e9
    for r in range(3):
        t0 = time.perf_counter()
        _ = float(run(jnp.int32(r + 1)))
        best = min(best, time.perf_counter() - t0)
    per = (best - floor) / K * 1e3
    print(f"agg slot (1 view, 384^2): {per:.2f} ms  [IVID_TPU_RASTER={os.environ.get('IVID_TPU_RASTER','auto')}]")


if __name__ == "__main__":
    main()
