"""Profile the aggregation raster program: per-op roofline of one slot raster.

Writes a jax.profiler trace of K reps of ``pipe._agg_body`` (1 view slot,
384² render) and prints the bench_trace roofline table, so the 7.7 ms/slot
bill is attributable op-by-op (fragment gen vs sort vs tile kernel vs glue).

Run: python bench_agg_trace.py [/tmp/aggprof]
"""

import os
import sys

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
NSLOTS = int(os.environ.get("IVID_TPU_AGG_SLOTS", "1"))


def main():
    prof_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/aggprof"
    print(f"device: {jax.devices()[0]}  slots={NSLOTS}")

    def build(path):
        cfg = Config.load(path)
        model = build_backbone(cfg)
        return build_framework_from_config(cfg, model)

    fw_u = build("configs/rgbd_imagenet_adm_128_large_cfg.json")
    fw_c = build("configs/rgbd_imagenet_adm_128_large_cond.json")
    pipe = ScenePipeline(fw_u, fw_c, image_size=S, steps_uncond=1000,
                         steps_cond=50, guidance=0.5)

    state = pipe.init_state(1)
    # Structured depth keeps all mesh faces live (i.i.d. noise fails the
    # atol/rtol disconnect test and leaves only the skirt — see bench.py).
    ii = jnp.linspace(0, 1, S)
    yy, xx = jnp.meshgrid(ii, ii, indexing="ij")
    depth = jnp.clip(
        0.35 + 0.3 * yy + 0.05 * jnp.sin(xx * 21) * jnp.sin(yy * 17), 0.05, 0.95
    )
    rgb = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(1), (1, S, S, 3)), 0.01, 0.99
    )
    rgbd01 = jnp.concatenate([rgb, depth[None, ..., None]], axis=-1)
    mvs = vs.build_viewset("3x9", 1)
    for v in range(NSLOTS):
        mv = jnp.broadcast_to(jnp.asarray(mvs[v % len(mvs)]), (1, 4, 4))
        state = pipe.add_view(state, v, rgbd01, mv)
    mv0 = jnp.broadcast_to(jnp.asarray(mvs[NSLOTS % len(mvs)]), (1, 4, 4))
    sl = lambda x: x[:, :NSLOTS]
    meshes = jax.tree.map(sl, state.meshes)
    colors = sl(state.colors)
    valid = jnp.asarray(state.valid[:NSLOTS])

    @jax.jit
    def run(seed):
        def body(c, i):
            eps = (i + seed).astype(jnp.float32) * 1e-6
            agg = pipe._agg_body(meshes, colors, valid, mv0 + eps)
            return c + jnp.sum(agg["color"]), None

        total, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.int32))
        return total

    _ = float(run(jnp.int32(0)))  # compile
    with jax.profiler.trace(prof_dir):
        _ = float(run(jnp.int32(1)))

    os.system(f"{sys.executable} bench_trace.py {prof_dir} --top 40")
    print(f"\n(divide self-times by K={K} reps x {NSLOTS} slots for per-slot cost)")


if __name__ == "__main__":
    main()
