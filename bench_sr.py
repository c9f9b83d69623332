"""Fast iteration harness for the SR-cascade guided DDIM step.

Times the 50-step guided CFG DDIM scan on the 256<-128 SR model at batch 27
(one 3x9 scene; the MFU-optimal batch measured in round 2) and prints
ms/step + MFU. Use with --profile DIR + bench_trace.py for the per-op
roofline while tuning (reference workload: diffusion/trainers/superres.py:124,
configs/rgbd_imagenet_adm_256_128_small_sr.json).

Run: python bench_sr.py [--batch 27] [--profile DIR]
"""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=27)
    ap.add_argument("--profile", type=str, default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from ivid_tpu.utils.runtime import enable_compilation_cache, setup_platform

    setup_platform()
    enable_compilation_cache()
    import jax.numpy as jnp

    from ivid_tpu.config import Config, build_backbone, build_framework_from_config
    from ivid_tpu.diffusion import samplers

    batch, s, s_lr = args.batch, 256, 128
    cfg = Config.load("configs/rgbd_imagenet_adm_256_128_small_sr.json")
    model = build_backbone(cfg)
    fw = build_framework_from_config(cfg, model)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, s, s, 8)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        )["params"]
    )
    params = jax.tree.map(lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes)
    cond = {
        "y": jnp.zeros((batch, s_lr, s_lr, 4)),
        "classes": jnp.arange(batch, dtype=jnp.int32),
    }

    fwd = jax.jit(lambda p, x, t, c: model.apply({"params": p}, x, t, c))
    cost = fwd.lower(
        params, jnp.zeros((1, s, s, 8)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    ).compile().cost_analysis()
    flops_per_fwd = float(cost.get("flops", 0.0))

    ddim = jax.jit(
        lambda p, r: samplers.ddim_sample(
            fw, p, r, num=batch, image_size=s,
            cond=cond, guidance=3.0, steps=args.steps,
        )["samples"]
    )

    def sync(x):
        return float(jnp.sum(x))

    @jax.jit
    def _nop(seed):
        return jnp.sum(seed * jnp.ones((8, 128)))

    _ = float(_nop(jnp.int32(0)))
    t0 = time.perf_counter()
    for r in range(5):
        _ = float(_nop(jnp.int32(r + 1)))
    floor = (time.perf_counter() - t0) / 5

    t0 = time.perf_counter()
    sync(ddim(params, jax.random.PRNGKey(0)))  # compile
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    if args.profile:
        with jax.profiler.trace(args.profile):
            sync(ddim(params, jax.random.PRNGKey(99)))

    best = 1e9
    for i in range(args.reps):
        t0 = time.perf_counter()
        sync(ddim(params, jax.random.PRNGKey(100 + i)))
        best = min(best, time.perf_counter() - t0)
    t_step = (best - floor) / args.steps
    mfu = (2 * batch * flops_per_fwd / t_step) / 197e12
    print(
        f"SR guided CFG DDIM step: {t_step * 1000:.2f} ms  "
        f"MFU {mfu * 100:.1f}%  (floor {floor * 1000:.1f} ms, batch {batch}, "
        f"{t_step / batch * 1000:.2f} ms/sample-step)"
    )


if __name__ == "__main__":
    main()
