"""Fused ResBlock GN+SiLU+conv A/B: Pallas kernel vs the unfused torso path.

Op-level timing at the two bandwidth-dominant torso shapes (SR 256² C=F=128
batch 54, flagship 128² C=F=256 batch 32), then a model-step A/B is one env
flip away: `IVID_TPU_FUSED_GNCONV=1 python bench_step.py` (flagship) /
`bench_sr.py` (SR). Timing varies inputs per rep + fetches a scalar (the
relayed backend result-caches identical dispatches).

Run: python bench_gnconv.py [--reps 30]
"""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax

    from ivid_tpu.utils.runtime import enable_compilation_cache, setup_platform

    setup_platform()
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from ivid_tpu.ops.fused_gn_conv import (
        fused_affine_silu_conv, gn_affine, unfused_affine_silu_conv,
    )

    interpret = jax.default_backend() != "tpu"

    for (b, h, w, c, f) in [(54, 256, 256, 128, 128), (32, 128, 128, 256, 256)]:
        keys = jax.random.split(jax.random.PRNGKey(0), 5)
        gs = jax.random.normal(keys[1], (c,)) * 0.2 + 1.0
        gb = jax.random.normal(keys[2], (c,)) * 0.1
        kern = jax.random.normal(keys[3], (3, 3, c, f)) * (9 * c) ** -0.5
        bias = jax.random.normal(keys[4], (f,)) * 0.1

        def make_x(i):
            return jax.random.normal(
                jax.random.fold_in(keys[0], i), (b, h, w, c)
            ).astype(jnp.bfloat16)

        def run_fused(x):
            a, t = gn_affine(x, gs, gb, 32)
            return fused_affine_silu_conv(x, a, t, kern, bias,
                                          interpret=interpret)

        def run_unfused(x):
            a, t = gn_affine(x, gs, gb, 32)
            return unfused_affine_silu_conv(x, a, t, kern, bias)

        fused = jax.jit(run_fused)
        unfused = jax.jit(run_unfused)

        x0 = make_x(0)
        yf = np.asarray(fused(x0), np.float32)
        yu = np.asarray(unfused(x0), np.float32)
        scale = max(np.abs(yu).max(), 1e-6)
        err = np.abs(yf - yu).max() / scale
        print(f"[{b},{h},{w},{c}]->F={f}: on-chip rel-max err = {err:.3e}")
        assert err < 3e-2, err  # bf16 rounding placement differs

        for name, fn in [("unfused", unfused), ("fused", fused)]:
            fn(make_x(1)).block_until_ready()
            t0 = time.perf_counter()
            for i in range(args.reps):
                float(jnp.sum(fn(make_x(2 + i))[0, 0, 0]))
            dt = (time.perf_counter() - t0) / args.reps * 1000
            print(f"  {name}: {dt:.3f} ms/call (incl. input gen + fetch)")


if __name__ == "__main__":
    main()
