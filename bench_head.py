"""Fused output-head A/B: Pallas GN+SiLU+conv vs the unfused XLA composition.

Validates on-chip numerics (the interpret-mode tests can't see Mosaic) and
measures the per-call saving at the flagship (16x128x128x256) and SR
(27x256x256x128) head shapes. Timing varies an input per rep and fetches a
scalar (the relayed backend result-caches identical dispatches).

Run: python bench_head.py [--reps 30]
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

    from ivid_tpu.ops.fused_head import fused_gn_silu_conv, unfused_gn_silu_conv

    interpret = jax.default_backend() != "tpu"

    for (shape, groups) in [((16, 128, 128, 256), 32), ((27, 256, 256, 128), 32)]:
        b, h, w, c = shape
        keys = jax.random.split(jax.random.PRNGKey(0), 5)
        gn_scale = jax.random.normal(keys[1], (c,)) * 0.2 + 1.0
        gn_bias = jax.random.normal(keys[2], (c,)) * 0.1
        kern = jax.random.normal(keys[3], (3, 3, c, 4)) * (9 * c) ** -0.5
        cbias = jax.random.normal(keys[4], (4,)) * 0.1

        def make_x(i):
            return jax.random.normal(
                jax.random.fold_in(keys[0], i), shape
            ).astype(jnp.bfloat16)

        fused = jax.jit(lambda x: fused_gn_silu_conv(
            x, gn_scale, gn_bias, kern, cbias, groups, interpret=interpret))
        unfused = jax.jit(lambda x: unfused_gn_silu_conv(
            x, gn_scale, gn_bias, kern, cbias, groups))

        x0 = make_x(0)
        yf = np.asarray(fused(x0))
        yu = np.asarray(unfused(x0))
        err = np.abs(yf - yu).max() / max(np.abs(yu).max(), 1e-6)
        print(f"{shape}: on-chip rel-max err fused vs unfused = {err:.3e}")
        assert err < 3e-3, err

        for name, fn in [("unfused", unfused), ("fused", fused)]:
            fn(make_x(1)).block_until_ready()
            t0 = time.perf_counter()
            acc = 0.0
            for i in range(args.reps):
                acc += float(jnp.sum(fn(make_x(2 + i))[0, 0, 0]))
            dt = (time.perf_counter() - t0) / args.reps * 1000
            print(f"  {name}: {dt:.3f} ms/call (incl. input gen + fetch)")


if __name__ == "__main__":
    main()
