"""Amortized benchmark of the z-buffer resolve implementations on TPU.

Compares resolve_zbuffer_scatter, the tiled production kernel, and a sort+dense-compare
prototype on realistic fragment statistics (733k fragments, 384^2 fb),
each run K times inside one jitted scan to amortize the ~43ms relay
dispatch floor.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from ivid_tpu.ops import raster

N = 733_184
R = 384
NPIX = R * R
K = 24
REPS = 3

_floor = None


def timed(name, op, k=K):
    @jax.jit
    def run(seed):
        def body(c, i):
            out = op(i + seed)
            return c + jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)), None

        total, _ = jax.lax.scan(body, 0.0, jnp.arange(k, dtype=jnp.int32))
        return total

    try:
        _ = float(run(jnp.int32(0)))
    except Exception as e:
        print(f"{name:46s} FAILED: {str(e)[:300]}")
        return None
    best = 1e9
    for r in range(REPS):
        t0 = time.perf_counter()
        _ = float(run(jnp.int32(r + 1)))
        best = min(best, time.perf_counter() - t0)
    per = (best - (_floor or 0.0)) / k * 1e3
    print(f"{name:46s} {per:8.2f} ms/iter")
    return per


def make_batch(i):
    """Synthetic fragments with raster-like spatial coherence: clustered pixel
    positions (consecutive fragments near each other), depths in [0,1]."""
    key = jax.random.fold_in(jax.random.PRNGKey(5), i)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # coherent base positions: smooth curve + jitter
    t = jnp.linspace(0, 1, N)
    cx = (0.5 + 0.4 * jnp.sin(t * 37)) * R
    cy = t * R
    x = jnp.clip(cx + jax.random.normal(k1, (N,)) * 6, 0, R - 1).astype(jnp.int32)
    y = jnp.clip(cy + jax.random.normal(k2, (N,)) * 6, 0, R - 1).astype(jnp.int32)
    pix = y * R + x
    d = jax.random.uniform(k3, (N,))
    pay = jax.random.uniform(k4, (N, 3))
    valid = jnp.ones((N,), bool)
    fb = raster.FragmentBatch(
        pixel=pix, depth=d, attrs=pay, front=valid, valid=valid
    )
    return fb, pay


def main():
    global _floor
    print(f"device: {jax.devices()[0]}  N={N}  R={R}  K={K}")

    @jax.jit
    def nop(seed):
        return jnp.sum(seed * jnp.ones((8, 128)))

    _ = float(nop(jnp.int32(0)))
    t0 = time.perf_counter()
    for r in range(5):
        _ = float(nop(jnp.int32(r + 1)))
    _floor = (time.perf_counter() - t0) / 5
    print(f"{'dispatch floor':46s} {_floor*1e3:8.2f} ms")

    timed("fragment gen only", lambda i: make_batch(i)[1])

    def scatter(i):
        fb, pay = make_batch(i)
        return raster.resolve_zbuffer_scatter([fb], [pay], R)[0]

    timed("resolve_zbuffer_scatter", scatter)

    # Retired A/B variants (deleted after the production path was settled;
    # measured v5e numbers preserved): sort+segmented-scan pure-XLA resolve
    # 34.9 ms, sequential VMEM fragment-replay Pallas kernel 40.7 ms - both
    # dominated by the tiled sort+dense kernel below.

    # --- sort + dense-compare prototype ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = 1024                      # pixels per tile
    T = NPIX // P                 # 144
    CH = 512                      # fragments per inner chunk

    def proto(i, cap_mult=1.35):
        fb, pay = make_batch(i)
        key = jnp.where(fb.valid, fb.pixel, NPIX).astype(jnp.int32)
        z = jnp.where(fb.valid, fb.depth, 9.0).astype(jnp.float32)
        rows = jnp.concatenate([z[:, None], pay], axis=-1)  # [N,4]
        ks, z_s, p0, p1, p2 = jax.lax.sort(
            (key, rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]), num_keys=1
        )
        tid = jnp.minimum(ks // P, T - 1)
        # per-tile fragment ranges
        bounds = jnp.searchsorted(tid, jnp.arange(T + 1, dtype=jnp.int32))
        # pad fragment arrays so every dynamic slice is in-bounds
        F_CAP = ((int(N * cap_mult) + CH - 1) // CH) * CH
        padlen = CH  # tail pad for slice overrun
        lp = jnp.pad((ks - tid * P).astype(jnp.int32), (0, padlen), constant_values=P)
        zp = jnp.pad(z_s, (0, padlen), constant_values=9.0)
        pp = jnp.pad(jnp.stack([p0, p1, p2], -1), ((0, padlen), (0, 0)))

        # grid: (T, MAXCH) — each tile processes ceil(count/CH) chunks, skipping
        # the rest. MAXCH = worst-case chunks for one tile.
        MAXCH = 24  # 24*512 = 12288 frags per tile cap (avg is 5k)

        def kernel(bounds_ref, lp_ref, z_ref, pay_ref, out_ref, zbuf, acc):
            t = pl.program_id(0)
            c = pl.program_id(1)
            start = bounds_ref[t]
            end = bounds_ref[t + 1]

            @pl.when(c == 0)
            def _():
                zbuf[:] = jnp.full_like(zbuf, 9.0)
                acc[:] = jnp.zeros_like(acc)

            off = start + c * CH
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)

            @pl.when(off < end)
            def _():
                nvalid = end - off
                lpc = lp_ref[pl.ds(off, CH), :]
                zc = z_ref[pl.ds(off, CH), :]
                pc = pay_ref[pl.ds(off, CH), :]
                ridx = jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0)
                ok = ridx < nvalid
                m = (lpc == iota) & ok
                zm = jnp.where(m, zc, 9.0)
                zbuf[:] = jnp.minimum(zbuf[:], jnp.min(zm, axis=0, keepdims=True))

            @pl.when(c == pl.num_programs(1) - 1)
            def _():
                # second pass: winners accumulate
                def body(j, carry):
                    off2 = start + j * CH
                    lpc = lp_ref[pl.ds(off2, CH), :]
                    zc = z_ref[pl.ds(off2, CH), :]
                    pc = pay_ref[pl.ds(off2, CH), :]
                    ridx = jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0)
                    ok = ridx < (end - off2)
                    m = (lpc == iota) & ok
                    win = (m & (zc <= zbuf[:])).astype(jnp.float32)
                    a = carry
                    for ch in range(3):
                        a = a.at[ch:ch+1, :].add(
                            jnp.sum(win * pc[:, ch:ch+1], axis=0, keepdims=True))
                    a = a.at[3:4, :].add(jnp.sum(win, axis=0, keepdims=True))
                    return a

                nch = (end - start + CH - 1) // CH
                res = jax.lax.fori_loop(0, nch, body, jnp.zeros((4, P)))
                out_ref[0, 0:1, :] = zbuf[:]
                out_ref[0, 1:5, :] = res

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T, MAXCH),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, 5, P), lambda b, t, c: (t, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, P), jnp.float32),
                pltpu.VMEM((4, P), jnp.float32),
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T, 5, P), jnp.float32),
        )(bounds, lp[:, None], zp[:, None], pp)
        return out[:, 0, :]

    def tiled(i):
        fb, pay = make_batch(i)
        from ivid_tpu.ops.raster_tiled import resolve_zbuffer_tiled
        return resolve_zbuffer_tiled([fb], [pay], R)[0]

    timed("resolve_zbuffer_tiled (sort+dense+MXU)", tiled)

    def sort_only(i):
        fb, pay = make_batch(i)
        key = jnp.where(fb.valid, fb.pixel, NPIX).astype(jnp.int32)
        z = jnp.where(fb.valid, fb.depth, 9.0).astype(jnp.float32)
        out = jax.lax.sort(
            (key, z, pay[:, 0], pay[:, 1], pay[:, 2]), num_keys=1
        )
        return out[1]

    timed("sort fragments (key+4 vals)", sort_only)

    if os.environ.get("RUN_PROTO") == "1":
        timed("sort + dense-compare (prototype)", proto, k=4)


if __name__ == "__main__":
    main()
