"""Micro-benchmarks for raster primitive selection on the real TPU chip.

The relayed TPU backend has a large per-dispatch round trip, so each primitive
runs K times inside ONE jitted lax.scan (inputs varied per iteration by folding
the loop index) and we report (t_total - t_baseline_dispatch) / K.

Run: python bench_micro.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = 733_184  # ~fragment count for one 384^2 aggregation slot
NPIX = 384 * 384
K = 10  # scan iterations per dispatch
REPS = 3

_dispatch_floor = None


def timed(name, op, k=K, n_reps=REPS):
    """op(i) -> array; scanned K times inside one jit; returns ms/iter."""

    @jax.jit
    def run(seed):
        def body(c, i):
            out = op(i + seed)
            return c + jnp.sum(out.astype(jnp.float32)), None

        total, _ = jax.lax.scan(body, 0.0, jnp.arange(k, dtype=jnp.int32))
        return total

    _ = float(run(jnp.int32(0)))
    best = 1e9
    for r in range(n_reps):
        t0 = time.perf_counter()
        _ = float(run(jnp.int32(r + 1)))
        best = min(best, time.perf_counter() - t0)
    overhead = _dispatch_floor or 0.0
    per = (best - overhead) / k * 1e3
    print(f"{name:52s} {per:8.2f} ms/iter")
    return per


def frags(i):
    key = jax.random.fold_in(jax.random.PRNGKey(7), i)
    k1, k2, k3 = jax.random.split(key, 3)
    pix = jax.random.randint(k1, (N,), 0, NPIX, dtype=jnp.int32)
    d = jax.random.uniform(k2, (N,))
    pay = jax.random.uniform(k3, (N, 3))
    return pix, d, pay


def main():
    global _dispatch_floor
    print(f"device: {jax.devices()[0]}  N={N}  NPIX={NPIX}  K={K}")

    # 0. dispatch floor: trivial op
    @jax.jit
    def nop(seed):
        return jnp.sum(seed * jnp.ones((8, 128)))

    _ = float(nop(jnp.int32(0)))
    t0 = time.perf_counter()
    for r in range(5):
        _ = float(nop(jnp.int32(r + 1)))
    _dispatch_floor = (time.perf_counter() - t0) / 5
    print(f"{'dispatch floor (trivial op round trip)':52s} {_dispatch_floor*1e3:8.2f} ms")

    timed("randgen only (frags)", lambda i: frags(i)[1])

    def sort_full(i):
        pix, d, pay = frags(i)
        idx = jnp.arange(N, dtype=jnp.int32)
        out = jax.lax.sort((pix, d, pay[:, 0], pay[:, 1], pay[:, 2], idx), num_keys=1)
        return out[1]

    timed("lax.sort key+5vals (733k)", sort_full)

    def sort_narrow(i):
        pix, _, _ = frags(i)
        idx = jnp.arange(N, dtype=jnp.int32)
        return jax.lax.sort((pix, idx), num_keys=1)[1].astype(jnp.float32)

    timed("lax.sort key+idx (733k)", sort_narrow)

    def sort_small(i):
        key = jax.random.fold_in(jax.random.PRNGKey(3), i)
        tid = jax.random.randint(key, (32768,), 0, 144, dtype=jnp.int32)
        idx = jnp.arange(32768, dtype=jnp.int32)
        return jax.lax.sort((tid, idx), num_keys=1)[1].astype(jnp.float32)

    timed("lax.sort 32k faces by tileid", sort_small)

    def gather_rows(i):
        pix, d, pay = frags(i)
        rows = jnp.concatenate([d[:, None], pay], axis=-1)
        return jnp.take(rows, pix, axis=0)  # pix as arbitrary indices

    timed("take [733k,4] rows by 733k idx", gather_rows)

    def scat_min(i):
        pix, d, pay = frags(i)
        return jnp.full((NPIX + 1,), jnp.inf, jnp.float32).at[pix].min(d)

    timed("scatter-min 733k -> 147k", scat_min)

    def scat_add4(i):
        pix, d, pay = frags(i)
        acc = jnp.zeros((NPIX + 1, 4), jnp.float32)
        return acc.at[pix].add(jnp.concatenate([d[:, None], pay], -1))

    timed("scatter-add [733k,4]", scat_add4)

    # Dense-compare Pallas tile kernel on pre-binned data.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = NPIX // 1024
    F_PER_T = (N // T // 512) * 512  # 4608

    def dense_kernel(lp_ref, z_ref, pay_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1024), 1)
        CH = 512
        nch = F_PER_T // CH

        def body(i, zbuf):
            lp = lp_ref[0, pl.ds(i * CH, CH), :]
            z = z_ref[0, pl.ds(i * CH, CH), :]
            m = lp == iota
            zm = jnp.where(m, z, 9.0)
            return jnp.minimum(zbuf, jnp.min(zm, axis=0, keepdims=True))

        zbuf = jax.lax.fori_loop(0, nch, body, jnp.full((1, 1024), 9.0))

        def body2(i, acc):
            lp = lp_ref[0, pl.ds(i * CH, CH), :]
            z = z_ref[0, pl.ds(i * CH, CH), :]
            pay = pay_ref[0, pl.ds(i * CH, CH), :]
            m = lp == iota
            win = (m & (z <= zbuf)).astype(jnp.float32)
            contrib = jnp.concatenate(
                [jnp.sum(win * pay[:, c:c + 1], axis=0, keepdims=True)
                 for c in range(4)], 0)
            return acc + contrib

        acc = jax.lax.fori_loop(0, nch, body2, jnp.zeros((4, 1024)))
        out_ref[0, 0:1, :] = zbuf
        out_ref[0, 1:5, :] = acc

    dense_call = pl.pallas_call(
        dense_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, F_PER_T, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F_PER_T, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F_PER_T, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 5, 1024), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 5, 1024), jnp.float32),
    )

    def dense_tiles(i):
        key = jax.random.fold_in(jax.random.PRNGKey(11), i)
        k1, k2, k3 = jax.random.split(key, 3)
        lp = jax.random.randint(k1, (T, F_PER_T, 1), 0, 1024, dtype=jnp.int32)
        z = jax.random.uniform(k2, (T, F_PER_T, 1))
        pay = jax.random.uniform(k3, (T, F_PER_T, 4))
        return dense_call(lp, z, pay)[:, 0, :]

    try:
        timed("pallas dense-compare 663k binned vs 144x1024", dense_tiles)
    except Exception as e:
        print("pallas dense-compare FAILED:", str(e)[:800])

    def histo(i):
        pix, _, _ = frags(i)
        tid = (pix // 5120).astype(jnp.int32)  # ~144 coarse pages
        C = 2048
        oh = jax.nn.one_hot(tid.reshape(-1, C), T, dtype=jnp.bfloat16)
        return jnp.sum(oh, axis=1).astype(jnp.float32)

    timed("one-hot histogram chunks x T", histo)

    # Chunked cumsum-rank via triangular matmul (binning rank computation)
    def rank_matmul(i):
        pix, _, _ = frags(i)
        tid = (pix // 1024).astype(jnp.int32)
        C = 1024
        oh = jax.nn.one_hot(tid.reshape(-1, C, 1)[..., 0], T, dtype=jnp.float32)  # [ch,C,T]
        tri = jnp.tril(jnp.ones((C, C), jnp.float32), -1)
        within = jnp.einsum("ij,cjt->cit", tri, oh)  # exclusive prefix within chunk
        per_chunk = jnp.sum(oh, axis=1)  # [ch,T]
        across = jnp.cumsum(per_chunk, axis=0) - per_chunk
        rank = jnp.sum(within * oh, axis=-1) + jnp.sum(across[:, None, :] * oh, axis=-1)
        return rank

    timed("rank-by-matmul (chunked cumsum)", rank_matmul)


if __name__ == "__main__":
    main()
