#!/usr/bin/env python
"""Benchmark: multiview RGBD samples/sec/chip on the eval protocol.

Measures the headline metric from BASELINE.json — multiview RGBD samples/sec
per chip at 128² for the README eval protocol (no fusion): 1000 uncond DDPM
steps + 50 cond DDIM steps + 1 condition aggregation per sample, batch 16,
flagship imagenet-128 models (reference: README.md:90, BASELINE.md).

Method notes:
- The relayed TPU backend carries a ~40 ms per-dispatch round trip (measured
  as a trivial-op floor and subtracted from every timing; round-1 numbers
  included it). Per-slot costs are additionally amortized by running K
  repetitions inside one jitted ``lax.scan`` with varied inputs — the relay
  result-caches identical dispatches, so every rep folds the loop index in.
- Parameters are zeros placed via ``jax.eval_shape`` (a full random init of
  the 550M model is a separate giant XLA program — irrelevant to throughput).
- The secondary full-3x9 metric is composed from measured pieces and reports
  the REFERENCE-EXACT uncapped aggregation loop as primary (mult4 slot
  bucketing: 390 slot-rasters/sequence, each rastering the whole batch's
  buffers in one sample-batched launch); the K=8 nearest-view cap
  (sample.py --max_agg_views 8) is a measured lossy knob
  (tests/test_kcap_bound.py) reported alongside as `_k8capped_lossy`.

``vs_baseline`` compares against an ESTIMATED A100 reference throughput — the
reference publishes no numbers (BASELINE.md). Estimate: the flagship uncond
model runs fp32 in the reference (configs/rgbd_imagenet_adm_128_large_cfg.json
sets use_fp16 false), i.e. TF32 convs on A100 (156 TFLOP/s peak) in an eager
per-step loop with two sequential CFG forwards; assume a generous 30% MFU and
zero cost for its CPU↔OpenGL conditioning round trips. FLOPs come from the XLA
cost model of our own forward. Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax

    from ivid_tpu.utils.runtime import enable_compilation_cache, setup_platform

    setup_platform()
    enable_compilation_cache()
    import jax.numpy as jnp

    from ivid_tpu.config import Config, build_backbone, build_framework_from_config
    from ivid_tpu.diffusion import samplers
    from ivid_tpu.inference.pipeline import ScenePipeline

    # Batch 16 is the measured throughput-optimal operating point on v5e.
    # The A100 baseline estimate is FLOPs-based so the comparison is unchanged.
    batch = 16
    s = 128
    results = {}

    def sync(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    # Dispatch floor of the relayed backend (subtracted from every timing).
    @jax.jit
    def _nop(seed):
        return jnp.sum(seed * jnp.ones((8, 128)))

    _ = float(_nop(jnp.int32(0)))
    t0 = time.perf_counter()
    for r in range(5):
        _ = float(_nop(jnp.int32(r + 1)))
    floor = (time.perf_counter() - t0) / 5
    results["dispatch_floor_ms"] = floor * 1000

    def build(cfg):
        model = build_backbone(cfg)
        fw = build_framework_from_config(cfg, model)
        c = cfg.backbone["args"]["in_channels"]
        shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, s, s, c)),
                jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
            )["params"]
        )
        params = jax.tree.map(lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes)
        return model, fw, params

    cfg_u = Config.load("configs/rgbd_imagenet_adm_128_large_cfg.json")
    cfg_c = Config.load("configs/rgbd_imagenet_adm_128_large_cond.json")
    model_u, fw_u, params_u = build(cfg_u)
    model_c, fw_c, params_c = build(cfg_c)
    classes = jnp.arange(batch, dtype=jnp.int32)

    # UNet FLOPs per forward (batch 1) from the XLA cost model.
    fwd = jax.jit(lambda p, x, t, c: model_u.apply({"params": p}, x, t, c))
    cost = fwd.lower(
        params_u, jnp.zeros((1, s, s, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    ).compile().cost_analysis()
    flops_per_fwd = float(cost.get("flops", 0.0))
    results["unet_gflops_per_forward"] = flops_per_fwd / 1e9

    # 50-step CFG DDIM scan (uncond model), floor-subtracted.
    ddim_u = jax.jit(
        lambda p, r: samplers.ddim_sample(
            fw_u, p, r, num=batch, image_size=s,
            cond={"classes": classes}, guidance=0.5, steps=50,
        )["samples"]
    )
    sync(ddim_u(params_u, jax.random.PRNGKey(0)))  # compile
    import os

    profile_dir = os.environ.get("IVID_TPU_BENCH_PROFILE")
    if profile_dir:
        # Device trace of the hot loop; the trace json carries hlo_category /
        # model_flops / bytes_accessed per op for roofline analysis.
        with jax.profiler.trace(profile_dir):
            sync(ddim_u(params_u, jax.random.PRNGKey(99)))
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        sync(ddim_u(params_u, jax.random.PRNGKey(100 + i)))
        best = min(best, time.perf_counter() - t0)
    t_step = (best - floor) / 50
    results["uncond_step_ms"] = t_step * 1000
    v5e_peak = 197e12
    results["mfu"] = (2 * batch * flops_per_fwd / t_step) / v5e_peak

    # Pipeline pieces: one live view in the scene state.
    pipe = ScenePipeline(
        fw_u, fw_c, image_size=s, steps_uncond=1000, steps_cond=50, guidance=0.5,
    )
    import ivid_tpu.inference.viewsets as vs

    state = pipe.init_state(batch)
    # Structured depth (smooth ramp + gentle bumps): i.i.d.-noise depth fails
    # the mesh atol/rtol disconnect test on nearly every face, leaving only
    # the frustum skirt live in the raster — unrepresentatively cheap. A
    # smooth field keeps all ~32k faces/sample live like a real scene, so the
    # charged aggregation cost reflects production meshes.
    ii = jnp.linspace(0, 1, s)
    yy, xx = jnp.meshgrid(ii, ii, indexing="ij")
    base = 0.35 + 0.3 * yy + 0.05 * jnp.sin(xx * 21) * jnp.sin(yy * 17)
    ph = jnp.arange(batch, dtype=jnp.float32)[:, None, None] * 0.7
    depth = jnp.clip(base[None] + 0.02 * jnp.sin(xx[None] * 9 + ph), 0.05, 0.95)
    rgb = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(1), (batch, s, s, 3)), 0.01, 0.99
    )
    rgbd01 = jnp.concatenate([rgb, depth[..., None]], axis=-1)
    mv0 = jnp.broadcast_to(jnp.asarray(vs.canonical_view()), (batch, 4, 4))
    state = pipe.add_view(state, 0, rgbd01, mv0)
    sl = lambda x: x[:, :1]
    meshes1 = jax.tree.map(sl, state.meshes)
    colors1 = sl(state.colors)
    valid1 = jnp.asarray(state.valid[:1])

    # Whole-batch aggregation raster (one slot, all `batch` samples) through
    # the production sample-batched dense path (agg_batch_mode="batch":
    # groups of IVID_TPU_AGG_GROUP samples' slot z-buffers per launch),
    # amortized inside one program (K reps).
    K = 8

    def agg_reps_fn(mode):
        pipe.agg_batch_mode = mode

        @jax.jit
        def agg_reps(seed):
            def body(c, i):
                eps = (i + seed).astype(jnp.float32) * 1e-6
                agg = pipe._agg_body(meshes1, colors1, valid1, mv0 + eps)
                return c + jnp.sum(agg["color"]), None

            total, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.int32))
            return total

        _ = float(agg_reps(jnp.int32(0)))
        best = 1e9
        for r in range(2):
            t0 = time.perf_counter()
            _ = float(agg_reps(jnp.int32(r + 1)))
            best = min(best, time.perf_counter() - t0)
        return (best - floor) / K

    # One rep = the whole batch's slot rasters. A/B the sample-batched launch
    # against the per-sample sequential fallback and charge the winner.
    t_agg_batched = agg_reps_fn("batch")
    t_agg_map = agg_reps_fn("map")
    results["agg_batch16_batched_ms"] = t_agg_batched * 1000
    results["agg_batch16_map_ms"] = t_agg_map * 1000
    t_agg_batch = min(t_agg_batched, t_agg_map)
    t_agg_slot = t_agg_batch / batch
    results["agg_slot_ms"] = t_agg_slot * 1000
    pipe.agg_batch_mode = "batch" if t_agg_batched <= t_agg_map else "map"

    # Guided 50-step cond DDIM (the expensive half of a cond view).
    agg1 = jax.jit(pipe._agg_body)(meshes1, colors1, valid1, mv0)
    sync(pipe._ddim_fn(params_c, jax.random.PRNGKey(2), agg1, classes))
    best = 1e9
    for i in range(2):
        t0 = time.perf_counter()
        sync(pipe._ddim_fn(params_c, jax.random.PRNGKey(3 + i), agg1, classes))
        best = min(best, time.perf_counter() - t0)
    t_ddim_cond = best - floor
    results["cond_ddim50_s"] = t_ddim_cond

    # Fused cond view (aggregation + guided DDIM in ONE dispatch — saves one
    # relay round trip per view; pipeline.py _cond_view_body). A/B'd against
    # the separate-dispatch composition; the winner is charged below.
    sync(
        pipe._cond_view_fn(
            params_c, jax.random.PRNGKey(2), meshes1, colors1, valid1, mv0,
            classes,
        )[0]
    )
    best = 1e9
    for i in range(2):
        t0 = time.perf_counter()
        sync(
            pipe._cond_view_fn(
                params_c, jax.random.PRNGKey(3 + i), meshes1, colors1,
                valid1, mv0, classes,
            )[0]
        )
        best = min(best, time.perf_counter() - t0)
    t_cond_fused = best - floor
    results["cond_view_fused_s"] = t_cond_fused
    fused_wins = t_cond_fused + floor <= t_agg_batch + t_ddim_cond + 2 * floor
    results["cond_view_fused_wins"] = float(fused_wins)

    # Chained cond views (IVID_TPU_COND_CHAIN; pipeline._cond_chain_body):
    # K=4 views in ONE scan dispatch — the per-view relay floor AND the
    # per-view mesh-lift dispatch disappear into the chain. Measured as the
    # production views-1..4 chain (S=4 prefix gather). Note the chain time
    # INCLUDES the per-view mesh lift that the per-view accounting never
    # charged (add_view's separate dispatch), so the chained-vs-fused
    # comparison below is conservative against chaining.
    chain_k, chain_s = 4, 4
    idxs4 = jnp.broadcast_to(
        jnp.arange(chain_s), (chain_k, batch, chain_s)
    )
    valids4 = jnp.stack(
        [jnp.arange(chain_s) < (j + 1) for j in range(chain_k)]
    )
    mvs4 = jnp.broadcast_to(mv0, (chain_k, batch, 4, 4))
    slots4 = jnp.arange(1, chain_k + 1, dtype=jnp.int32)

    def chain_call(seed):
        return pipe._cond_chain_fn(
            params_c, state.meshes, state.colors,
            jax.random.split(jax.random.PRNGKey(seed), chain_k),
            idxs4, valids4, mvs4, slots4, classes,
        )[2]

    sync(chain_call(11))
    best = 1e9
    for i in range(2):
        t0 = time.perf_counter()
        sync(chain_call(12 + i))
        best = min(best, time.perf_counter() - t0)
    t_chain4 = best - floor
    results["cond_chain4_s"] = t_chain4
    # Per-view chain cost with the chain's own slot rasters backed out, so
    # the 3x9 composition can re-charge rasters by bucket size.
    t_view_chain = t_chain4 / chain_k - chain_s * t_agg_batch
    results["cond_view_chained_s"] = t_view_chain

    # Eval protocol: 1000 uncond steps + 1 cond view (agg + 50-step DDIM).
    # Charge the A/B winner with floor-consistent accounting: the fused view
    # costs ONE dispatch floor, the separate path costs TWO (same asymmetry
    # fused_wins and t_3x9 use); the uncond chain's own floor is charged via
    # t_step which is already floor-subtracted per batch below.
    t_cond_view = min(t_cond_fused + floor, t_agg_batch + t_ddim_cond + 2 * floor)
    results["cond_view_s"] = t_cond_view
    t_per_batch = 1000 * t_step + t_cond_view
    samples_per_sec = batch / t_per_batch
    results["samples_per_sec_chip"] = samples_per_sec

    # Secondary: full 3x9 fusion (27-view scene per sample). Slot-raster
    # counts follow the pipeline's bucketing exactly (pipeline._slot_bucket;
    # mult4 default: 390 uncapped, 192 with the K=8 nearest-view cap); each
    # cond view adds one dispatch floor (fused agg+DDIM program) or two
    # (separate dispatches) — the measured winner. The PRIMARY 3x9 number is the
    # reference-exact uncapped loop — the K=8 nearest-view cap is a measured
    # LOSSY knob (tests/test_kcap_bound.py: 26.7% of conditioning-mask pixels
    # flip at 128²) and is reported alongside as such.
    from ivid_tpu.inference.pipeline import _slot_bucket

    def view_s(j, cap):
        return cap if (cap is not None and j > cap) else _slot_bucket(j, 27)

    def n_slots(cap):
        return sum(view_s(j, cap) for j in range(1, 27))

    def n_chains(cap, k_max=4):
        # Mirror of the pipeline's grouping: consecutive views sharing one
        # slot count S chain up to k_max per dispatch.
        chains, j = 0, 1
        while j < 27:
            s_run = view_s(j, cap)
            k = 1
            while k < k_max and j + k < 27 and view_s(j + k, cap) == s_run:
                k += 1
            chains += 1
            j += k
        return chains

    def t_3x9(cap):
        # Per-view cost: chained scan dispatches (per-view chain cost + the
        # view's bucket rasters; ONE floor per chain) vs the fused
        # single-dispatch program (ONE floor per view) vs separate agg+DDIM
        # dispatches (two floors) — charge the winner.
        slot_rasters = n_slots(cap)
        sep = 26 * (t_ddim_cond + 2 * floor) + slot_rasters * t_agg_batch
        fused = (
            26 * (t_cond_fused + floor)
            + (slot_rasters - 26) * t_agg_batch
        )
        chained = (
            26 * t_view_chain
            + slot_rasters * t_agg_batch
            + n_chains(cap) * floor
        )
        return 1000 * t_step + min(sep, fused, chained)

    results["full_3x9_scenes_per_sec"] = batch / t_3x9(None)
    results["full_3x9_scenes_per_sec_k8capped_lossy"] = batch / t_3x9(8)

    # SR cascade step (secondary metric; reference: configs/*_sr.json,
    # diffusion/trainers/superres.py:124 — 50-step guided DDIM at 256²).
    # Batch 27 = one 3x9 scene (measured MFU-optimal on v5e).
    cfg_s = Config.load("configs/rgbd_imagenet_adm_256_128_small_sr.json")
    model_s = build_backbone(cfg_s)
    fw_s = build_framework_from_config(cfg_s, model_s)
    sr_batch, sr_s = 27, 256
    shapes_s = jax.eval_shape(
        lambda: model_s.init(
            jax.random.PRNGKey(0), jnp.zeros((1, sr_s, sr_s, 8)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        )["params"]
    )
    params_s = jax.tree.map(lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes_s)
    cond_s = {
        "y": jnp.zeros((sr_batch, s, s, 4)),
        "classes": jnp.arange(sr_batch, dtype=jnp.int32),
    }
    ddim_s = jax.jit(
        lambda p, r: samplers.ddim_sample(
            fw_s, p, r, num=sr_batch, image_size=sr_s,
            cond=cond_s, guidance=3.0, steps=50,
        )["samples"]
    )
    sync(ddim_s(params_s, jax.random.PRNGKey(4)))
    best = 1e9
    for i in range(2):
        t0 = time.perf_counter()
        sync(ddim_s(params_s, jax.random.PRNGKey(5 + i)))
        best = min(best, time.perf_counter() - t0)
    results["sr_step_ms"] = (best - floor) / 50 * 1000

    # A100 reference estimate (see module docstring).
    a100_peak, a100_mfu = 156e12, 0.30
    t_step_a100 = 2 * batch * flops_per_fwd / (a100_peak * a100_mfu)
    baseline = batch / (1050 * t_step_a100)
    results["a100_estimate_samples_per_sec"] = baseline
    # Self-consistent 3x9 baseline: 1000 + 26*50 UNet steps, GL rasters free.
    baseline_3x9 = batch / (2350 * t_step_a100)
    results["a100_estimate_3x9_scenes_per_sec"] = baseline_3x9
    results["vs_baseline_3x9"] = results["full_3x9_scenes_per_sec"] / baseline_3x9

    print(
        json.dumps(
            {
                "metric": "multiview RGBD samples/sec/chip (128^2, uncond+cond)",
                "value": round(samples_per_sec, 5),
                "unit": "samples/sec/chip",
                "vs_baseline": round(samples_per_sec / baseline, 3),
                "detail": {k: round(v, 5) for k, v in results.items()},
            }
        )
    )


def _run_with_retries(attempts: int = 3, backoff_s: float = 240.0) -> None:
    """Run the bench in a fresh subprocess per attempt.

    The relayed TPU backend flaps (CLAUDE.md: worker crashes kill in-flight
    dispatches and can leave the in-process backend unusable for minutes), so
    a retry must start from a clean process. The persistent compilation cache
    makes retried attempts compile-free; only the final attempt's failure is
    fatal. The successful attempt's stdout (the one JSON line) passes through.
    """
    import os
    import subprocess
    import sys

    env = dict(os.environ, IVID_TPU_BENCH_INNER="1")
    for attempt in range(1, attempts + 1):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True,
        )
        sys.stdout.write(proc.stdout)
        sys.stderr.write(proc.stderr)
        sys.stdout.flush()
        sys.stderr.flush()
        if proc.returncode == 0:
            return
        if attempt < attempts:
            print(
                f"bench attempt {attempt} failed (rc={proc.returncode}); "
                f"retrying in {backoff_s:.0f}s",
                file=sys.stderr,
            )
            time.sleep(backoff_s)
    raise SystemExit(proc.returncode)


if __name__ == "__main__":
    import os

    if os.environ.get("IVID_TPU_BENCH_INNER") == "1":
        main()
    else:
        _run_with_retries()
