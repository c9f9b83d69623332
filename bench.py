#!/usr/bin/env python
"""Benchmark: multiview RGBD samples/sec/chip on the eval protocol.

Measures the headline metric from BASELINE.json — multiview RGBD samples/sec
per chip at 128² for the README eval protocol (no fusion): 1000 uncond DDPM
steps + 50 cond DDIM steps + 1 condition aggregation per sample, batch 10,
flagship imagenet-128 models (reference: README.md:90, BASELINE.md).

Method: time a compiled 50-step CFG DDIM scan to get the per-UNet-step cost for
each model (uncond 4ch / cond 10ch — identical backbone FLOPs up to the input
conv), time the aggregation step, and compose the protocol cost. This avoids a
full 17-minute 1000-step run per measurement while timing exactly the compiled
programs the pipeline executes.

``vs_baseline`` compares against an ESTIMATED A100 reference throughput (the
reference repo publishes no numbers — BASELINE.md): per sampler step the
reference runs two sequential fp16 UNet forwards at batch 10 on one A100
(312 TFLOP/s peak dense fp16, 35% MFU assumed — generous for a torch eager
loop), plus the measured-free assumption of zero cost for its CPU↔OpenGL
conditioning round trips. FLOPs are taken from the XLA cost model of our own
forward. Prints ONE JSON line.
"""

import json
import time

import numpy as np


def timed(fn, *args, warmup=1, reps=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / reps, out


def main():
    import jax
    import jax.numpy as jnp

    from ivid_tpu.config import Config, build_backbone, build_framework_from_config
    from ivid_tpu.diffusion import samplers
    from ivid_tpu.inference.pipeline import ScenePipeline

    batch = 10
    s = 128
    results = {}

    cfg_u = Config.load("configs/rgbd_imagenet_adm_128_large_cfg.json")
    cfg_c = Config.load("configs/rgbd_imagenet_adm_128_large_cond.json")

    def build(cfg):
        model = build_backbone(cfg)
        fw = build_framework_from_config(cfg, model)
        c = cfg.backbone["args"]["in_channels"]
        x = jnp.zeros((1, s, s, c))
        params = model.init(
            jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )["params"]
        return model, fw, jax.device_put(params)

    model_u, fw_u, params_u = build(cfg_u)
    model_c, fw_c, params_c = build(cfg_c)
    classes = jnp.arange(batch, dtype=jnp.int32)

    # UNet FLOPs (per forward at batch 1) from the XLA cost model.
    fwd = jax.jit(
        lambda p, x, t, c: model_u.apply({"params": p}, x, t, c)
    )
    lowered = fwd.lower(
        params_u, jnp.zeros((1, s, s, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    cost = lowered.compile().cost_analysis()
    flops_per_fwd = float(cost.get("flops", 0.0))
    results["unet_gflops_per_forward"] = flops_per_fwd / 1e9

    # Timed 50-step CFG DDIM (uncond model): one compiled scan.
    ddim_u = jax.jit(
        lambda p, r: samplers.ddim_sample(
            fw_u, p, r, num=batch, image_size=s,
            cond={"classes": classes}, guidance=0.5, steps=50,
        )["samples"]
    )
    t50, _ = timed(ddim_u, params_u, jax.random.PRNGKey(0), warmup=1, reps=2)
    t_step = t50 / 50  # one CFG step = fused 2B-batch forward
    results["uncond_step_ms_batch10"] = t_step * 1000
    # MFU: 2 forwards x batch per step.
    v5e_peak = 197e12
    results["mfu"] = (2 * batch * flops_per_fwd / t_step) / v5e_peak

    # Cond model 50-step guided DDIM + 1-view aggregation via the pipeline step.
    pipe = ScenePipeline(
        fw_u, fw_c, image_size=s, steps_uncond=1000, steps_cond=50, guidance=0.5,
    )
    state = pipe.init_state(batch)
    rgbd01 = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(1), (batch, s, s, 4)), 0.01, 0.99
    )
    import ivid_tpu.inference.viewsets as vs

    mv0 = jnp.broadcast_to(jnp.asarray(vs.canonical_view()), (batch, 4, 4))
    state = pipe.add_view(state, 0, rgbd01, mv0)
    fn = pipe._get_cond_fn(1)
    sl = lambda x: x[:, :1]
    args = (
        params_c, jax.random.PRNGKey(2),
        jax.tree.map(sl, state.meshes), sl(state.colors),
        jnp.asarray(state.valid[:1]), mv0, classes,
    )
    t_cond_view, _ = timed(lambda: fn(*args), warmup=1, reps=2)
    results["cond_view_s_batch10"] = t_cond_view

    # Protocol composition (eval protocol, viewset random):
    # 1000 uncond steps + 1 cond view (50 steps + aggregation).
    t_per_batch = 1000 * t_step + t_cond_view
    samples_per_sec = batch / t_per_batch
    results["samples_per_sec_chip"] = samples_per_sec

    # --- A100 reference estimate (see module docstring / BASELINE.md) ---
    a100_peak, a100_mfu = 312e12, 0.35
    t_fwd_a100 = batch * flops_per_fwd / (a100_peak * a100_mfu)
    t_step_a100 = 2 * t_fwd_a100  # two sequential CFG forwards
    t_batch_a100 = 1050 * t_step_a100  # conditioning round trips assumed free
    baseline = batch / t_batch_a100
    results["a100_estimate_samples_per_sec"] = baseline

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


if __name__ == "__main__":
    main()
