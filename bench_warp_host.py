"""Host-warp overlap DEMONSTRATION (not calculation): loader-fed cond steps.

The round-4 ledger's 1.06x cond-vs-uncond headline measured the device step
with conditioning pre-attached; whether loader workers can actually keep the
chip fed was arithmetic (data/warp_host.py sizing model:
``workers >= batch * t_warp / t_step``). This harness tests the model's
prediction on the real chip with this box's single host core:

1. t_warp   — host per-sample synthesis time (HostWarpDataset.__getitem__,
              jitted CPU program, steady state).
2. t_dev    — device step time alone (jitted update on a prefetched batch).
3. steps/s  — ~N_STEPS loader-fed steps end to end (warp_host=True,
              IVID_TPU_LOADER_MODE=process), two regimes:
              - batch small enough that 1 worker keeps up (device-bound;
                prediction: t_step ~= max(t_dev, B*t_warp) = t_dev)
              - batch large enough that the loader starves the chip
                (loader-bound; prediction: t_step ~= B*t_warp).

PASS = measured steps/s within ~20% of max(t_dev, B*t_warp/W) in both
regimes (reference behavior being modeled: datasets/base.py:215-238, torch
DataLoader workers hiding the warp).

Run: python bench_warp_host.py [--steps 30] [--batches 2,8]
"""

from __future__ import annotations

import argparse
import os
import time

# Loader knobs must be pinned before the trainer builds its loader.
os.environ.setdefault("IVID_TPU_LOADER_MODE", "process")
os.environ.setdefault("IVID_TPU_LOADER_WORKERS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from ivid_tpu.utils.runtime import setup_platform

setup_platform()  # honor IVID_TPU_PLATFORM=cpu for harness smoke runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batches", type=str, default="2,8")
    ap.add_argument("--image_size", type=int, default=32)
    # Raise to push the device step above B*t_warp/W (device-bound regime)
    # on a host too slow to ever be device-bound at the default size.
    ap.add_argument("--model_channels", type=int, default=64)
    args = ap.parse_args()

    from ivid_tpu.data import SyntheticRGBDWarp
    from ivid_tpu.data.warp_host import HostWarpDataset
    from ivid_tpu.diffusion import build_framework
    from ivid_tpu.models import build_adm_unet
    from ivid_tpu.training.trainer import InpaintTrainer

    s = args.image_size
    augments = ("prewarp_noise", "postwarp_noise", "blur", "erode_rgb")
    backbone = dict(
        image_size=s, in_channels=10, out_channels=4,
        model_channels=args.model_channels,
        num_res_blocks=2, channel_mult=[1, 2], attention_resolutions=[16],
        num_groups=32, num_heads=None, num_head_channels=32,
        num_classes=None, has_null_class=False, dropout=0.0, use_fp16=True,
    )
    workers = int(os.environ["IVID_TPU_LOADER_WORKERS"])

    # 1. Host warp cost (steady state, 1 core).
    ds = SyntheticRGBDWarp(
        image_size=s, length=4096, augments=augments, std=0.15,
        normalize=True, normalize_depth=True, prepocess_depth="z_buffer",
    )
    hw = HostWarpDataset(
        ds, augments=augments, pose_std=0.15, near=ds.near, far=ds.far
    )
    _ = hw[0]  # compile the CPU synthesis program
    t0 = time.perf_counter()
    n_warm = 8
    for i in range(1, 1 + n_warm):
        _ = hw[i]
    t_warp = (time.perf_counter() - t0) / n_warm
    print(f"host warp synthesis: {t_warp * 1000:.1f} ms/sample (1 core)")

    for batch in [int(b) for b in args.batches.split(",")]:
        model = build_adm_unet(backbone)
        fw = build_framework(
            "InpaintCFG", model,
            {"timesteps": 1000, "beta_schedule": "linear", "p_uncond": 0.1},
        )
        tr = InpaintTrainer(
            fw, ds, f"/tmp/bench_warp_host_{batch}", max_steps=10**9,
            batch_size=batch, i_log=10**9, i_sample=10**9, i_save=10**9,
            i_ddpcheck=10**9, backbone_args=backbone, warp_host=True,
        )
        assert isinstance(tr._loader_obj.dataset, HostWarpDataset)

        # 2. Device step alone: jitted update on one prefetched batch,
        # varied rng per rep (the relayed backend result-caches). The step
        # donates params/opt_state/ema — thread the returned state through.
        batch0 = tr._global_batch(next(tr.loader))
        state = (tr.params, tr.opt_state, tr.ema_params)
        for i in range(2):  # compile + warm
            out = tr._step_fn(*state, jax.random.PRNGKey(i), batch0)
            state = out[:3]
            _ = float(out[3]["loss"])
        t0 = time.perf_counter()
        reps = 5
        for i in range(reps):
            out = tr._step_fn(*state, jax.random.PRNGKey(10 + i), batch0)
            state = out[:3]
            _ = float(out[3]["loss"])
        t_dev = (time.perf_counter() - t0) / reps
        tr.params, tr.opt_state, tr.ema_params = state

        # 3. Loader-fed steps end to end.
        for _ in range(2):
            tr.run_step()
        t0 = time.perf_counter()
        for _ in range(args.steps):
            m = tr.run_step()
        _ = float(m["loss"])
        t_fed = (time.perf_counter() - t0) / args.steps

        t_pred = max(t_dev, batch * t_warp / workers)
        regime = "device-bound" if t_dev >= batch * t_warp / workers else "loader-bound"
        print(
            f"batch {batch:2d}: device step {t_dev * 1000:7.1f} ms | "
            f"loader-fed {t_fed * 1000:7.1f} ms/step | "
            f"sizing-model prediction {t_pred * 1000:7.1f} ms ({regime}) | "
            f"ratio measured/pred {t_fed / t_pred:.2f}"
        )


if __name__ == "__main__":
    main()
