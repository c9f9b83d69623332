"""Amortized train-step timing on TPU: uncond and cond (in-step warp) steps.

Rebuilds the trainer's step function standalone with eval-shape zero params
(a real 550M init is a separate multi-minute XLA program) and times K steps
inside one jitted scan to amortize the ~40 ms relay dispatch floor.
"""

import os
import time
import types
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from ivid_tpu.config import Config, build_backbone, build_framework_from_config
from ivid_tpu.training.trainer import InpaintTrainer

BATCH = 16
S = 128
K = 3


def build(path):
    cfg = Config.load(path)
    model = build_backbone(cfg)
    fw = build_framework_from_config(cfg, model)
    c = cfg.backbone["args"]["in_channels"]
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, S, S, c)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        )["params"]
    )
    params = jax.tree.map(lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes)
    return model, fw, params, cfg


_FLOOR = [0.0]


def timed_steps(name, step_fn, params, opt_state, batch, reps=4):
    """One step per dispatch (a K-step scan would double-buffer the 550M
    state and OOM the 16GB chip); subtracts the measured dispatch floor."""
    run = jax.jit(step_fn, donate_argnums=(0, 1))
    seed = jax.random.PRNGKey(0)
    params, opt_state, loss = run(params, opt_state, seed, batch)
    _ = float(loss)
    best = 1e9
    for r in range(reps):
        t0 = time.perf_counter()
        params, opt_state, loss = run(
            params, opt_state, jax.random.fold_in(seed, r), batch
        )
        _ = float(loss)
        best = min(best, time.perf_counter() - t0)
    per = (best - _FLOOR[0]) * 1e3
    print(f"{name:40s} {per:8.1f} ms/step")
    return per


def main():
    print(f"device: {jax.devices()[0]}  batch={BATCH}")

    @jax.jit
    def nop(seed):
        return jnp.sum(seed * jnp.ones((8, 128)))

    _ = float(nop(jnp.int32(0)))
    t0 = time.perf_counter()
    for r in range(5):
        _ = float(nop(jnp.int32(r + 1)))
    _FLOOR[0] = (time.perf_counter() - t0) / 5
    print(f"dispatch floor: {_FLOOR[0]*1e3:.1f} ms")

    tx = optax.adamw(1e-4)

    # --- uncond ---
    model_u, fw_u, params_u, _ = build("configs/rgbd_imagenet_adm_128_large_cfg.json")
    opt_u = jax.jit(tx.init)(params_u)

    def step_u(params, opt_state, rng, batch):
        (loss, metrics), grads = jax.value_and_grad(
            fw_u.training_loss, has_aux=True
        )(params, rng, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    batch_u = {
        "x_0": jax.random.normal(jax.random.PRNGKey(1), (BATCH, S, S, 4)),
        "classes": jnp.arange(BATCH, dtype=jnp.int32),
    }
    timed_steps("uncond train step (550M, 128^2)", step_u, params_u, opt_u, batch_u)

    # --- cond (inpaint, in-step warp) ---
    model_c, fw_c, params_c, cfg_c = build("configs/rgbd_imagenet_adm_128_large_cond.json")
    opt_c = jax.jit(tx.init)(params_c)

    ds_args = cfg_c.dataset["args"]
    fake = types.SimpleNamespace(
        augments=list(ds_args.get("augments", [])),
        pose_std=float(ds_args.get("std", 0.15)),
        near=float(ds_args.get("near", 0.5)),
        far=float(ds_args.get("far", 100.0)),
        dataset=types.SimpleNamespace(image_size=S),
    )
    prepare = partial(InpaintTrainer.synthesize_cond, fake)
    print("augments:", fake.augments)

    def step_c(params, opt_state, rng, batch):
        r1, r2 = jax.random.split(rng)
        full = prepare(batch, r1)
        (loss, metrics), grads = jax.value_and_grad(
            fw_c.training_loss, has_aux=True
        )(params, r2, full)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # Structured depth: i.i.d.-noise depth fails the mesh disconnect test on
    # nearly every face, leaving the warp raster unrepresentatively cheap
    # (see bench.py); a smooth field keeps all faces live like real data.
    ii = jnp.linspace(0, 1, S)
    yy, xx = jnp.meshgrid(ii, ii, indexing="ij")
    base = 0.35 + 0.3 * yy + 0.05 * jnp.sin(xx * 21) * jnp.sin(yy * 17)
    ph = jnp.arange(BATCH, dtype=jnp.float32)[:, None, None] * 0.7
    depth01 = jnp.clip(base[None] + 0.02 * jnp.sin(xx[None] * 9 + ph), 0.05, 0.95)
    rgb01 = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, S, S, 3))
    batch_c = {
        "x_0": jnp.clip(
            jnp.concatenate([rgb01, depth01[..., None]], axis=-1) * 2 - 1,
            -0.99, 0.99,
        ),
        "classes": jnp.arange(BATCH, dtype=jnp.int32),
    }
    timed_steps("cond train step (in-step warp)", step_c, params_c, opt_c, batch_c)

    # --- cond step with host-synthesized conditioning (warp_host mode) ---
    # Under IVID_TPU_WARP_HOST the loader workers attach y/mask/pose on the
    # host CPU backend and the device step is prepare-free: this times the
    # step the trainer actually dispatches in that mode. The gap to the
    # in-step number is the device-side cost the overlap hides.
    full_c = jax.jit(prepare)(batch_c, jax.random.PRNGKey(7))

    def step_h(params, opt_state, rng, batch):
        (loss, metrics), grads = jax.value_and_grad(
            fw_c.training_loss, has_aux=True
        )(params, rng, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # params_c/opt_c were donated by the in-step timing; re-zero from shapes.
    params_c2 = jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), params_c)
    opt_c2 = jax.jit(tx.init)(params_c2)
    timed_steps(
        "cond train step (host-warp, precomputed)", step_h, params_c2, opt_c2,
        full_c,
    )

    # warp-synthesis (prepare_batch) alone, amortized in-program
    KP = 6

    @jax.jit
    def run_prep(seed):
        def body(c, i):
            out = prepare(batch_c, jax.random.fold_in(seed, i))
            return c + jnp.sum(out["y"]), None

        total, _ = jax.lax.scan(body, 0.0, jnp.arange(KP))
        return total

    _ = float(run_prep(jax.random.PRNGKey(0)))
    best = 1e9
    for r in range(3):
        t0 = time.perf_counter()
        _ = float(run_prep(jax.random.PRNGKey(r + 1)))
        best = min(best, time.perf_counter() - t0)
    print(f"{'prepare_batch (warp+augments) alone':40s} {(best - _FLOOR[0]) / KP * 1e3:8.1f} ms/step")


if __name__ == "__main__":
    main()
