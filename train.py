#!/usr/bin/env python
"""Training CLI.

Mirrors the reference entry point (reference: train.py:102-162): JSON config +
flag merge, component construction from registries, latest-checkpoint resume,
and run-directory artifacts (command.txt / config.json). Where the reference
spawns one NCCL process per GPU (train.py:159-162), JAX addresses every local
device through one process and a device mesh; multi-host pods initialize
through ``jax.distributed`` (``--distributed``).
"""

import argparse
import json
import os
import sys


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True, help="Config JSON file")
    p.add_argument("--output_dir", type=str, default="results", help="Output root")
    p.add_argument("--data_dir", type=str, default="data", help="Dataset root")
    p.add_argument("--load_dir", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None, help="Step to resume, or 'latest'")
    p.add_argument("--model_parallel", type=int, default=1, help="TP mesh size")
    p.add_argument("--distributed", action="store_true", help="Multi-host init")
    p.add_argument("--max_steps", type=int, default=None, help="Override config")
    p.add_argument(
        "--profile_dir", type=str, default=None,
        help="Trace the first steps with jax.profiler into this directory",
    )
    return p.parse_args()


def main():
    opt = parse_args()
    if opt.distributed:
        import jax

        jax.distributed.initialize()

    import jax

    from ivid_tpu.utils.runtime import enable_compilation_cache, setup_platform

    setup_platform()
    enable_compilation_cache()

    from ivid_tpu.config import Config, build_backbone, build_framework_from_config
    from ivid_tpu.data import DATASETS
    from ivid_tpu.training import checkpoint as ckpt_io
    from ivid_tpu.training.trainer import TRAINERS

    cfg = Config.load(opt.config)
    name = os.path.splitext(os.path.basename(opt.config))[0]
    output_dir = os.path.join(opt.output_dir, name)
    os.makedirs(output_dir, exist_ok=True)

    dataset = DATASETS[cfg.dataset["name"]](
        opt.data_dir, **cfg.dataset.get("args", {})
    )
    cfg.resolve_num_classes(dataset.num_classes)

    model = build_backbone(cfg)
    framework = build_framework_from_config(cfg, model)

    trainer_args = dict(cfg.trainer.get("args", {}))
    if opt.max_steps is not None:
        trainer_args["max_steps"] = opt.max_steps
    trainer_cls = TRAINERS[cfg.trainer["name"]]
    if trainer_cls is not TRAINERS["BasicTrainer"]:
        trainer_args.setdefault("backbone_args", cfg.backbone.get("args", {}))
    trainer = trainer_cls(
        framework, dataset, output_dir,
        model_parallel=opt.model_parallel, **trainer_args,
    )

    if jax.process_index() == 0:
        # Run-directory artifacts (reference: train.py:88-89,146-149).
        with open(os.path.join(output_dir, "command.txt"), "a") as f:
            print(" ".join(sys.argv), file=f)
        cfg.save(os.path.join(output_dir, "config.json"))
        try:
            import jax.numpy as jnp

            from ivid_tpu.utils.summary import model_summary

            s = dataset.image_size
            c = cfg.backbone["args"]["in_channels"]
            example = (
                jnp.zeros((1, s, s, c)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1,), jnp.int32) if model.num_classes else None,
            )
            with open(os.path.join(output_dir, "model_summary.txt"), "w") as f:
                f.write(model_summary(model, trainer.params, example))
        except Exception as e:  # noqa: BLE001 — summary is best-effort
            print(f"model summary failed: {e}")

    step = opt.ckpt
    if step == "latest":
        step = ckpt_io.find_latest_step(opt.load_dir or output_dir)
    if step is not None:
        trainer.load(opt.load_dir or output_dir, int(step))
        print(f"Resumed from step {trainer.step}")

    if opt.profile_dir:
        from ivid_tpu.utils.profiling import trace

        with trace(opt.profile_dir):
            for _ in range(3):
                metrics = trainer.run_step()
                trainer.step += 1  # profiled steps are real optimizer steps — count them
            jax.block_until_ready(metrics)
        print(
            f"profiler trace written to {opt.profile_dir} "
            f"(3 steps profiled; trainer resumes at step {trainer.step})"
        )

    trainer.run()


if __name__ == "__main__":
    main()
