"""Two-process ``jax.distributed`` regression test on the CPU backend.

The reference exercises multi-node only on real clusters (SURVEY.md §4;
reference: train.py:124-128). Here two actual processes rendezvous through
``jax.distributed.initialize`` (gloo collectives), each owning 2 virtual CPU
devices of a 4-device global mesh, and run the real trainer:

- sharded training steps over the global mesh (the DDP analog);
- the loader's global-batch contract: each process fetches ONLY its local
  ``batch_size / process_count`` row block (no ``num_shards×`` over-fetch);
- ``check_replication`` across processes at init;
- the collective sampling visualization (all processes enter the program,
  master writes the grids).
"""

import pytest

pytestmark = pytest.mark.slow

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
port = sys.argv[2]
out_dir = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2 and len(jax.devices()) == 4

import numpy as np
from ivid_tpu.data import SyntheticRGBD
from ivid_tpu.diffusion.frameworks import build_framework
from ivid_tpu.models import build_adm_unet
from ivid_tpu.training.trainer import BasicTrainer

cfg = dict(
    image_size=16, in_channels=4, out_channels=4, model_channels=16,
    num_res_blocks=1, channel_mult=[1, 2], attention_resolutions=[8],
    num_groups=8, num_heads=None, num_head_channels=8, num_classes=None,
    has_null_class=False, dropout=0.0, use_fp16=False,
)
model = build_adm_unet(cfg)
fw = build_framework(
    "GaussianDiffusion", model, {"timesteps": 50, "beta_schedule": "linear"}
)
ds = SyntheticRGBD(image_size=16, length=64, normalize=True,
                   normalize_depth=True, prepocess_depth="z_buffer")
tr = BasicTrainer(
    fw, ds, out_dir, batch_size=8, max_steps=2, learning_rate=1e-4,
    i_log=1, i_sample=10**9, i_save=10**9, sample_at_init=False,
)
losses = []
for _ in range(2):
    m = tr.run_step()
    tr.step += 1
    losses.append(float(jax.device_get(m["loss"])))

# Collective visualization: every process enters; master writes.
tr.sample(suffix="mp", num_samples=4, batch_size=4)

res = {
    "pid": pid,
    "losses": losses,
    "items_loaded": tr._loader_obj.items_loaded,
    "local_rows": tr._loader_obj.local_batch_size,
    "ok": all(np.isfinite(losses)),
}
with open(os.path.join(out_dir, f"result_{pid}.json"), "w") as f:
    json.dump(res, f)
print("worker", pid, "done", res, flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_training(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    results = []
    for i in range(2):
        with open(tmp_path / f"result_{i}.json") as f:
            results.append(json.load(f))
    for r in results:
        assert r["ok"], r
        # Global batch 8 over 2 processes => 4 local rows per step; the
        # prefetch pipeline keeps a few batches in flight. The round-2
        # over-fetch would have loaded 8 rows/batch per process.
        assert r["local_rows"] == 4
        max_batches_fetched = 2 + 4 + 1  # steps + prefetch + one submit-ahead
        assert r["items_loaded"] <= max_batches_fetched * 4, r
    # Lockstep training: identical replicated state on both processes.
    assert results[0]["losses"] == results[1]["losses"], results
    # Master (and only the master) wrote the sampling grids.
    assert (tmp_path / "samples" / "rgb_mp.png").exists()
