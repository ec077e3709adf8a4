"""True multi-process ``jax.distributed`` handshake on CPU.

Two OS processes x 4 forced host devices = one global 8-device data
mesh, exercising ``maybe_initialize_distributed`` (the multi-host story
the reference lacks — SURVEY.md §2: no NCCL/MPI/Gloo anywhere) and
``stage_global_batch`` (wrap-pad + ``_valid`` masking) end to end over
the Gloo collectives backend, including a jitted global masked reduce.
"""

import os
import pathlib
import socket
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]

WORKER = r'''
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[3])
from argparse import Namespace
import numpy as np
from medical_image_segmentation_with_visual_prompts_tpu.parallel.\
    distributed import maybe_initialize_distributed, stage_global_batch
from medical_image_segmentation_with_visual_prompts_tpu.parallel.mesh \
    import make_mesh

pid = int(sys.argv[1]); port = sys.argv[2]
conf = Namespace(distributed=True,
                 coordinator_address=f"localhost:{port}",
                 num_processes=2, process_id=pid)
assert maybe_initialize_distributed(conf) is True
assert jax.process_count() == 2
assert jax.device_count() == 8 and jax.local_device_count() == 4
mesh = make_mesh(8)

# Local batch of 3 on 4 local devices -> wrap-pad 1 sample per process,
# masked out of the reduction via the staged `_valid` vector.
batch = {"image": np.full((3, 2, 2, 2, 1), pid + 1, np.float32),
         "name": ["x"]}
staged = stage_global_batch(mesh, batch)
assert staged["image"].shape == (8, 2, 2, 2, 1)
valid = staged["_valid"]
assert valid.shape == (8,)

@jax.jit
def masked_mean(x, v):
    w = v[:, None, None, None, None]
    return (x * w).sum() / (v.sum() * x[0].size)

m = masked_mean(staged["image"], valid)
# Mean over the REAL samples only: (3*1 + 3*2) / 6 = 1.5.
np.testing.assert_allclose(float(m), 1.5, rtol=1e-6)
print("WORKER_OK", pid)
'''


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_stage_and_reduce(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    # The workers pick their own backend; drop the axon platform pin.
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port), str(ROOT)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        results.append((p.returncode, out, err))
    for rc, out, err in results:
        assert rc == 0, err[-2000:]
        assert "WORKER_OK" in out
