"""Multi-host initialization path (reference dist.init_process_group analog).

Real multi-host needs multiple machines; this exercises the actual
jax.distributed.initialize call single-host (coordinator + num_processes=1),
in a subprocess so the coordination service doesn't leak into other tests.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CODE = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
import sys
sys.path.insert(0, {repo!r})
import jax
from yolov3_tpu.parallel.mesh import create_mesh, initialize_distributed, replicate, shard_batch

initialize_distributed("localhost:12393", 1, 0)
assert jax.process_count() == 1 and jax.process_index() == 0
import numpy as np
mesh = create_mesh()
batch = shard_batch(mesh, np.zeros((len(jax.devices()), 4), np.float32))
tree = replicate(mesh, {{"w": np.ones(3, np.float32)}})
print("distributed init OK:", jax.process_count(), "process;", len(jax.devices()), "devices")
""".format(repo=str(REPO))


def test_initialize_distributed_single_host():
    r = subprocess.run([sys.executable, "-c", CODE], capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "distributed init OK" in r.stdout
