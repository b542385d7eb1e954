"""Multi-process distributed layer (parallel/distributed.py): a real
2-process ``jax.distributed.initialize`` smoke test over localhost, plus
the multi-host forest_mesh layout.

Each worker initializes the distributed runtime BEFORE importing the
package (module-level jnp constants would initialize the XLA backend,
after which initialize() is rejected), then checks process count, the
global device view, a cross-process allgather, and the (replica, shard)
mesh split that keeps forest candidate merges on the ICI axis.
"""

import subprocess
import sys

import pytest

WORKER = '''
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
pid = int(sys.argv[1]); port = sys.argv[2]
# the slurm-multihost env contract (bench/launcher emits these; srun sets
# SLURM_PROCID per task) — initialize() derives its args from them
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["SLURM_PROCID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")
# load parallel/distributed.py standalone (importing the package __init__
# would initialize the XLA backend before jax.distributed.initialize)
import importlib.util
_here = os.path.dirname(os.path.abspath(__file__)) if "__file__" in \
    globals() else os.getcwd()
_spec = importlib.util.spec_from_file_location(
    "dist_standalone", os.path.join(
        _here, "rag_cobweb_tpu", "parallel", "distributed.py"))
_dist = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_dist)
_dist.initialize()   # no args: everything comes from the env contract
import jax.numpy as jnp
from jax.experimental.multihost_utils import process_allgather

assert jax.process_count() == 2
assert len(jax.devices()) == 4          # 2 local per process, global view
assert len(jax.local_devices()) == 2
g = process_allgather(jnp.full((3,), pid, jnp.int32))
assert g.shape == (2, 3), g.shape

from rag_cobweb_tpu.parallel.distributed import forest_mesh
mesh = forest_mesh()
# multi-host: (replica=hosts, shard=devices-per-host)
assert mesh.axis_names == ("replica", "shard"), mesh.axis_names
assert mesh.devices.shape == (2, 2), mesh.devices.shape
print(f"worker {pid} ok", flush=True)
'''


def test_two_process_initialize_and_mesh(tmp_path):
    port = "12761"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2000:]}"
        assert f"worker {i} ok" in out
