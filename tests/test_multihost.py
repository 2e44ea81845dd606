"""2-process jax.distributed smoke test (CPU backend).

Exercises parallel.multihost.initialize + pod_mesh across REAL process
boundaries — the multi-host entry path the reference's MPI mode never tested
(SURVEY.md §4). Two subprocesses each expose 2 virtual CPU devices, join one
jax.distributed cluster (4 global devices), build the pod mesh, and run a
jitted psum-backed reduction over a gene-sharded array spanning both
processes (cross-process CPU collectives via XLA's Gloo backend).
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
sys.path.insert(0, os.environ["PPCSEQ_REPO"])

import numpy as np
import jax

# the axon sitecustomize force-registers the TPU platform at interpreter
# start; override back to CPU before any backend/distributed use
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from ppcseq_tpu.parallel import multihost

pid = int(sys.argv[1])
# sitecustomize presets TPU_WORKER_HOSTNAMES, which would make
# jax.distributed auto-detect a (bogus) TPU cluster topology
os.environ.pop("TPU_WORKER_HOSTNAMES", None)
multihost.initialize(
    coordinator_address=os.environ["PPCSEQ_COORD"],
    num_processes=2,
    process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

mesh = multihost.pod_mesh()
assert set(mesh.axis_names) == {"chains", "genes"}
assert mesh.devices.size == 4

# a psum-backed global reduction over a gene-sharded array spanning processes
from jax.sharding import NamedSharding, PartitionSpec as P

gene_mesh = multihost.pod_mesh(chains_axis=1)
G = 8
sharding = NamedSharding(gene_mesh, P(None, "genes"))
local = np.arange(G, dtype=np.float32)[None, :]  # every process holds the global value
arr = jax.make_array_from_process_local_data(sharding, local, (1, G))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(gene_mesh, P()))(arr)
# fully-addressable result: every process can read it
val = float(np.asarray(total))
assert val == float(np.arange(G).sum()), val

print(f"proc {pid} OK devices={jax.device_count()} sum={val}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["PPCSEQ_REPO"] = repo
    env["PPCSEQ_COORD"] = f"127.0.0.1:{_free_port()}"
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK devices=4" in out, out
