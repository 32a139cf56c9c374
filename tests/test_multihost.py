"""Multi-process distributed bring-up (SURVEY §2.4 comm backend).

Spawns two REAL processes that form a jax.distributed cluster over the CPU
backend (4 virtual devices each → 8 global), exercising
``maybe_initialize_distributed`` exactly as a 2-host TPU pod would use it:
COORDINATOR_ADDRESS env → jax.distributed.initialize → global mesh →
shard_map psum across processes.

This is the closest a single box gets to testing the multi-host path; the
collectives ride the same jax.distributed machinery as ICI/DCN on real
pods.
"""

import os
import socket
import subprocess
import sys


WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

sys.path.insert(0, os.environ["AECF_REPO"])
from aecf_tpu.parallel import maybe_initialize_distributed

os.environ["JAX_COORDINATOR_ADDRESS"] = os.environ["COORD"]
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = os.environ["PROC_ID"]
maybe_initialize_distributed()

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))

@jax.jit
def global_sum(x):
    def f(x):
        return jax.lax.psum(x.sum(), "data")
    return jax.shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P())(x)

# each process contributes its local shard of a global arange(16)
pid = jax.process_index()
local = jnp.arange(16, dtype=jnp.float32)[pid * 8 : (pid + 1) * 8]
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray(local), (16,)
)
total = float(global_sum(garr))
assert total == 120.0, total
print(f"proc {pid}: global psum ok ({total})", flush=True)
jax.distributed.shutdown()
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    env_base = {
        **os.environ,
        "AECF_REPO": repo,
        "COORD": coord,
        # isolate from the parent test session's XLA flags / TPU plugin
        "XLA_FLAGS": "",
        "JAX_PLATFORMS": "cpu",
    }
    procs = []
    for pid in ("0", "1"):
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env={**env_base, "PROC_ID": pid},
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
    assert any("global psum ok (120.0)" in o for o in outs)
