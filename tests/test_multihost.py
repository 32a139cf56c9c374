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


TP_WORKER = r"""
import json, os, sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

sys.path.insert(0, os.environ["AECF_REPO"])
from aecf_tpu.parallel import maybe_initialize_distributed

os.environ["JAX_COORDINATOR_ADDRESS"] = os.environ["COORD"]
os.environ["JAX_NUM_PROCESSES"] = "4"
os.environ["JAX_PROCESS_ID"] = os.environ["PROC_ID"]
maybe_initialize_distributed()

assert jax.process_count() == 4, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aecf_tpu.models import XrayAECFModel
from aecf_tpu.parallel.tensor_parallel import (
    make_tp_train_step, shard_params_tp,
)
from aecf_tpu.train.trainer import TrainState, make_train_step

# ('data', 'model') = (2, 4): jax.devices() orders by process (2 devices
# per process), so each model-axis group of 4 devices SPANS two
# processes — the TP all-reduce on the out-projection's partial sums
# rides the cross-process transport, which is exactly what a TP axis
# crossing hosts on a real pod does.
mesh = Mesh(
    np.asarray(jax.devices()).reshape(2, 4), ("data", "model")
)

model = XrayAECFModel(
    image_dim=32, text_dim=32, hidden_dim=16, num_classes=5, num_heads=4
)
img = np.asarray(jax.random.normal(jax.random.key(1), (32, 32)))
txt = np.asarray(jax.random.normal(jax.random.key(2), (32, 32)))
lab = np.asarray(
    (jax.random.uniform(jax.random.key(3), (32, 5)) < 0.3)
).astype(np.float32)
opt = optax.sgd(0.1)


def apply_fn(params, images, texts, rng):
    return model.apply(params, images, texts, training=False), {}


params = shard_params_tp(mesh, model.init(jax.random.key(0)))
state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
tp_step = make_tp_train_step(apply_fn, opt, mesh)


def globalize(x, spec):
    return jax.make_array_from_callback(
        x.shape, NamedSharding(mesh, spec), lambda idx: x[idx]
    )


expected = json.loads(os.environ["EXPECTED_LOSSES"])
losses = []
for i in range(len(expected)):
    gi = globalize(img, P("data"))
    gt = globalize(txt, P("data"))
    gl = globalize(lab, P("data"))
    state, loss, _ = tp_step(state, gi, gt, gl, jax.random.key(9))
    losses.append(float(loss))

np.testing.assert_allclose(losses, expected, rtol=1e-4)
pid = jax.process_index()
print(f"proc {pid}: cross-process TP losses match ({losses})", flush=True)
jax.distributed.shutdown()
"""


def test_four_process_cross_host_tp(tmp_path):
    """4 procs × 2 virtual devices, ('data','model') = (2, 4) mesh: the
    model axis spans processes, so the Megatron-style out-projection
    all-reduce crosses the process boundary (round-2 verdict Next #7 —
    as close to a real pod's cross-host TP as one box gets).  The TP
    losses must match a single-process unsharded run."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from aecf_tpu.models import XrayAECFModel
    from aecf_tpu.train.trainer import TrainState, make_train_step

    # Reference: unsharded step in THIS process (8-virtual-device CPU
    # conftest session), same inits/keys as the workers.
    model = XrayAECFModel(
        image_dim=32, text_dim=32, hidden_dim=16, num_classes=5, num_heads=4
    )
    img = jax.random.normal(jax.random.key(1), (32, 32))
    txt = jax.random.normal(jax.random.key(2), (32, 32))
    lab = (
        jax.random.uniform(jax.random.key(3), (32, 5)) < 0.3
    ).astype(jnp.float32)
    opt = optax.sgd(0.1)

    def apply_fn(params, images, texts, rng):
        return model.apply(params, images, texts, training=False), {}

    params = model.init(jax.random.key(0))
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(apply_fn, opt)
    expected = []
    for _ in range(3):
        state, loss, _ = step(state, img, txt, lab, jax.random.key(9))
        expected.append(float(loss))

    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "tp_worker.py"
    script.write_text(TP_WORKER)

    env_base = {
        **os.environ,
        "AECF_REPO": repo,
        "COORD": coord,
        "EXPECTED_LOSSES": json.dumps(expected),
        "XLA_FLAGS": "",
        "JAX_PLATFORMS": "cpu",
    }
    procs = []
    for pid in range(4):
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env={**env_base, "PROC_ID": str(pid)},
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
    assert any("cross-process TP losses match" in o for o in outs)


MULTISLICE_WORKER = r"""
import json, os, sys
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
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aecf_tpu.models import XrayAECFModel
from aecf_tpu.parallel.tensor_parallel import (
    make_tp_train_step, shard_params_tp,
)
from aecf_tpu.train.trainer import TrainState

# Multi-slice proxy: each PROCESS stands in for one SLICE (its 4 local
# devices = the slice's chips; the cross-process transport = DCN).
# jax.devices() orders by process, so reshape(2, 4) puts the 'data' axis
# ACROSS the slice boundary and 'model' WITHIN a slice — the standard
# multi-slice layout (DP gradient all-reduce over DCN, where traffic is
# lowest and overlappable; TP's per-layer all-reduces stay on ICI).
# See docs/design.md "Multi-slice / DCN" for what changes on real pods.
mesh = Mesh(
    np.asarray(jax.devices()).reshape(2, 4), ("data", "model")
)

model = XrayAECFModel(
    image_dim=32, text_dim=32, hidden_dim=16, num_classes=5, num_heads=4
)
img = np.asarray(jax.random.normal(jax.random.key(1), (32, 32)))
txt = np.asarray(jax.random.normal(jax.random.key(2), (32, 32)))
lab = np.asarray(
    (jax.random.uniform(jax.random.key(3), (32, 5)) < 0.3)
).astype(np.float32)
opt = optax.sgd(0.1)


def apply_fn(params, images, texts, rng):
    return model.apply(params, images, texts, training=False), {}


params = shard_params_tp(mesh, model.init(jax.random.key(0)))
state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
tp_step = make_tp_train_step(apply_fn, opt, mesh)


def globalize(x, spec):
    return jax.make_array_from_callback(
        x.shape, NamedSharding(mesh, spec), lambda idx: x[idx]
    )


expected = json.loads(os.environ["EXPECTED_LOSSES"])
losses = []
for i in range(len(expected)):
    gi = globalize(img, P("data"))
    gt = globalize(txt, P("data"))
    gl = globalize(lab, P("data"))
    state, loss, _ = tp_step(state, gi, gt, gl, jax.random.key(9))
    losses.append(float(loss))

np.testing.assert_allclose(losses, expected, rtol=1e-4)

# Chunked form: the SAME K updates as one compiled lax.scan chunk, the
# DP/TP collectives firing inside the scan body across the slice
# boundary.  Keys fold the global state.step, so a fresh state consumes
# exactly the sequential steps' keys (deterministic apply here, but the
# losses must still match step for step).
from aecf_tpu.parallel.tensor_parallel import make_tp_scan_train_step

K = len(expected)
params2 = shard_params_tp(mesh, model.init(jax.random.key(0)))
state2 = TrainState(params2, opt.init(params2), jnp.zeros((), jnp.int32))
chunk = make_tp_scan_train_step(apply_fn, opt, mesh, donate=False)
staged = tuple(
    globalize(np.stack([x] * K), P(None, "data")) for x in (img, txt, lab)
)
state2, chunk_losses, _ = chunk(state2, *staged, jax.random.key(9))
np.testing.assert_allclose(np.asarray(chunk_losses), expected, rtol=1e-4)

pid = jax.process_index()
print(f"slice {pid}: cross-slice DP losses match ({losses})", flush=True)
jax.distributed.shutdown()
"""


def test_two_slice_dp_across_slice_boundary(tmp_path):
    """Multi-slice proxy (round-3 verdict Next #8): 2 processes play 2
    slices of 4 chips; the ('data','model') = (2, 4) mesh puts DP across
    the slice boundary (gradient all-reduce over the DCN stand-in) and TP
    within a slice — the canonical multi-slice layout.  Losses must match
    a single-process unsharded run."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from aecf_tpu.models import XrayAECFModel
    from aecf_tpu.train.trainer import TrainState, make_train_step

    model = XrayAECFModel(
        image_dim=32, text_dim=32, hidden_dim=16, num_classes=5, num_heads=4
    )
    img = jax.random.normal(jax.random.key(1), (32, 32))
    txt = jax.random.normal(jax.random.key(2), (32, 32))
    lab = (
        jax.random.uniform(jax.random.key(3), (32, 5)) < 0.3
    ).astype(jnp.float32)
    opt = optax.sgd(0.1)

    def apply_fn(params, images, texts, rng):
        return model.apply(params, images, texts, training=False), {}

    params = model.init(jax.random.key(0))
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(apply_fn, opt)
    expected = []
    for _ in range(3):
        state, loss, _ = step(state, img, txt, lab, jax.random.key(9))
        expected.append(float(loss))

    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "multislice_worker.py"
    script.write_text(MULTISLICE_WORKER)

    env_base = {
        **os.environ,
        "AECF_REPO": repo,
        "COORD": coord,
        "EXPECTED_LOSSES": json.dumps(expected),
        "XLA_FLAGS": "",
        "JAX_PLATFORMS": "cpu",
    }
    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env={**env_base, "PROC_ID": str(pid)},
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
    assert any("cross-slice DP losses match" in o for o in outs)


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
