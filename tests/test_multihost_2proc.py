"""Real 2-process multihost smoke test (VERDICT r3 #8): exercise
`ensure_initialized`'s jax.distributed.initialize branch — the code
BASELINE config 5 depends on — without TPU pod hardware, by spawning
two CPU-backend processes against a localhost coordinator."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, {repo!r})
import jax
# env vars alone do NOT displace the axon TPU plugin; the config knob does
jax.config.update("jax_platforms", "cpu")
from pbrt_tpu.dist import multihost

nproc, pid = multihost.ensure_initialized(
    coordinator={coord!r}, num_processes=2, process_id={pid})
import jax.numpy as jnp
assert nproc == 2, nproc
assert jax.process_count() == 2
assert jax.device_count() == 4, jax.device_count()   # 2 procs x 2 cpu devs

# a tiny sharded computation across BOTH processes: global psum
from jax.sharding import Mesh, PartitionSpec as P
mesh = Mesh(np.array(jax.devices()).reshape(4), ("d",))
def f(x):
    return jax.lax.psum(x * (jax.lax.axis_index("d") + 1), "d")
y = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("d"), out_specs=P("d")))(
    jnp.ones((4,)))
got = float(np.asarray(jax.device_get(y.addressable_shards[0].data))[0])
assert got == 10.0, got                               # 1+2+3+4
print("OK", pid, got, flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_init_and_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "PBRT_TPU_"))}
    procs = []
    for pid in range(2):
        code = _WORKER.format(repo=repo, coord=coord, pid=pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"OK {pid} 10.0" in out, out[-2000:]
