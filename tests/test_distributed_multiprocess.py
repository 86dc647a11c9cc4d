"""True multi-process jax.distributed test (SURVEY.md §4: multi-host via
multiprocess CPU so no pod is needed).

Two OS processes each own 2 virtual CPU devices and join one
jax.distributed world (GRPC coordinator = the DCN stand-in); a psum over
the global 4-device mesh and the sharded pileup must see ALL processes'
data.  This exercises the cross-host path that single-process mesh tests
cannot (process coordination, global device enumeration, cross-process
collectives).
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
from falcon_unzip_tpu.parallel.distributed import initialize
initialize(coordinator_address=f"localhost:{port}", num_processes=2,
           process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

mesh = Mesh(np.array(jax.devices()).reshape(4, 1), ("data", "window"))

# global psum: every process contributes its local shard
from jax import shard_map
@jax.jit
@lambda f: shard_map(f, mesh=mesh, in_specs=P(("data", "window")),
                     out_specs=P())
def total(x):
    return jax.lax.psum(x.sum(), ("data", "window"))

# a global (8,) array: each process supplies its local half via
# make_array_from_process_local_data
sharding = NamedSharding(mesh, P(("data", "window")))
local = np.full(4, 1 + jax.process_index(), np.int32)   # proc0: 1s, proc1: 2s
garr = jax.make_array_from_process_local_data(sharding, local, (8,))
out = int(jax.device_get(total(garr)))
assert out == 4 * 1 + 4 * 2, out     # sees BOTH processes' data
print(f"OK process={jax.process_index()} total={out}", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(i), str(port)],
        cwd=repo, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2000:]}"
        assert f"total={12}" in out, out[-500:]
