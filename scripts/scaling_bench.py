"""Multi-device scaling harness: reads/s efficiency 1 -> N devices.

North-star gate (BASELINE.md): >=80% reads/s scaling efficiency from 1
host to N hosts.  Real pods aren't available in this environment, so
this harness measures the sharded phasing step over a virtual CPU mesh
(the device programs and collectives are identical on a pod; only the
interconnect constant changes).  Run with:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_bench.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the sitecustomize pre-registers the remote TPU backend, so env vars are
# too late — force the virtual CPU mesh through jax.config (conftest.py
# does the same for the test suite)
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def measure(n_devices: int, R_per_dev: int = 512, T: int = 64,
            t_len: int = 4096, reps: int = 3) -> float:
    import jax
    import jax.numpy as jnp
    from falcon_unzip_tpu.parallel.mesh import make_mesh
    from falcon_unzip_tpu.parallel.sharding import make_phase_step

    mesh = make_mesh(n_devices, window_par=1)
    R = R_per_dev * n_devices
    rng = np.random.default_rng(0)
    tagpos = rng.integers(0, t_len, size=(R, T)).astype(np.int32)
    tagbase = rng.integers(0, 4, size=(R, T)).astype(np.int32)
    step = make_phase_step(mesh, t_len=t_len, s_cap=128, max_span=32,
                           min_depth=2)
    args = (jnp.asarray(tagpos), jnp.asarray(tagbase))
    jax.block_until_ready(step(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(step(*args))
        best = min(best, time.perf_counter() - t0)
    return R / best     # reads/s (weak scaling: R grows with devices)


def main():
    import jax
    avail = len(jax.devices())
    results = {}
    for n in (1, 2, 4, 8):
        if n > avail:
            break
        results[n] = measure(n)
    base = results.get(1)
    out = {
        "metric": "phase_step_reads_per_sec",
        "per_devices": {str(n): round(v, 1) for n, v in results.items()},
    }
    if base:
        out["scaling_efficiency"] = {
            str(n): round(v / (base * n), 3) for n, v in results.items()}
    if jax.devices()[0].platform == "cpu":
        out["caveat"] = (
            "virtual CPU devices share physical cores: efficiency here "
            "reflects host oversubscription, not the SPMD design; run on "
            "a pod slice for the real 1->N hosts number")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
