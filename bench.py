"""Headline bench: consensus/polish inner-loop throughput on one chip.

Measures the banded pair-HMM forward (the Arrow polish hot loop — the
reference pipeline's hottest kernel, SURVEY.md §3.4) in bases/sec/chip at
production shapes, and reports the speedup vs the SAME kernel compiled
for one CPU host (the reference's C-kernel-on-CPU stand-in; the upstream
repo publishes no numbers — BASELINE.md).

Prints exactly one JSON line.
"""
import functools
import json
import os
import subprocess
import sys
import time

import numpy as np


P, WIN, W = 256, 512, 128          # pairs per call, window len, band


def _measure(repeats: int = 20) -> float:
    import jax
    import jax.numpy as jnp
    from falcon_unzip_tpu.ops.pairhmm import (build_schedule, forward_core,
                                              params_vector, prepare_batch)
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, size=(P, WIN)).astype(np.int8)
    t = rng.integers(0, 4, size=(P, WIN)).astype(np.int8)
    n = np.full(P, WIN - 12, np.int32)
    m = np.full(P, WIN - 10, np.int32)
    qg, trg, G = prepare_batch(q, t, W)
    _, lo = build_schedule(WIN, WIN, W)
    fn = jax.jit(functools.partial(forward_core, W=W, Lt=WIN, G=G))
    args = (jnp.asarray(qg), jnp.asarray(trg), jnp.asarray(n),
            jnp.asarray(m), jnp.asarray(lo), jnp.asarray(params_vector()))
    fn(*args).block_until_ready()           # compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / repeats
    return P * int(n[0]) / dt               # consensus bases scored / sec


def main():
    bases_per_sec = _measure()

    # CPU-host baseline: same kernel, CPU backend, separate process (the
    # TPU plugin owns this process's backend registry)
    code = (
        "import jax,json;jax.config.update('jax_platforms','cpu');"
        "import bench;print(json.dumps(bench._measure(repeats=3)))"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code], cwd=os.path.dirname(
            os.path.abspath(__file__)), capture_output=True, text=True,
            timeout=900)
        cpu_bases = float(r.stdout.strip().splitlines()[-1])
    except Exception:
        cpu_bases = float("nan")

    vs = bases_per_sec / cpu_bases if cpu_bases == cpu_bases else 0.0
    print(json.dumps({
        "metric": "consensus_bases_per_sec_per_chip",
        "value": round(bases_per_sec, 1),
        "unit": "bases/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
