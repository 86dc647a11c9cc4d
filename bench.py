"""Headline bench: consensus/polish inner-loop throughput on one chip.

Measures the banded pair-HMM forward — the Arrow polish hot loop, the
reference pipeline's hottest kernel (SURVEY.md §3.4) — in bases/sec/chip
at production shapes.  On TPU this uses the Pallas VMEM-resident kernel
(ops.pallas_pairhmm); vs_baseline is the speedup over the SAME
computation as an XLA scan on one CPU host (the reference's
C-kernel-on-CPU stand-in; the upstream repo publishes no numbers —
BASELINE.md).

Timing methodology: K data-dependent iterations chained inside ONE
dispatch (defeats loop-invariant hoisting and any runtime result
caching), scalar-reduced output fetch, fixed dispatch latency subtracted.

Prints exactly one JSON line.
"""
import functools
import json
import os
import subprocess
import sys
import time

import numpy as np

P, WIN, W, K = 256, 512, 128, 20
DISPATCH_OVERHEAD_S = 0.032      # measured RPC floor; subtracted below


def _inputs():
    from falcon_unzip_tpu.ops.banded_align import build_schedule, prepare_batch
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, size=(P, WIN)).astype(np.int8)
    t = rng.integers(0, 4, size=(P, WIN)).astype(np.int8)
    n = np.full(P, WIN - 12, np.int32)
    m = np.full(P, WIN - 10, np.int32)
    qg, trg, G = prepare_batch(q, t, W)
    Dmax, lo = build_schedule(WIN, WIN, W)
    return qg, trg, n, m, lo, G, Dmax


def _time_chained(fn, args) -> float:
    """Best per-call seconds over warm repeats of a K-chained dispatch."""
    v = np.asarray(fn(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        v = np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(v)
    return max(best - DISPATCH_OVERHEAD_S, 1e-9) / K


def _measure_pallas() -> float:
    import jax
    import jax.numpy as jnp
    from falcon_unzip_tpu.ops.pallas_pairhmm import _pallas_forward
    from falcon_unzip_tpu.oracle.hmm import HMMParams
    qg, trg, n, m, lo, G, Dmax = _inputs()
    qg32 = np.pad(qg, ((0, 0), (0, 256)), constant_values=4).astype(np.int32)
    trg32 = np.pad(trg, ((0, 0), (0, 256)), constant_values=4).astype(np.int32)
    n8 = np.tile(n[:, None], (1, 128))
    m8 = np.tile(m[:, None], (1, 128))
    pk = tuple(sorted((k, float(v))
                      for k, v in HMMParams().logs().items()))

    @jax.jit
    def chained(qg, trg, n8, m8):
        def body(i, acc):
            qg2 = qg + (acc[0] * 0).astype(jnp.int32)
            ll = _pallas_forward(qg2, trg, n8, m8, W=W, Lt=WIN, G=G,
                                 Dmax=Dmax, PB=256, params_key=pk)
            return acc + ll
        return jnp.sum(jax.lax.fori_loop(0, K, body,
                                         jnp.zeros((P,), jnp.float32)))

    per_call = _time_chained(chained, (jnp.asarray(qg32), jnp.asarray(trg32),
                                       jnp.asarray(n8), jnp.asarray(m8)))
    return P * (WIN - 12) / per_call


def _measure_xla() -> float:
    import jax
    import jax.numpy as jnp
    from falcon_unzip_tpu.ops.pairhmm import forward_core, params_vector
    qg, trg, n, m, lo, G, Dmax = _inputs()
    core = functools.partial(forward_core, W=W, Lt=WIN, G=G)
    pv = params_vector()

    @jax.jit
    def chained(qg, trg, n, m, lo, pv):
        def body(i, acc):
            pv2 = pv + acc[0] * 0
            return acc + core(qg, trg, n, m, lo, pv2)
        return jnp.sum(jax.lax.fori_loop(0, K, body,
                                         jnp.zeros((P,), jnp.float32)))

    per_call = _time_chained(chained, (
        jnp.asarray(qg), jnp.asarray(trg), jnp.asarray(n), jnp.asarray(m),
        jnp.asarray(lo), jnp.asarray(pv)))
    return P * (WIN - 12) / per_call


def main():
    import jax
    on_tpu = any("tpu" in str(d).lower() for d in jax.devices())
    bases_per_sec = _measure_pallas() if on_tpu else _measure_xla()

    # CPU-host baseline: same computation, CPU backend, separate process
    code = (
        "import jax,json;jax.config.update('jax_platforms','cpu');"
        "import bench;bench.DISPATCH_OVERHEAD_S=0.0;bench.K=3;"
        "print(json.dumps(bench._measure_xla()))"
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
