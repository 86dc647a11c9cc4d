"""Ablation timing of the pair-HMM pallas kernel step components."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
W, PB, Dmax = 128, 128, 1025
LQG = 1024


def make(feats):
    def kern(qg_ref, out_ref, M1_ref, I1_ref, D1_ref, M2_ref, I2_ref, D2_ref):
        neg = jnp.float32(NEG)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (PB, W), 1)
        col0 = w_iota == 0
        nf = jnp.full((PB, W), neg, jnp.float32)
        M1_ref[:] = nf; I1_ref[:] = nf; D1_ref[:] = nf
        M2_ref[:] = nf; I2_ref[:] = nf; D2_ref[:] = nf
        out_ref[:] = nf

        def shift_m1(V):
            return jnp.where(col0, neg, pltpu.roll(V, shift=1, axis=1))

        def step(d, _):
            lo = jnp.maximum(0, (d + 1) // 2 - W // 2)
            s1 = lo - jnp.maximum(0, d // 2 - W // 2)
            M1 = M1_ref[:]; I1 = I1_ref[:]; D1 = D1_ref[:]
            M2 = M2_ref[:]; I2 = I2_ref[:]; D2 = D2_ref[:]
            if 'shift' in feats:
                Md = jnp.where(s1 == 0, shift_m1(M2), M2)
                Mu = jnp.where(s1 == 0, shift_m1(M1), M1)
            else:
                Md, Mu = M2, M1
            if 'load' in feats:
                N = W + 128
                base = pl.multiple_of((lo // 128) * 128, 128)
                win = qg_ref[:, pl.ds(base, N)]
                r = lo - base
                qi = pltpu.roll(win, (N - r) % N, axis=1)[:, :W]
                em = jnp.where(qi < 4, jnp.float32(-0.1), jnp.float32(-3.0))
            else:
                em = jnp.float32(-0.1)
            if 'lse' in feats:
                M = em + jnp.logaddexp(jnp.logaddexp(Md - 0.1, I2 - 3.0), D2 - 3.0)
                I = jnp.logaddexp(Mu - 3.0, I1 - 1.6)
                D = jnp.logaddexp(M1 - 3.0, D1 - 1.6)
            else:
                M = em + jnp.maximum(jnp.maximum(Md, I2), D2)
                I = jnp.maximum(Mu, I1)
                D = jnp.maximum(M1, D1)
            out_ref[:] = jnp.maximum(out_ref[:], M)
            M2_ref[:] = M1; I2_ref[:] = I1; D2_ref[:] = D1
            M1_ref[:] = M; I1_ref[:] = I; D1_ref[:] = D
            return 0

        jax.lax.fori_loop(0, Dmax, step, 0)

    @jax.jit
    def run(qg):
        return pl.pallas_call(
            kern,
            grid=(qg.shape[0] // PB,),
            in_specs=[pl.BlockSpec((PB, LQG), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((PB, W), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((qg.shape[0], W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((PB, W), jnp.float32)
                            for _ in range(6)],
        )(qg)
    return run


def main():
    rng = np.random.default_rng(0)
    P = 256
    for feats in [(), ('shift',), ('load',), ('lse',),
                  ('shift', 'load', 'lse')]:
        run = make(frozenset(feats))
        best = 1e9
        for k in range(4):
            qg = jnp.asarray(rng.integers(0, 5, size=(P, LQG)).astype(np.int32))
            t0 = time.perf_counter()
            v = np.asarray(run(qg))
            dt = time.perf_counter() - t0
            if k:
                best = min(best, dt)
        print(f"{feats}: {best*1e3:.2f} ms  ({best/Dmax*1e6:.1f} us/step "
              f"for {P//PB} programs)")


if __name__ == "__main__":
    main()
