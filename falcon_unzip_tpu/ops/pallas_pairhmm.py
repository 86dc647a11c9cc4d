"""Pallas TPU kernel: banded pair-HMM forward (Arrow inner loop).

Why Pallas: the XLA scan version (ops.pairhmm.forward_core) round-trips
~1 MB of M/I/D wavefront state through HBM on EVERY antidiagonal — the
while-loop carries live in HBM, making the kernel memory-bound.  Here the
full state (6 planes x (PB, W) f32) stays in VMEM scratch for the whole
scan, HBM traffic is just the guarded sequences in and (PB, W) out, and
each step is pure VPU work.

Mosaic-specific choices:
- sequences are passed as int32 (int8 would force a (32,128)->(8,128)
  relayout on every load and dynamic_rotate only supports 32-bit data);
- lane-dim loads must be 128-aligned, so each step loads an aligned
  2-tile window and dynamic-rotates the residue into place (W % 128 == 0
  so the rotate shape stays tile-aligned);
- state banks rotate by explicit static copies (dynamic bank indexing
  de-optimizes to per-step relayouts).

Semantics: identical to oracle.hmm.forward_full / ops.pairhmm (same band
schedule, same logaddexp nesting); conformance-tested in interpret mode
on CPU and against the oracle on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..oracle.hmm import NEG, HMMParams
from .banded_align import build_schedule, prepare_batch


def _lo(d, W):
    return jnp.maximum(0, (d + 1) // 2 - W // 2)


def _kernel(qg_ref, trg_ref, n_ref, m_ref, out_ref,
            MA_ref, IA_ref, DA_ref, MB_ref, IB_ref, DB_ref,
            CI_ref, CD_ref, *,
            W: int, Lt: int, G: int, Dmax: int, params: dict):
    PB = qg_ref.shape[0]
    neg = jnp.float32(NEG)
    em_match = jnp.float32(params["em_match"])
    em_mis = jnp.float32(params["em_mis"])
    em_ins = jnp.float32(params["em_ins"])
    tMM = jnp.float32(params["tMM"])
    tMI = jnp.float32(params["tMI"])
    tMD = jnp.float32(params["tMD"])
    tIM = jnp.float32(params["tIM"])
    tII = jnp.float32(params["tII"])
    tDM = jnp.float32(params["tDM"])
    tDD = jnp.float32(params["tDD"])

    w_iota = jax.lax.broadcasted_iota(jnp.int32, (PB, W), 1)
    col0 = w_iota == 0
    colW = w_iota == W - 1
    n = n_ref[:, :1]                       # (PB, 1) int32
    m = m_ref[:, :1]

    nf = jnp.full((PB, W), neg, jnp.float32)
    MA_ref[:] = nf; IA_ref[:] = nf; DA_ref[:] = nf
    MB_ref[:] = nf; IB_ref[:] = nf; DB_ref[:] = nf
    CI_ref[:] = nf; CD_ref[:] = nf
    out_ref[:] = nf

    def shift_m1(V):
        # out[w] = V[w-1]; out[0] = NEG
        return jnp.where(col0, neg, pltpu.roll(V, shift=1, axis=1))

    def shift_p1(V):
        # out[w] = V[w+1]; out[W-1] = NEG
        return jnp.where(colW, neg, pltpu.roll(V, shift=W - 1, axis=1))

    def sel(V, s, base_k):
        # out[w] = V[w + base_k + s],  s in {0, 1}, base_k in {-1, 0}
        if base_k == -1:
            return jnp.where(s == 0, shift_m1(V), V)
        return jnp.where(s == 0, V, shift_p1(V))

    def load_win(ref, start):
        # Mosaic: lane-dim loads must be 128-aligned -> aligned 2-tile
        # window + dynamic rotate of the residue.
        N = W + 128
        base = pl.multiple_of((start // 128) * 128, 128)
        win = ref[:, pl.ds(base, N)]
        r = start - base                     # 0..127
        rolled = pltpu.roll(win, (N - r) % N, axis=1)
        return rolled[:, :W]                 # out[w] = ref[start + w]

    bankA = (MA_ref, IA_ref, DA_ref)
    bankB = (MB_ref, IB_ref, DB_ref)

    def sub(d, prev1, prev2, wr, s_static=None):
        """One antidiagonal: prev1 holds d-1, prev2 holds d-2; the new
        generation is written into wr (aliasing prev2 — its values are
        dead once read).  The 2-step-unrolled ping-pong below swaps bank
        roles instead of copying 6 planes per step.

        s_static: optional compile-time (s1, s2) band shifts.  For
        d >= W+2 the slope-1/2 band advances deterministically
        (s1 = d&1, s2 = 1), so the steady-state loop passes constants
        and every sel() lowers to a bare roll or identity instead of a
        traced scalar select."""
        lo = _lo(d, W)
        if s_static is None:
            s1 = lo - _lo(d - 1, W)
            s2 = lo - _lo(d - 2, W)
            pick = sel
        else:
            s1, s2 = s_static

            def pick(V, s, base_k):
                if base_k == -1:
                    return shift_m1(V) if s == 0 else V
                return V if s == 0 else shift_p1(V)

        M1 = prev1[0][:]; I1 = prev1[1][:]; D1 = prev1[2][:]
        M2 = prev2[0][:]; I2 = prev2[1][:]; D2 = prev2[2][:]

        i = lo + w_iota
        j = d - i

        Md = pick(M2, s2, -1)
        Id = pick(I2, s2, -1)
        Dd = pick(D2, s2, -1)
        Mu = pick(M1, s1, -1)
        Iu = pick(I1, s1, -1)
        Ml = pick(M1, s1, 0)
        Dl = pick(D1, s1, 0)

        qi = load_win(qg_ref, lo)
        tj = load_win(trg_ref, G + Lt - d + lo)
        em = jnp.where((qi == tj) & (qi < 4), em_match, em_mis)

        M = em + jnp.logaddexp(jnp.logaddexp(Md + tMM, Id + tIM), Dd + tDM)
        I = em_ins + jnp.logaddexp(Mu + tMI, Iu + tII)
        D = jnp.logaddexp(Ml + tMD, Dl + tDD)

        valid = (i >= 0) & (i <= n) & (j >= 0) & (j <= m)
        origin = (i == 0) & (j == 0)
        M = jnp.where(valid & (i >= 1) & (j >= 1), M, neg)
        M = jnp.where(origin, 0.0, M)
        I = jnp.where(valid & (i >= 1), I, neg)
        D = jnp.where(valid & (j >= 1), D, neg)

        # capture the (n, m) corner M/I/D with cheap selects; their
        # logaddexp combine runs ONCE after the loop, not per diagonal.
        # (A pl.when guard on any(n+m == d) was tried and is SLOWER —
        # the per-step reduction + branch beats the 3 plane stores.)
        corner = valid & (i == n) & (j == m)
        out_ref[:] = jnp.where(corner, M, out_ref[:])
        CI_ref[:] = jnp.where(corner, I, CI_ref[:])
        CD_ref[:] = jnp.where(corner, D, CD_ref[:])

        wr[0][:] = M; wr[1][:] = I; wr[2][:] = D

    def dbl(k, _):
        d = 2 * k
        # entering d: prev1 = A (d-1), prev2 = B (d-2)
        sub(d, bankA, bankB, bankB)          # B <- d
        sub(d + 1, bankB, bankA, bankA)      # A <- d+1
        return 0

    def dbl_steady(k, _):
        d = 2 * k
        sub(d, bankA, bankB, bankB, s_static=(0, 1))
        sub(d + 1, bankB, bankA, bankA, s_static=(1, 1))
        return 0

    # prologue: band pinned at lo=0 (shifts vary); steady: constant shifts
    split = min((W + 2) // 2, Dmax // 2)
    jax.lax.fori_loop(0, split, dbl, 0)
    jax.lax.fori_loop(split, Dmax // 2, dbl_steady, 0)
    if Dmax % 2:
        sub(Dmax - 1, bankA, bankB, bankB)

    # final corner combine: ll = logaddexp(M, I, D) at the captured cell
    out_ref[:] = jnp.logaddexp(jnp.logaddexp(out_ref[:], CI_ref[:]),
                               CD_ref[:])


@functools.partial(jax.jit,
                   static_argnames=("W", "Lt", "G", "Dmax", "PB",
                                    "params_key", "interpret"))
def _pallas_forward(qg, trg, n, m, *, W, Lt, G, Dmax, PB, params_key,
                    interpret=False):
    # int8 upload, on-device widen (lane loads want 32-bit data)
    qg = qg.astype(jnp.int32)
    trg = trg.astype(jnp.int32)
    params = dict(params_key)
    P = qg.shape[0]
    LQG = qg.shape[1]
    LTG = trg.shape[1]
    grid = P // PB
    kern = functools.partial(_kernel, W=W, Lt=Lt, G=G, Dmax=Dmax,
                             params=params)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((PB, LQG), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, LTG), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PB, W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((PB, W), jnp.float32) for _ in range(8)],
        cost_estimate=pl.CostEstimate(
            flops=int(Dmax) * P * W * 40,
            bytes_accessed=P * (LQG + LTG + W) * 4,
            transcendentals=int(Dmax) * P * W * 8,
        ),
        interpret=interpret,
    )(qg, trg, n, m)
    return jnp.max(out, axis=1)


class PallasPairHMMScorer:
    """Drop-in replacement for ops.pairhmm.PairHMMScorer on TPU."""

    def __init__(self, W: int = 128, params: HMMParams | None = None,
                 PB: int = 256, interpret: bool = False):
        if not interpret:
            assert W % 128 == 0, "compiled path needs W to be tile-aligned"
        self.W = W
        self.PB = PB
        self.interpret = interpret
        self.params_key = tuple(sorted(
            (k, float(v)) for k, v in (params or HMMParams()).logs().items()))

    def __call__(self, q: np.ndarray, t: np.ndarray,
                 n: np.ndarray, m: np.ndarray) -> np.ndarray:
        P, Lq = q.shape
        Lt = t.shape[1]
        # pow2 P ladder + bounded block size (see ops.banded_align.
        # _pallas_call): block size AND grid count are part of the
        # compiled shape; exact-P batches would compile a fresh Mosaic
        # kernel per odd batch size on the remote-compile TPU path
        cap = 64
        while cap < P:
            cap *= 2
        PB = min(self.PB, 256, cap)
        pad = cap - P
        if pad:
            q = np.concatenate([q, np.tile(q[-1:], (pad, 1))])
            t = np.concatenate([t, np.tile(t[-1:], (pad, 1))])
            n = np.concatenate([n, np.tile(n[-1:], pad)])
            m = np.concatenate([m, np.tile(m[-1:], pad)])
        from .banded_align import PALLAS_SHAPES
        PALLAS_SHAPES.add(("hmm", self.W, Lq, Lt, q.shape[0], PB))
        qg, trg, G = prepare_batch(q, t, self.W)
        # int32 chars (int8 costs a relayout per load + no 8-bit rotate);
        # extra slack columns for the aligned 2-tile in-kernel windows
        pad_cols = 256
        qg = np.pad(qg, ((0, 0), (0, pad_cols)), constant_values=4)
        trg = np.pad(trg, ((0, 0), (0, pad_cols)), constant_values=4)
        Dmax, _ = build_schedule(Lq, Lt, self.W)
        n8 = np.tile(np.asarray(n, np.int32)[:, None], (1, 128))
        m8 = np.tile(np.asarray(m, np.int32)[:, None], (1, 128))
        ll = _pallas_forward(
            jnp.asarray(qg), jnp.asarray(trg), jnp.asarray(n8),
            jnp.asarray(m8), W=self.W, Lt=Lt, G=G, Dmax=Dmax, PB=PB,
            params_key=self.params_key, interpret=self.interpret)
        return np.asarray(ll)[:P]
