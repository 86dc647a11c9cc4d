"""Pallas TPU kernel: banded edit-distance DP with backpointer streaming.

Role parity: the DW_banded/blasr alignment inner loop (SURVEY.md §2b) —
the compute core of the aligner, overlapper, and consensus tagger.

Design: same slope-1/2 wavefront as ops.banded_align (that module's scan
is the CPU/spec path), but the V1/V2 int32 state lives in VMEM scratch
and only the per-antidiagonal backpointer tile (PB, W) int8 — which the
traceback needs anyway — leaves the chip, via double-buffered async DMA
into an HBM-resident (Dmax, PB, W) output.

Answer extraction uses a packed key min:  key = V * 8192 + j  accumulated
over cells on row i == n.  Because j = d - n grows with d, the
lexicographic (V, j) minimum equals the oracle's "first antidiagonal with
the strictly smallest V" rule exactly.

Semantics: oracle.align.banded_dp (global / qglocal / tglocal).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..oracle.align import INF
from .banded_align import (MOVE_DIAG, MOVE_LEFT, MOVE_NONE, MOVE_UP,
                           build_schedule, prepare_batch)

KEY_SHIFT = 8192  # key = V * KEY_SHIFT + j;  V clipped below 2^18
DMA_K = 16        # 2-bit moves packed per int32 word (diagonals per copy)


def _lo(d, W):
    return jnp.maximum(0, (d + 1) // 2 - W // 2)


def _kernel(qg_ref, trg_ref, n_ref, m_ref,
            bp_hbm, key_ref, corner_ref,
            V1_ref, V2_ref, pack_ref, sems, *,
            W: int, Lt: int, G: int, Dmax: int, mode: str,
            emit_bp: bool = True):
    PB = qg_ref.shape[0]
    g = pl.program_id(0)
    row0 = g * PB          # this program's pair-block offset in bp_hbm
    inf = jnp.int32(INF)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (PB, W), 1)
    col0 = w_iota == 0
    colW = w_iota == W - 1
    n = n_ref[:, :1]
    m = m_ref[:, :1]

    V1_ref[:] = jnp.full((PB, W), inf, jnp.int32)
    V2_ref[:] = jnp.full((PB, W), inf, jnp.int32)
    key_ref[:] = jnp.full((PB, W), jnp.int32(0x7FFFFFFF), jnp.int32)
    corner_ref[:] = jnp.full((PB, W), inf, jnp.int32)

    def shift_m1(V):
        return jnp.where(col0, inf, pltpu.roll(V, shift=1, axis=1))

    def shift_p1(V):
        return jnp.where(colW, inf, pltpu.roll(V, shift=W - 1, axis=1))

    def sel(V, s, base_k):
        if base_k == -1:
            return jnp.where(s == 0, shift_m1(V), V)
        return jnp.where(s == 0, V, shift_p1(V))

    def load_win(ref, start):
        N = W + 128
        base = pl.multiple_of((start // 128) * 128, 128)
        win = ref[:, pl.ds(base, N)]
        r = start - base
        return pltpu.roll(win, (N - r) % N, axis=1)[:, :W]

    def sub(d, prev1, prev2, wr, s_static=None):
        """One antidiagonal: prev1 holds d-1, prev2 holds d-2; the new
        wavefront is written into wr (aliasing prev2, whose values are
        dead).  s_static passes the compile-time band shifts of the
        steady state (d >= W+2: s1 = d&1, s2 = 1) so sel() lowers to a
        bare roll/identity — same scheme as ops.pallas_pairhmm."""
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

        V1 = prev1[:]
        V2 = prev2[:]

        i = lo + w_iota
        j = d - i

        up = pick(V1, s1, -1)
        left = pick(V1, s1, 0)
        diag = pick(V2, s2, -1)

        qi = load_win(qg_ref, lo)
        tj = load_win(trg_ref, G + Lt - d + lo)
        sub = jnp.where((qi == tj) & (qi < 4), 0, 1)

        cd = jnp.where((i >= 1) & (j >= 1), diag + sub, inf)
        cu = jnp.where(i >= 1, up + 1, inf)
        cl = jnp.where(j >= 1, left + 1, inf)

        V = jnp.minimum(jnp.minimum(cd, cu), cl)
        mv = jnp.where(cd <= V, MOVE_DIAG,
                       jnp.where(cu <= V, MOVE_UP,
                                 MOVE_LEFT)).astype(jnp.int8)

        if mode == "tglocal":
            origin = (i == 0) & (j >= 0)
        else:
            origin = (i == 0) & (j == 0)
        valid = (i >= 0) & (i <= n) & (j >= 0) & (j <= m)
        V = jnp.where(origin, 0, V)
        V = jnp.where(valid, V, inf)
        V = jnp.minimum(V, inf)
        bp_d = jnp.where(valid & ~origin & (V < inf), mv,
                         jnp.int8(MOVE_NONE))

        # answers
        at_end = valid & (i == n) & (V < inf)
        key = jnp.where(at_end,
                        jnp.minimum(V, 262143) * KEY_SHIFT + j,
                        jnp.int32(0x7FFFFFFF))
        key_ref[:] = jnp.minimum(key_ref[:], key)
        hit = valid & (i == n) & (j == m)
        corner_ref[:] = jnp.where(hit, V, corner_ref[:])

        # Backpointer emission: moves are 2 bits, so 16 diagonals pack
        # into ONE int32 plane at a STATIC VMEM address (a dynamic
        # stage_ref[slot, kk] store lowered to an expensive per-step op;
        # measured W-independent runtime).  Every 16 steps the packed
        # plane ships to HBM with one short synchronous copy.
        if not emit_bp:
            wr[:] = V
            return
        kk = d % DMA_K
        blk = d // DMA_K
        bp32 = bp_d.astype(jnp.int32)
        shifted = jnp.left_shift(bp32, 2 * kk)
        pack_ref[:] = jnp.where(kk == 0, shifted, pack_ref[:] | shifted)

        @pl.when(kk == DMA_K - 1)
        def _():
            cp = pltpu.make_async_copy(
                pack_ref, bp_hbm.at[blk, pl.ds(row0, PB), :], sems.at[0])
            cp.start()
            cp.wait()

        wr[:] = V

    def dbl(k, _):
        d = 2 * k
        # entering d: V1_ref holds d-1, V2_ref holds d-2
        sub(d, V1_ref, V2_ref, V2_ref)       # V2 <- d
        sub(d + 1, V2_ref, V1_ref, V1_ref)   # V1 <- d+1
        return 0

    def dbl_steady(k, _):
        d = 2 * k
        sub(d, V1_ref, V2_ref, V2_ref, s_static=(0, 1))
        sub(d + 1, V2_ref, V1_ref, V1_ref, s_static=(1, 1))
        return 0

    split = min((W + 2) // 2, Dmax // 2)
    jax.lax.fori_loop(0, split, dbl, 0)
    jax.lax.fori_loop(split, Dmax // 2, dbl_steady, 0)
    if Dmax % 2:
        sub(Dmax - 1, V1_ref, V2_ref, V2_ref)

    # flush the final partial pack (upper bits are stale from the prior
    # block; the unpacker only reads bits of diagonals < Dmax)
    if emit_bp and Dmax % DMA_K:
        cp = pltpu.make_async_copy(
            pack_ref, bp_hbm.at[Dmax // DMA_K, pl.ds(row0, PB), :],
            sems.at[0])
        cp.start()
        cp.wait()


@functools.partial(jax.jit,
                   static_argnames=("W", "Lt", "G", "Dmax", "PB", "mode",
                                    "interpret", "emit_bp"))
def pallas_banded_align(qg, trg, n, m, *, W, Lt, G, Dmax, PB, mode,
                        interpret=False, emit_bp=True):
    # sequences may arrive int8 (4x cheaper host->device transfer); the
    # kernel wants int32 lanes, so widen ON DEVICE inside the jit
    qg = qg.astype(jnp.int32)
    trg = trg.astype(jnp.int32)
    P = qg.shape[0]
    LQG = qg.shape[1]
    LTG = trg.shape[1]
    grid = P // PB
    kern = functools.partial(_kernel, W=W, Lt=Lt, G=G, Dmax=Dmax, mode=mode,
                             emit_bp=emit_bp)
    bp, key, corner = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # full array, in-kernel
                                                    # row offset via program_id
            pl.BlockSpec((PB, W), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, W), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((-(-Dmax // DMA_K), P, W), jnp.int32),
            jax.ShapeDtypeStruct((P, W), jnp.int32),
            jax.ShapeDtypeStruct((P, W), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((PB, W), jnp.int32),
            pltpu.VMEM((PB, W), jnp.int32),
            pltpu.VMEM((PB, W), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(qg, trg, n, m)

    # unpack 2-bit moves: bp[d] = (packed[d // 16] >> (2 * (d % 16))) & 3
    d_idx = jnp.arange(Dmax)
    bp8 = ((bp[d_idx // DMA_K]
            >> (2 * (d_idx % DMA_K))[:, None, None]) & 3).astype(jnp.int8)

    key_min = jnp.min(key, axis=1)
    best = key_min // KEY_SHIFT
    best_j = key_min % KEY_SHIFT
    final = jnp.min(corner, axis=1)
    if mode == "global":
        dist, end_i, end_j = final, n[:, 0], m[:, 0]
    else:
        dist = jnp.where(key_min == 0x7FFFFFFF, INF, best)
        end_i, end_j = n[:, 0], best_j
    return {"dist": dist.astype(jnp.int32), "end_i": end_i,
            "end_j": end_j.astype(jnp.int32), "bp": bp8}
