"""Batched banded pair-HMM forward on device (Arrow likelihood core).

Role parity: the ConsensusCore2 C++ forward/viterbi kernels inside
[U] variantCaller --algorithm=arrow (SURVEY.md §3.4 "HOTTEST loop").

Re-design: same slope-1/2 antidiagonal wavefront as ops.banded_align but
in the log semiring with three state planes (M/I/D) — one lax.scan step
updates (P, W) tiles with pure elementwise logaddexp/add, no gathers.
Numeric spec (op order) defined by oracle.hmm.forward_full; float32.

Shapes: qg/trg guarded as in ops.banded_align.prepare_batch; one call
scores P (read, template) pairs — polish batches (variant x read) pairs
to score all candidate mutations of a window in one device program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..oracle.hmm import HMMParams, NEG
from ..oracle.align import band_lo
from .banded_align import build_schedule, prepare_batch


def _shift(V, k, fill):
    if k == 0:
        return V
    col = jnp.full((V.shape[0], 1), fill, dtype=V.dtype)
    if k == 1:
        return jnp.concatenate([V[:, 1:], col], axis=1)
    return jnp.concatenate([col, V[:, :-1]], axis=1)


def _shift_sel(V, s, base_k, fill):
    a = _shift(V, base_k, fill)
    b = _shift(V, base_k + 1, fill)
    return jnp.where(s == 0, a, b)


def forward_core(qg, trg, n, m, lo_arr, params_vec,
                 *, W: int, Lt: int, G: int):
    """Banded forward log-likelihood for P pairs (trace-level core; jit or
    shard_map it from the callers).

    params_vec: (10,) float32 — em_match, em_mis, em_ins, tMM, tMI, tMD,
                tIM, tII, tDM, tDD (order fixed; see HMMParams.logs()).
    Returns loglik (P,) float32 (NEG if the (n, m) cell left the band).
    """
    P = qg.shape[0]
    Dmax = lo_arr.shape[0]
    w_iota = jnp.arange(W, dtype=jnp.int32)[None, :]
    neg = jnp.float32(NEG)
    n = n.astype(jnp.int32)[:, None]
    m = m.astype(jnp.int32)[:, None]
    (em_match, em_mis, em_ins, tMM, tMI, tMD, tIM, tII, tDM, tDD) = [
        params_vec[i] for i in range(10)]

    def step(carry, d):
        M1, I1, D1, M2, I2, D2, final = carry
        lo = lo_arr[d]
        lo1 = jnp.where(d >= 1, lo_arr[jnp.maximum(d - 1, 0)], 0)
        lo2 = jnp.where(d >= 2, lo_arr[jnp.maximum(d - 2, 0)], 0)
        s1 = lo - lo1
        s2 = lo - lo2

        i = lo + w_iota
        j = d - i

        # diag neighbors (i-1, j-1) on d-2 at w + s2 - 1
        Md = _shift_sel(M2, s2, -1, neg)
        Id = _shift_sel(I2, s2, -1, neg)
        Dd = _shift_sel(D2, s2, -1, neg)
        # up neighbors (i-1, j) on d-1 at w + s1 - 1
        Mu = _shift_sel(M1, s1, -1, neg)
        Iu = _shift_sel(I1, s1, -1, neg)
        # left neighbors (i, j-1) on d-1 at w + s1
        Ml = _shift_sel(M1, s1, 0, neg)
        Dl = _shift_sel(D1, s1, 0, neg)

        qi = jax.lax.dynamic_slice(qg, (0, lo), (P, W))
        tj = jax.lax.dynamic_slice(trg, (0, G + Lt - d + lo), (P, W))
        em = jnp.where((qi == tj) & (qi < 4), em_match, em_mis)

        M = em + jnp.logaddexp(jnp.logaddexp(Md + tMM, Id + tIM), Dd + tDM)
        I = em_ins + jnp.logaddexp(Mu + tMI, Iu + tII)
        D = jnp.logaddexp(Ml + tMD, Dl + tDD)

        can_m = (i >= 1) & (j >= 1)
        can_i = i >= 1
        can_d = j >= 1
        valid = (i >= 0) & (i <= n) & (j >= 0) & (j <= m)
        origin = (i == 0) & (j == 0)
        M = jnp.where(valid & can_m, M, neg)
        M = jnp.where(origin, 0.0, M)
        I = jnp.where(valid & can_i, I, neg)
        D = jnp.where(valid & can_d, D, neg)

        # capture loglik at (n, m)
        hit = (d == (n + m)[:, 0])
        wnm = jnp.clip(n[:, 0] - lo, 0, W - 1)
        take = lambda A: jnp.take_along_axis(A, wnm[:, None], axis=1)[:, 0]
        ll = jnp.logaddexp(jnp.logaddexp(take(M), take(I)), take(D))
        final = jnp.where(hit, ll, final)

        return (M, I, D, M1, I1, D1, final), None

    # derive the scan carry init from the inputs so its sharding/varying
    # type matches under shard_map (a literal-constant init is typed
    # "replicated" and fails the new vma carry check)
    zrow = 0.0 * qg[:, :1].astype(jnp.float32)          # (P, 1), varying
    Z = jnp.full((P, W), NEG, jnp.float32) + zrow
    init = (Z, Z, Z, Z, Z, Z,
            jnp.full((P,), NEG, jnp.float32) + zrow[:, 0])
    (M1, I1, D1, M2, I2, D2, final), _ = jax.lax.scan(
        step, init, jnp.arange(Dmax, dtype=jnp.int32))
    return final


pairhmm_forward_batch = jax.jit(forward_core,
                                static_argnames=("W", "Lt", "G"))


def params_vector(params: HMMParams | None = None) -> np.ndarray:
    L = (params or HMMParams()).logs()
    return np.array([L["em_match"], L["em_mis"], L["em_ins"],
                     L["tMM"], L["tMI"], L["tMD"],
                     L["tIM"], L["tII"], L["tDM"], L["tDD"]],
                    dtype=np.float32)


class PairHMMScorer:
    """Batched (read, template) log-likelihood scorer over padded arrays."""

    def __init__(self, W: int = 64, params: HMMParams | None = None):
        self.W = W
        self.pvec = params_vector(params)

    def __call__(self, q: np.ndarray, t: np.ndarray,
                 n: np.ndarray, m: np.ndarray) -> np.ndarray:
        P, Lq = q.shape
        Lt = t.shape[1]
        qg, trg, G = prepare_batch(q, t, self.W)
        Dmax, lo = build_schedule(Lq, Lt, self.W)
        ll = pairhmm_forward_batch(
            jnp.asarray(qg), jnp.asarray(trg),
            jnp.asarray(n), jnp.asarray(m), jnp.asarray(lo),
            jnp.asarray(self.pvec), W=self.W, Lt=Lt, G=G)
        return np.asarray(ll)
