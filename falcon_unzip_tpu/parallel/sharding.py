"""Sharded device programs: multi-chip phasing + polish steps.

Role parity: the reference's ONLY multi-node mechanism is pwatcher job
fan-out over a shared filesystem (SURVEY.md §1 L7).  The rebuild replaces
it with SPMD device programs over a ('data', 'window') mesh
(BASELINE.json north star):

- phase step : read tag batches are data-parallel across every device;
  per-contig pileup counts and the banded SNP association table are
  merged with psum over the mesh; het calling is computed replicated.
- polish step: (variant x read) pair-HMM scoring pairs are sharded across
  devices (the contig-window axis analogue); log-likelihoods stay sharded
  for the host gather.

Both are shard_map programs — XLA inserts the ICI/DCN collectives.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pairhmm import forward_core

ALL = ("data", "window")


def make_phase_step(mesh: Mesh, *, t_len: int, s_cap: int, max_span: int,
                    min_depth: int = 10, min_allele_count: int = 2,
                    allele_freq_min: float = 0.25,
                    biallelic_frac: float = 0.8):
    """Sharded phasing device program.

    Inputs (sharded over all mesh devices on the read axis):
      tagpos, tagbase: (R, T) int32, -1-padded delta-0 tags per read.
    Outputs:
      counts (t_len, 5) replicated;  is_het (t_len,) replicated;
      b1, b2 (t_len,) replicated;  score/cov (s_cap, max_span) replicated;
      M (R, s_cap) int8 sharded allele matrix.
    """

    def step(tagpos, tagbase):
        R_loc, T = tagpos.shape
        # ---- pileup (scatter-add) + psum merge over the whole mesh
        pos = tagpos.reshape(-1)
        base = tagbase.reshape(-1)
        ok = (pos >= 0) & (pos < t_len)
        p = jnp.where(ok, pos, t_len)
        counts_loc = jnp.zeros((t_len + 1, 5), jnp.int32)
        counts_loc = counts_loc.at[p, jnp.clip(base, 0, 4)].add(1)
        counts = jax.lax.psum(counts_loc[:t_len], ALL)

        # ---- het predicate (replicated compute)
        depth = counts.sum(axis=1)
        bc = counts[:, :4]
        b1 = jnp.argmax(bc, axis=1)
        c1 = jnp.take_along_axis(bc, b1[:, None], axis=1)[:, 0]
        bc2 = bc.at[jnp.arange(t_len), b1].set(-1)
        b2 = jnp.argmax(bc2, axis=1)
        c2 = jnp.take_along_axis(bc2, b2[:, None], axis=1)[:, 0]
        c12 = c1 + c2
        thresh = jnp.maximum(min_allele_count,
                             jnp.ceil(allele_freq_min * c12).astype(jnp.int32))
        is_het = ((depth >= min_depth) & (c2 >= thresh)
                  & (c12 >= biallelic_frac * depth))

        # ---- allele matrix for local reads (first s_cap sites)
        site_of_pos = jnp.where(is_het, jnp.cumsum(is_het) - 1, -1)
        site_of_pos = jnp.where(site_of_pos < s_cap, site_of_pos, -1)
        site = jnp.where(ok, site_of_pos[jnp.clip(pos, 0, t_len - 1)], -1)
        hit = site >= 0
        sb1 = b1[jnp.clip(pos, 0, t_len - 1)]
        sb2 = b2[jnp.clip(pos, 0, t_len - 1)]
        val = jnp.where(base == sb1, 1,
                        jnp.where(base == sb2, -1, 0)).astype(jnp.int8)
        rows = jnp.repeat(jnp.arange(R_loc, dtype=jnp.int32), T)
        M = jnp.zeros((R_loc, s_cap + 1), jnp.int8)
        M = M.at[rows, jnp.where(hit, site, s_cap)].set(
            jnp.where(hit, val, 0))
        M = M[:, :s_cap]

        # ---- banded association, psum-merged
        Mi = M.astype(jnp.int32)
        Mpad = jnp.pad(Mi, ((0, 0), (0, max_span + 1)))

        def assoc(_, d):
            sh = jax.lax.dynamic_slice(Mpad, (0, d), (R_loc, s_cap))
            prod = Mi * sh
            return None, (prod.sum(axis=0), jnp.abs(prod).sum(axis=0))

        _, (score_loc, cov_loc) = jax.lax.scan(
            assoc, None, jnp.arange(1, max_span + 1, dtype=jnp.int32))
        score = jax.lax.psum(score_loc.T, ALL)
        cov = jax.lax.psum(cov_loc.T, ALL)
        return counts, is_het, b1.astype(jnp.int8), b2.astype(jnp.int8), \
            score, cov, M

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(ALL, None), P(ALL, None)),
        out_specs=(P(), P(), P(), P(), P(), P(), P(ALL, None)))
    return jax.jit(sharded)


def make_polish_step(mesh: Mesh, *, W: int, Lt: int, G: int):
    """Sharded pair-HMM scoring: pairs split across all devices."""

    def step(qg, trg, n, m, lo_arr, params_vec):
        return forward_core(qg, trg, n, m, lo_arr, params_vec,
                            W=W, Lt=Lt, G=G)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(ALL, None), P(ALL, None), P(ALL), P(ALL), P(None), P(None)),
        out_specs=P(ALL))
    return jax.jit(sharded)
