"""Device pileup + het-site calling (XLA scatter-add / vectorized).

Role parity: the pileup pass of [U] falcon_unzip/phasing.py::make_het_call
(SURVEY.md §3.2 step 1).  Re-design: the pileup is a single scatter-add of
flat (pos, base) tag arrays into a (t_len, 5) count tensor, and the het
test is a branch-free vectorized predicate over all positions at once —
no per-column Python, ready to vmap/shard over contig windows.

Determinism contract: identical results to oracle.phasing.call_het_sites
(ties broken toward smaller base codes via first-argmax).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..oracle.phasing import PhasingConfig


@functools.partial(jax.jit, static_argnames=("t_len",))
def pileup_scatter(pos, base, *, t_len: int):
    """Flat delta-0 tags -> (t_len, 5) int32 counts.

    pos, base: (N,) int32 arrays; out-of-range positions are dropped.
    """
    ok = (pos >= 0) & (pos < t_len)
    p = jnp.where(ok, pos, t_len)  # out-of-range -> dumped in an extra row
    counts = jnp.zeros((t_len + 1, 5), jnp.int32)
    counts = counts.at[p, jnp.clip(base, 0, 4)].add(1)
    return counts[:t_len]


@functools.partial(
    jax.jit,
    static_argnames=("min_depth", "min_allele_count"))
def het_call_vec(counts, *, min_depth: int, min_allele_count: int,
                 allele_freq_min: float, biallelic_frac: float):
    """Vectorized het predicate.

    counts: (t_len, 5) int32.
    Returns (is_het (t_len,) bool, b1 (t_len,) int8, b2 (t_len,) int8).
    """
    depth = counts.sum(axis=1)
    bc = counts[:, :4]
    b1 = jnp.argmax(bc, axis=1)                      # first max: smaller code
    c1 = jnp.take_along_axis(bc, b1[:, None], axis=1)[:, 0]
    bc2 = bc.at[jnp.arange(bc.shape[0]), b1].set(-1)
    b2 = jnp.argmax(bc2, axis=1)
    c2 = jnp.take_along_axis(bc2, b2[:, None], axis=1)[:, 0]
    c12 = c1 + c2
    thresh = jnp.maximum(min_allele_count,
                         jnp.ceil(allele_freq_min * c12).astype(jnp.int32))
    is_het = ((depth >= min_depth)
              & (c2 >= thresh)
              & (c12 >= biallelic_frac * depth))
    return is_het, b1.astype(jnp.int8), b2.astype(jnp.int8)


def call_het_sites_device(counts: np.ndarray, cfg: PhasingConfig):
    """Numpy-in/out wrapper matching oracle.call_het_sites output format."""
    is_het, b1, b2 = het_call_vec(
        jnp.asarray(counts),
        min_depth=cfg.min_depth,
        min_allele_count=cfg.min_allele_count,
        allele_freq_min=cfg.allele_freq_min,
        biallelic_frac=cfg.biallelic_frac)
    is_het = np.asarray(is_het)
    pos = np.nonzero(is_het)[0].astype(np.int64)
    return pos, np.asarray(b1)[pos], np.asarray(b2)[pos]


@functools.partial(jax.jit, static_argnames=("n_reads", "n_sites", "t_len"))
def allele_matrix_scatter(read_row, pos, base, pos_to_site, b1, b2,
                          *, n_reads: int, n_sites: int, t_len: int):
    """Flat delta-0 tags -> (n_reads, n_sites) int8 allele matrix.

    pos_to_site: (t_len,) int32, -1 where not a het site.
    """
    site = jnp.where((pos >= 0) & (pos < t_len),
                     pos_to_site[jnp.clip(pos, 0, t_len - 1)], -1)
    hit = site >= 0
    s = jnp.where(hit, site, n_sites)
    val = jnp.where(base == b1[jnp.clip(site, 0, n_sites - 1)], 1,
                    jnp.where(base == b2[jnp.clip(site, 0, n_sites - 1)],
                              -1, 0)).astype(jnp.int8)
    M = jnp.zeros((n_reads, n_sites + 1), jnp.int8)
    M = M.at[read_row, s].set(jnp.where(hit, val, 0))
    return M[:, :n_sites]
