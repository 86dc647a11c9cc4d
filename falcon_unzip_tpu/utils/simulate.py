"""Synthetic diploid genome + long-read simulator for tests and benches.

Role parity: the reference validates end-to-end on synthetic/tiny genomes
(FALCON-examples `run/synth0`, greg200k-sv2 — SURVEY.md §4).  This module
generates the equivalent fixtures in-process: a random genome, a diploid
pair of haplotypes separated by SNPs (+ optional indels/SVs), and noisy
long reads sampled from both haplotypes.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..seq import NBASE, SeqBatch


@dataclasses.dataclass
class Diploid:
    hap0: np.ndarray            # int8 codes
    hap1: np.ndarray
    snp_pos: np.ndarray         # het positions in hap0 coordinates
    snp_alt: np.ndarray         # hap1 base at those positions


def random_genome(length: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, NBASE, size=length, dtype=np.int8)


def make_diploid(
    length: int = 20000,
    het_rate: float = 0.01,
    seed: int = 0,
    het_span: tuple[float, float] | None = None,
) -> Diploid:
    """Haplotype pair differing by SNPs at ~het_rate density.

    het_span: optional (lo_frac, hi_frac) restricting SNPs to a sub-region
    (models a diverged bubble flanked by collapsed homozygous sequence).
    """
    rng = np.random.default_rng(seed)
    hap0 = random_genome(length, seed)
    lo, hi = (0, length) if het_span is None else (
        int(length * het_span[0]), int(length * het_span[1]))
    n_snp = int((hi - lo) * het_rate) if het_rate > 0 else 0
    if n_snp == 0:
        return Diploid(hap0=hap0, hap1=hap0.copy(),
                       snp_pos=np.zeros(0, np.int64),
                       snp_alt=np.zeros(0, np.int8))
    pos = lo + np.sort(rng.choice(hi - lo, size=n_snp, replace=False))
    alt = (hap0[pos] + rng.integers(1, NBASE, size=n_snp)) % NBASE
    hap1 = hap0.copy()
    hap1[pos] = alt
    return Diploid(hap0=hap0, hap1=hap1,
                   snp_pos=pos.astype(np.int64), snp_alt=alt.astype(np.int8))


def mutate_read(read: np.ndarray, error_rate: float, rng) -> np.ndarray:
    """Apply PacBio-like errors (~equal mix of mismatch/ins/del)."""
    if error_rate <= 0:
        return read.copy()
    out = []
    for b in read:
        r = rng.random()
        if r < error_rate / 3:                      # mismatch
            out.append((b + rng.integers(1, NBASE)) % NBASE)
        elif r < 2 * error_rate / 3:                # insertion
            out.append(int(b))
            out.append(rng.integers(0, NBASE))
        elif r < error_rate:                        # deletion
            pass
        else:
            out.append(int(b))
    return np.array(out, dtype=np.int8)


@dataclasses.dataclass
class SimReads:
    batch: SeqBatch
    hap: np.ndarray        # true haplotype of each read (0/1)
    start: np.ndarray      # true start on its haplotype
    end: np.ndarray


def simulate_reads(
    diploid: Diploid,
    coverage: float = 20.0,
    read_len: int = 4000,
    error_rate: float = 0.0,
    seed: int = 1,
) -> SimReads:
    """Sample reads uniformly from both haplotypes (forward strand).

    Reverse-strand handling is exercised separately by the aligner tests;
    phasing semantics are strand-agnostic once reads are mapped.
    """
    rng = np.random.default_rng(seed)
    haps = [diploid.hap0, diploid.hap1]
    glen = len(diploid.hap0)
    n_reads = max(2, int(coverage * glen / read_len))
    seqs, hap_ids, starts, ends = [], [], [], []
    for i in range(n_reads):
        h = int(rng.integers(0, 2))
        L = int(min(read_len * (0.7 + 0.6 * rng.random()), glen))
        s = int(rng.integers(0, max(1, glen - L + 1)))
        raw = haps[h][s : s + L]
        seqs.append(mutate_read(raw, error_rate, rng))
        hap_ids.append(h)
        starts.append(s)
        ends.append(s + L)
    names = [f"read/{i}/{hap_ids[i]}_{starts[i]}_{ends[i]}"
             for i in range(n_reads)]
    return SimReads(
        batch=SeqBatch.from_strs(seqs, names=names),
        hap=np.array(hap_ids, dtype=np.int8),
        start=np.array(starts, dtype=np.int64),
        end=np.array(ends, dtype=np.int64),
    )
