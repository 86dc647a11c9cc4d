"""Per-contig het-SNP calling + read phasing stage (device-accelerated).

Role parity: [U] falcon_unzip/mains/phasing.py + phasing.py driving
SURVEY.md §3.2 — but as ONE batched device program per contig instead of a
pileup/association/blocks/readmap file pipeline: scatter-add pileup,
vectorized het predicate, banded association scan, MXU block-vote matmuls.
The only host-sequential piece is the tiny greedy union-find over accepted
links (shared with the oracle — it is the deterministic spec and the
implementation).

Output mirrors the reference's ``phased_reads`` records:
(read_id, ctg, block, phase).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..oracle.phasing import PhasingConfig, phase_blocks
from ..ops.association import (assign_reads, association_band_device,
                               read_block_votes)
from ..ops.pileup import (allele_matrix_scatter, het_call_vec,
                          pileup_scatter)
from .aligner import AlnSet


def _bucket(n: int, floor: int) -> int:
    """Smallest ladder size >= n from {p2, 1.5*p2} (waste <= 33%).

    Every device op in this stage jits on its static shapes; without
    bucketing each contig's unique (t_len, n_tags, n_sites, n_reads,
    n_blocks) tuple forced a fresh XLA compile — at 300kb/6 contigs the
    phasing stage spent 83 of its 83s compiling.  The ladder collapses
    the shape space so programs are reused across contigs AND across
    runs (persistent compile cache).  Padding is inert: pos=-1 tags are
    dropped by the scatters, zero count-rows fail the het predicate
    (filtered on host regardless), and zero M rows/cols contribute
    nothing to association scores or block votes.
    """
    b = floor
    while b < n:
        if b + (b >> 1) >= n:
            return b + (b >> 1)
        b <<= 1
    return b


@dataclasses.dataclass
class ContigPhasing:
    ctg: int
    het_pos: np.ndarray       # (S,) int64 contig positions of het SNPs
    b1: np.ndarray            # (S,) int8 top allele
    b2: np.ndarray            # (S,) int8 second allele
    block_id: np.ndarray      # (S,) int64, -1 = unblocked
    orient: np.ndarray        # (S,) int8
    read_ids: np.ndarray      # (R,) int32 reads aligned to this contig
    r_block: np.ndarray       # (R,) int64, -1 = unphased
    r_phase: np.ndarray       # (R,) int8, -1 = unphased
    counts: np.ndarray        # (t_len, 5) pileup


def flat_delta0_tags(aln: AlnSet, rec_idx: np.ndarray):
    """Concatenate delta-0 tags of the given aln records into flat arrays.

    Returns (row, pos, base): row indexes into rec_idx order.  One
    concatenation + one vectorized delta mask for the whole record set
    (this feeds every pileup; a per-record mask loop dominated host time
    at >100kb scale).
    """
    tags_l = [aln.tags[a] for a in rec_idx]
    lens = np.array([0 if t is None else len(t) for t in tags_l], np.int64)
    if lens.sum() == 0:
        z = np.zeros(0, np.int32)
        return z, z, z
    cat = np.concatenate([t for t in tags_l if t is not None and len(t)])
    rows = np.repeat(np.arange(len(rec_idx), dtype=np.int32), lens)
    d0 = cat[:, 1] == 0
    return (rows[d0], cat[d0, 0].astype(np.int32),
            cat[d0, 2].astype(np.int32))


def phase_contig_device(aln: AlnSet, ctg: int, t_len: int,
                        cfg: PhasingConfig | None = None,
                        phase_ops=None) -> ContigPhasing:
    """Run the full phasing stage for one contig using device ops.

    phase_ops: optional parallel.sharding.ShardedPhaseOps — routes the
    pileup + association through mesh-sharded collectives (bit-identical
    integer semantics); None = single-device jit ops.
    """
    cfg = cfg or PhasingConfig()
    rec_idx = np.nonzero(aln.ctg == ctg)[0]
    read_ids = aln.read_id[rec_idx]
    row, pos, base = flat_delta0_tags(aln, rec_idx)

    # bucketed static shapes -> compiled programs shared across contigs
    Tb = _bucket(t_len, 4096)
    Nb = _bucket(len(pos), 8192)
    pos_b = np.full(Nb, -1, np.int32)
    pos_b[: len(pos)] = pos
    base_b = np.zeros(Nb, np.int32)
    base_b[: len(base)] = base
    row_b = np.zeros(Nb, np.int32)
    row_b[: len(row)] = row

    # device rows beyond t_len are zero, so the full (Tb, 5) tensor feeds
    # het_call_vec directly; only the stored counts field is sliced
    if phase_ops is not None:
        cpad = phase_ops.pileup(pos_b, base_b, t_len=Tb)
    else:
        cpad = np.asarray(pileup_scatter(pos_b, base_b, t_len=Tb))
    counts = cpad[:t_len]
    is_het, b1_all, b2_all = het_call_vec(
        cpad, min_depth=cfg.min_depth,
        min_allele_count=cfg.min_allele_count,
        allele_freq_min=cfg.allele_freq_min,
        biallelic_frac=cfg.biallelic_frac)
    het_pos = np.nonzero(np.asarray(is_het)[:t_len])[0].astype(np.int64)
    b1 = np.asarray(b1_all)[het_pos]
    b2 = np.asarray(b2_all)[het_pos]
    S = len(het_pos)
    R = len(rec_idx)
    if S == 0 or R == 0:
        return ContigPhasing(
            ctg=ctg, het_pos=het_pos, b1=b1, b2=b2,
            block_id=np.full(S, -1, np.int64),
            orient=np.zeros(S, np.int8),
            read_ids=read_ids,
            r_block=np.full(R, -1, np.int64),
            r_phase=np.full(R, -1, np.int8),
            counts=counts)

    Sb = _bucket(S, 256)
    Rb = _bucket(R, 256)
    pos_to_site = np.full(Tb, -1, np.int32)
    pos_to_site[het_pos] = np.arange(S, dtype=np.int32)
    b1_b = np.full(Sb, -9, np.int32)   # sentinel: matches no base code
    b1_b[:S] = b1
    b2_b = np.full(Sb, -9, np.int32)
    b2_b[:S] = b2
    M = np.asarray(allele_matrix_scatter(
        row_b, pos_b, base_b, pos_to_site, b1_b, b2_b,
        n_reads=Rb, n_sites=Sb, t_len=Tb))

    if phase_ops is not None:
        score, cov = phase_ops.association(M, max_span=cfg.max_span)
    else:
        score, cov = association_band_device(M, max_span=cfg.max_span)
    block_id, orient = phase_blocks(np.asarray(score)[:S],
                                    np.asarray(cov)[:S], S, cfg)

    n_blocks = int(block_id.max()) + 1 if S else 0
    if n_blocks == 0:
        r_block = np.full(R, -1, np.int64)
        r_phase = np.full(R, -1, np.int8)
    else:
        onehot = np.zeros((Sb, _bucket(n_blocks, 16)), np.int8)
        sel = block_id >= 0
        onehot[np.nonzero(sel)[0], block_id[sel]] = 1
        sgn = np.ones(Sb, np.int32)
        sgn[:S] = 1 - 2 * orient.astype(np.int32)
        votes, covs = read_block_votes(M, onehot, sgn)
        r_block, r_phase = assign_reads(np.asarray(votes)[:R, :n_blocks],
                                        np.asarray(covs)[:R, :n_blocks])

    return ContigPhasing(
        ctg=ctg, het_pos=het_pos, b1=b1, b2=b2,
        block_id=block_id, orient=orient,
        read_ids=read_ids, r_block=r_block, r_phase=r_phase,
        counts=counts)


def phased_reads_table(ph: ContigPhasing) -> np.ndarray:
    """(R, 4) int64 table: read_id, ctg, block, phase (-1 = unphased).

    Role parity: the per-contig ``phased_reads`` output file of
    [U] falcon_unzip phasing (SURVEY.md §3.2 output)."""
    return np.stack([
        ph.read_ids.astype(np.int64),
        np.full(len(ph.read_ids), ph.ctg, np.int64),
        ph.r_block,
        ph.r_phase.astype(np.int64),
    ], axis=1)
