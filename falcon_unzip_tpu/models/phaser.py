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
from ..ops.pileup import (allele_matrix_scatter, call_het_sites_device,
                          pileup_scatter)
from .aligner import AlnSet


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

    if phase_ops is not None:
        counts = phase_ops.pileup(pos, base, t_len=t_len)
    else:
        counts = np.asarray(pileup_scatter(pos, base, t_len=t_len))
    het_pos, b1, b2 = call_het_sites_device(counts, cfg)
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

    pos_to_site = np.full(t_len, -1, np.int32)
    pos_to_site[het_pos] = np.arange(S, dtype=np.int32)
    M = np.asarray(allele_matrix_scatter(
        row, pos, base, pos_to_site,
        b1.astype(np.int32), b2.astype(np.int32),
        n_reads=R, n_sites=S, t_len=t_len))

    if phase_ops is not None:
        score, cov = phase_ops.association(M, max_span=cfg.max_span)
    else:
        score, cov = association_band_device(M, max_span=cfg.max_span)
    block_id, orient = phase_blocks(np.asarray(score), np.asarray(cov), S, cfg)

    n_blocks = int(block_id.max()) + 1 if S else 0
    if n_blocks == 0:
        r_block = np.full(R, -1, np.int64)
        r_phase = np.full(R, -1, np.int8)
    else:
        onehot = np.zeros((S, n_blocks), np.int8)
        sel = block_id >= 0
        onehot[np.nonzero(sel)[0], block_id[sel]] = 1
        sgn = (1 - 2 * orient.astype(np.int32))
        votes, covs = read_block_votes(M, onehot, sgn)
        r_block, r_phase = assign_reads(votes, covs)

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
