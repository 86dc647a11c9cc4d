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
from ..ops.association import (assign_reads, association_band_batch,
                               association_band_device, read_block_votes,
                               read_block_votes_batch)
from ..ops.pileup import (allele_matrix_scatter,
                          allele_matrix_scatter_batch, het_call_vec,
                          pileup_het_batch, pileup_scatter,
                          template_vote_scatter_batch)
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


# ---- batched multi-contig phasing --------------------------------------
#
# The per-contig phase_contig_device loop pays ~6 dispatch/fetch round
# trips per contig; at hundreds of contigs the round trips (not compute)
# dominated the 2-phasing stage (VERDICT r3 weak #1: ~130 s of the 10 Mb
# run).  The batched driver groups contigs by shape bucket, stacks them
# on a leading group axis, and runs each pipeline step as a handful of
# batched device programs with two-phase async dispatch.  Per-contig
# results are bit-identical to phase_contig_device (integer scatter/sum
# semantics are order-free; padding rows are inert).


def _g_ladder(n: int, cap: int) -> int:
    """Group-axis bucket: pow2 >= n, capped (one compile per size)."""
    g = 1
    while g < n and g < cap:
        g *= 2
    return min(g, cap)


def _prep_contig(aln: AlnSet, ci: int, t_len: int) -> dict:
    rec_idx = np.nonzero(aln.ctg == ci)[0]
    row, pos, base = flat_delta0_tags(aln, rec_idx)
    return {
        "ci": ci, "t_len": t_len, "rec_idx": rec_idx,
        "read_ids": aln.read_id[rec_idx], "row": row, "pos": pos,
        "base": base, "Tb": _bucket(t_len, 4096),
        "Nb": _bucket(len(pos), 8192),
    }


def _group_chunks(keys: list[tuple], per_bytes, cap_bytes: int):
    """Yield (chunk_of_indices, Gb) with Gb on a pow2 ladder, grouped by
    identical bucket keys and capped so one dispatch stays under
    cap_bytes of device temporaries."""
    groups: dict[tuple, list[int]] = {}
    for k, key in enumerate(keys):
        groups.setdefault(key, []).append(k)
    for key, idxs in sorted(groups.items()):
        cap = max(1, min(64, int(cap_bytes // max(per_bytes(key), 1))))
        Gb = _g_ladder(len(idxs), cap)
        for s in range(0, len(idxs), Gb):
            yield idxs[s : s + Gb], Gb


def _batched_pileup_het(prep: list[dict], cfg: PhasingConfig,
                        cap_bytes: int = 1 << 30) -> None:
    """Fill per-contig het_pos/b1/b2 via grouped pileup+het programs."""
    keys = [(p["Tb"], p["Nb"]) for p in prep]
    pend = []
    for sub, Gb in _group_chunks(
            keys, lambda k: k[0] * 20 + k[1] * 8, cap_bytes):
        Tb, Nb = keys[sub[0]]
        pos_b = np.full((Gb, Nb), -1, np.int32)
        base_b = np.zeros((Gb, Nb), np.int32)
        for gi, k in enumerate(sub):
            p = prep[k]
            pos_b[gi, : len(p["pos"])] = p["pos"]
            base_b[gi, : len(p["base"])] = p["base"]
        h = pileup_het_batch(
            pos_b, base_b, t_len=Tb, min_depth=cfg.min_depth,
            min_allele_count=cfg.min_allele_count,
            allele_freq_min=cfg.allele_freq_min,
            biallelic_frac=cfg.biallelic_frac)
        pend.append((sub, h))
    for sub, (is_het, b1a, b2a) in pend:
        is_het = np.asarray(is_het)
        b1a = np.asarray(b1a)
        b2a = np.asarray(b2a)
        for gi, k in enumerate(sub):
            p = prep[k]
            het = np.nonzero(is_het[gi][: p["t_len"]])[0].astype(np.int64)
            p["het_pos"] = het
            p["b1"] = b1a[gi][het]
            p["b2"] = b2a[gi][het]


def phase_contigs_batched(aln: AlnSet, ctg_ids, t_lens,
                          cfg: PhasingConfig | None = None,
                          cap_bytes: int = 1 << 30
                          ) -> list[ContigPhasing]:
    """Phase MANY contigs with grouped batched device programs.

    Drop-in for [phase_contig_device(aln, ci, tl, cfg) for ci, tl in
    zip(ctg_ids, t_lens)] with bit-identical outputs (ContigPhasing
    .counts is omitted — no production consumer needs the full pileup).
    """
    cfg = cfg or PhasingConfig()
    prep = [_prep_contig(aln, int(ci), int(tl))
            for ci, tl in zip(ctg_ids, t_lens)]
    _batched_pileup_het(prep, cfg, cap_bytes)

    # ---- grouped allele matrix + association (M stays on device) -----
    live = [k for k, p in enumerate(prep)
            if len(p["het_pos"]) and len(p["rec_idx"])]
    for k in live:
        p = prep[k]
        p["Sb"] = _bucket(len(p["het_pos"]), 256)
        p["Rb"] = _bucket(len(p["rec_idx"]), 256)
    keys = {k: (prep[k]["Tb"], prep[k]["Nb"], prep[k]["Sb"],
                prep[k]["Rb"]) for k in live}

    def _assoc_bytes(key):
        Tb, Nb, Sb, Rb = key
        return Rb * Sb * 13 + Tb * 4 + Nb * 12

    pend = []
    for sub, Gb in _group_chunks([keys[k] for k in live],
                                 _assoc_bytes, cap_bytes):
        sub = [live[i] for i in sub]
        Tb, Nb, Sb, Rb = keys[sub[0]]
        pos_b = np.full((Gb, Nb), -1, np.int32)
        base_b = np.zeros((Gb, Nb), np.int32)
        row_b = np.zeros((Gb, Nb), np.int32)
        p2s = np.full((Gb, Tb), -1, np.int32)
        b1_b = np.full((Gb, Sb), -9, np.int32)
        b2_b = np.full((Gb, Sb), -9, np.int32)
        for gi, k in enumerate(sub):
            p = prep[k]
            pos_b[gi, : len(p["pos"])] = p["pos"]
            base_b[gi, : len(p["base"])] = p["base"]
            row_b[gi, : len(p["row"])] = p["row"]
            S = len(p["het_pos"])
            p2s[gi][p["het_pos"]] = np.arange(S, dtype=np.int32)
            b1_b[gi, :S] = p["b1"]
            b2_b[gi, :S] = p["b2"]
        M = allele_matrix_scatter_batch(
            row_b, pos_b, base_b, p2s, b1_b, b2_b,
            n_reads=Rb, n_sites=Sb, t_len=Tb)
        sc = association_band_batch(M, max_span=cfg.max_span)
        pend.append((sub, M, sc))

    # ---- host: phase blocks per contig; then grouped block votes -----
    votes_pend = []
    for sub, M, (score, cov) in pend:
        score = np.asarray(score)
        cov = np.asarray(cov)
        Gb = score.shape[0]
        Sb = prep[sub[0]]["Sb"]
        onehot = np.zeros((Gb, Sb, 0), np.int8)
        max_blocks = 0
        per_ctg = []
        for gi, k in enumerate(sub):
            p = prep[k]
            S = len(p["het_pos"])
            block_id, orient = phase_blocks(score[gi][:S], cov[gi][:S],
                                            S, cfg)
            p["block_id"] = block_id
            p["orient"] = orient
            n_blocks = int(block_id.max()) + 1 if S else 0
            max_blocks = max(max_blocks, n_blocks)
            per_ctg.append((gi, k, n_blocks))
        Bb = _bucket(max(max_blocks, 1), 16)
        onehot = np.zeros((Gb, Sb, Bb), np.int8)
        sgn = np.ones((Gb, Sb), np.int32)
        for gi, k, n_blocks in per_ctg:
            p = prep[k]
            S = len(p["het_pos"])
            sel = p["block_id"] >= 0
            onehot[gi][np.nonzero(sel)[0], p["block_id"][sel]] = 1
            sgn[gi, :S] = 1 - 2 * p["orient"].astype(np.int32)
        v = read_block_votes_batch(M, onehot, sgn)
        votes_pend.append((sub, per_ctg, v))

    for sub, per_ctg, (votes, covs) in votes_pend:
        votes = np.asarray(votes)
        covs = np.asarray(covs)
        for gi, k, n_blocks in per_ctg:
            p = prep[k]
            R = len(p["rec_idx"])
            if n_blocks == 0:
                p["r_block"] = np.full(R, -1, np.int64)
                p["r_phase"] = np.full(R, -1, np.int8)
            else:
                p["r_block"], p["r_phase"] = assign_reads(
                    votes[gi][:R, :n_blocks], covs[gi][:R, :n_blocks])

    out = []
    for p in prep:
        S = len(p.get("het_pos", ()))
        R = len(p["rec_idx"])
        out.append(ContigPhasing(
            ctg=p["ci"], het_pos=p["het_pos"], b1=p["b1"], b2=p["b2"],
            block_id=p.get("block_id", np.full(S, -1, np.int64)),
            orient=p.get("orient", np.zeros(S, np.int8)),
            read_ids=p["read_ids"],
            r_block=p.get("r_block", np.full(R, -1, np.int64)),
            r_phase=p.get("r_phase", np.full(R, -1, np.int8)),
            counts=None))
    return out


def template_route_votes(aln: AlnSet, ctg_ids, t_lens, templates,
                         cfg: PhasingConfig | None = None,
                         cap_bytes: int = 1 << 30):
    """Per-record template-agreement votes for the quiver phase routing.

    For each contig: call het sites from the record pileup, then score
    every record +1/-1 per het site where it carries the template's own
    allele / the opposite allele.  Records with a NEGATIVE vote oppose
    the template's haplotype and should be dropped; 0 (spans no usable
    het site) keeps.  Role parity: [U] quiver consumes the tracked
    phase map instead of re-running full phasing (SURVEY.md §3.4 step
    1) — this replaces the full phase_contig_device re-phasing that was
    the 4th-largest wall-clock item at 10 Mb (VERDICT r3 weak #7).

    Returns a list of (rec_idx, votes) per contig, aligned with ctg_ids.
    """
    cfg = cfg or PhasingConfig()
    prep = [_prep_contig(aln, int(ci), int(tl))
            for ci, tl in zip(ctg_ids, t_lens)]
    _batched_pileup_het(prep, cfg, cap_bytes)
    for p, tpl in zip(prep, templates):
        het = p["het_pos"]
        tb = np.asarray(tpl)[het].astype(np.int32) if len(het) else \
            np.zeros(0, np.int32)
        is1 = tb == p["b1"]
        is2 = tb == p["b2"]
        valid = is1 | is2
        p["tmpl_a"] = np.where(valid, tb, -9)
        p["other_a"] = np.where(is1, p["b2"],
                                np.where(is2, p["b1"], -9)).astype(np.int32)
        p["Rb"] = _bucket(max(len(p["rec_idx"]), 1), 256)

    keys = [(p["Tb"], p["Nb"], p["Rb"]) for p in prep]
    pend = []
    for sub, Gb in _group_chunks(
            keys, lambda k: k[0] * 8 + k[1] * 12 + k[2] * 4, cap_bytes):
        Tb, Nb, Rb = keys[sub[0]]
        pos_b = np.full((Gb, Nb), -1, np.int32)
        base_b = np.zeros((Gb, Nb), np.int32)
        row_b = np.zeros((Gb, Nb), np.int32)
        ta = np.full((Gb, Tb), -9, np.int32)
        oa = np.full((Gb, Tb), -9, np.int32)
        for gi, k in enumerate(sub):
            p = prep[k]
            pos_b[gi, : len(p["pos"])] = p["pos"]
            base_b[gi, : len(p["base"])] = p["base"]
            row_b[gi, : len(p["row"])] = p["row"]
            het = p["het_pos"]
            if len(het):
                ta[gi][het] = p["tmpl_a"]
                oa[gi][het] = p["other_a"]
        v = template_vote_scatter_batch(row_b, pos_b, base_b, ta, oa,
                                        n_reads=Rb, t_len=Tb)
        pend.append((sub, v))
    out: list = [None] * len(prep)
    for sub, v in pend:
        v = np.asarray(v)
        for gi, k in enumerate(sub):
            p = prep[k]
            out[k] = (p["rec_idx"], v[gi][: len(p["rec_idx"])])
    return out
