"""Unzip hardening: het-indel bubbles, rc reads, multi-arm branches
(VERDICT.md weak #5 / next #9)."""
import numpy as np
import pytest

from falcon_unzip_tpu.models.aligner import ReadToContigAligner
from falcon_unzip_tpu.models.overlapper import OverlapperConfig, PreadOverlapper
from falcon_unzip_tpu.models.phaser import phase_contig_device
from falcon_unzip_tpu.models.unzipper import (OvlpFilterConfig, UnzipConfig,
                                              Unzipper, phase_filter_mask)
from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads


def _run_unzip_sim(dip, reads, min_overlap=400):
    al = ReadToContigAligner([dip.hap0])
    aln = al.align_batch(reads.batch)
    ph = phase_contig_device(aln, 0, len(dip.hap0))
    n = len(reads.batch)
    read_ctg = np.full(n, -1, np.int64)
    read_block = np.full(n, -1, np.int64)
    read_phase = np.full(n, -1, np.int8)
    read_ctg[ph.read_ids] = 0
    read_block[ph.read_ids] = ph.r_block
    read_phase[ph.read_ids] = ph.r_phase
    ov = PreadOverlapper(reads.batch,
                         OverlapperConfig(min_overlap=min_overlap)).compute()
    keep = phase_filter_mask(ov, read_ctg, read_block, read_phase,
                             OvlpFilterConfig(min_overlap=min_overlap))
    uz = Unzipper(reads.batch, read_block, read_phase, read_ctg=read_ctg)
    return uz.unzip(ov, keep), ph


def _best_identity(seq, hap):
    """Identity of seq against hap via the seeded aligner (handles
    placement offsets + strand)."""
    from falcon_unzip_tpu.models.aligner import (AlignerConfig,
                                                 ReadToContigAligner)
    from falcon_unzip_tpu.seq import SeqBatch
    al = ReadToContigAligner([np.asarray(hap, np.int8)],
                             AlignerConfig(band=512, min_identity=0.0))
    aln = al.align_batch(SeqBatch.from_strs([np.asarray(seq, np.int8)]))
    if len(aln) == 0:
        return 0.0
    return float(aln.identity().max())


def test_unzip_with_het_indels():
    """Het SNPs + het indels in the bubble: both haplotype sequences must
    come out of the unzip with high identity to truth."""
    dip = make_diploid(length=12000, het_rate=0.015, seed=31,
                       het_span=(0.3, 0.7), indel_frac=0.3)
    assert len(dip.indel_pos) > 0, "sim must contain het indels"
    reads = simulate_reads(dip, coverage=18.0, read_len=2500,
                           error_rate=0.0, seed=32)
    res, ph = _run_unzip_sim(dip, reads)
    assert len(res.p_ctg) >= 1
    assert len(res.h_ctg) >= 1
    # primary reconstructs one haplotype; the biggest haplotig the other
    p_seq = res.p_ctg[0][1]
    h_seq = max((h.seq for h in res.h_ctg), key=len)
    p0 = _best_identity(p_seq, dip.hap0)
    p1 = _best_identity(p_seq, dip.hap1)
    assert max(p0, p1) > 0.995, (p0, p1)
    h0 = _best_identity(h_seq, dip.hap0)
    h1 = _best_identity(h_seq, dip.hap1)
    assert max(h0, h1) > 0.995, (h0, h1)
    # and they are OPPOSITE haplotypes
    assert (p0 > p1) != (h0 > h1)


def test_unzip_with_reverse_strand_reads():
    """Half the reads reverse-complemented: phasing + unzip must still
    separate the haplotypes (strand handled by the aligner/overlapper)."""
    dip = make_diploid(length=10000, het_rate=0.02, seed=33,
                       het_span=(0.3, 0.7))
    reads = simulate_reads(dip, coverage=18.0, read_len=2500,
                           error_rate=0.0, seed=34, rc_frac=0.5)
    assert reads.strand.sum() > 5
    res, ph = _run_unzip_sim(dip, reads)
    assert len(res.p_ctg) >= 1 and len(res.h_ctg) >= 1
    p_seq = res.p_ctg[0][1]
    h_seq = max((h.seq for h in res.h_ctg), key=len)
    assert max(_best_identity(p_seq, dip.hap0),
               _best_identity(p_seq, dip.hap1)) > 0.995
    assert max(_best_identity(h_seq, dip.hap0),
               _best_identity(h_seq, dip.hap1)) > 0.995


def test_three_arm_branch_resolves():
    """A junction with 3 outgoing arms that reconverge: the walk must pick
    one arm as primary, emit the others as haplotigs, and continue past
    the convergence node (multi-step convergence search)."""
    from falcon_unzip_tpu.graph.string_graph import StringGraph, node
    from falcon_unzip_tpu.models.unzipper import Unzipper, UnzipConfig
    from falcon_unzip_tpu.seq import SeqBatch

    rng = np.random.default_rng(41)
    # reads: 0 -> {1a,1b,1c} -> 2 -> 3 chain, arms are single reads
    base = rng.integers(0, 4, 12000).astype(np.int8)
    r0 = base[0:2000]
    arms = []
    for v in range(3):
        seg = base[1200:3200].copy()
        seg[400:1600] = (seg[400:1600] + 1 + v) % 4   # diverged middles
        arms.append(seg)
    r2 = base[2400:4400]
    r3 = base[3600:5600]
    reads = SeqBatch.from_strs([r0, *arms, r2, r3])

    g_rows = []
    def dovetail(a, b, ov):
        la, lb = len(reads.row(a)), len(reads.row(b))
        g_rows.append((a, b, 0, la - ov, la, 0, ov, la, lb, 0))
    for arm_id in (1, 2, 3):
        dovetail(0, arm_id, 800)
        dovetail(arm_id, 4, 800)
    dovetail(4, 5, 800)
    arr = np.array(g_rows, np.int32)
    from falcon_unzip_tpu.models.overlapper import OverlapSet
    ovl = OverlapSet(
        a_id=arr[:, 0], b_id=arr[:, 1], strand=arr[:, 2].astype(np.int8),
        a_start=arr[:, 3], a_end=arr[:, 4], b_start=arr[:, 5],
        b_end=arr[:, 6], a_len=arr[:, 7], b_len=arr[:, 8], dist=arr[:, 9])
    phase = np.array([-1, 0, 1, -1, -1, -1], np.int8)
    block = np.array([-1, 0, 0, -1, -1, -1], np.int64)
    uz = Unzipper(reads, block, phase,
                  cfg=UnzipConfig(drop_chimers=False))
    res = uz.unzip(ovl, np.ones(len(ovl), bool))
    # one primary spanning the junction, 2 alternative arms emitted
    assert len(res.p_ctg) == 1
    assert len(res.h_ctg) == 2
    path_reads = res.p_ctg[0][2]
    assert path_reads[0] == 0 and path_reads[-1] == 5
    for h in res.h_ctg:
        assert len(h.seq) > 0
        assert h.primary == res.p_ctg[0][0]


def test_repeat_multimapping_places_true_locus():
    """Segmental duplications (95-99% identity) multi-map reads; the
    bestn/identity tie-break must still pick the true copy, and the
    max_hits_per_read > 1 path must surface the secondary hit
    (VERDICT r3 next #8; [U] blasr multi-placement, SURVEY.md §2b)."""
    from falcon_unzip_tpu.models.aligner import AlignerConfig
    dip = make_diploid(length=60000, het_rate=0.0, seed=911,
                       n_repeats=2, repeat_len=3000,
                       repeat_identity=0.97)
    assert len(dip.repeat_src) == 2
    rd = simulate_reads(dip, coverage=10.0, read_len=2500,
                        error_rate=0.0, seed=912)
    al = ReadToContigAligner([dip.hap0],
                             AlignerConfig(max_hits_per_read=4))
    aln = al.align_batch(rd.batch)
    # best record per read (min dist, ties -> first in canonical order)
    best = {}
    for a in range(len(aln)):
        r = int(aln.read_id[a])
        if r not in best or aln.dist[a] < aln.dist[best[r]]:
            best[r] = a
    n_multi = sum(1 for r in set(aln.read_id)
                  if (aln.read_id == r).sum() > 1)
    assert n_multi > 0, "repeat reads must surface secondary hits"
    ok = 0
    for r, a in best.items():
        true_s = int(rd.start[r])
        if abs(int(aln.t_start[a]) - true_s) < 300:
            ok += 1
    assert ok >= 0.95 * len(best), (ok, len(best))


def test_chimeric_reads_align_single_segment():
    """A chimeric read must align ONE segment (junction clipped by
    anchor trimming), not smear across the junction."""
    dip = make_diploid(length=40000, het_rate=0.0, seed=921)
    rd = simulate_reads(dip, coverage=6.0, read_len=3000,
                        error_rate=0.0, seed=922, chimera_frac=1.0)
    assert rd.chimera.all()
    aln = ReadToContigAligner([dip.hap0]).align_batch(rd.batch)
    assert len(aln) > 0
    ident = aln.identity()
    clean = 0
    for a in range(len(aln)):
        r = int(aln.read_id[a])
        L = int(rd.batch.lengths[r])
        t_span = int(aln.t_end[a] - aln.t_start[a])
        if t_span <= 0.8 * L + 300 and ident[a] >= 0.95:
            clean += 1
    # rare exceptions are legitimate: a fusion whose second segment is
    # accidentally colinear with the first aligns full-length, and an
    # accidental anchor can keep a short smear past the junction
    # (identity still above the filter floor); the bulk must be clean
    assert clean >= 0.85 * len(aln), (clean, len(aln))


def test_repeat_phasing_stays_correct():
    """Het phasing on a repeat-bearing diploid: phased reads must still
    match their true haplotype (repeat-induced mismapping would mix
    phases)."""
    dip = make_diploid(length=60000, het_rate=0.015, seed=931,
                       het_span=(0.05, 0.95), n_repeats=2,
                       repeat_len=3000, repeat_identity=0.97)
    rd = simulate_reads(dip, coverage=14.0, read_len=2500,
                        error_rate=0.0, seed=932)
    al = ReadToContigAligner([dip.hap0])
    aln = al.align_batch(rd.batch)
    ph = phase_contig_device(aln, 0, len(dip.hap0))
    phased = ph.r_block >= 0
    assert phased.sum() >= 0.5 * len(ph.read_ids)
    # within each (block, phase) group, reads must be hap-pure
    ok = tot = 0
    for b in np.unique(ph.r_block[phased]):
        for s in (0, 1):
            sel = phased & (ph.r_block == b) & (ph.r_phase == s)
            if sel.sum() < 2:
                continue
            haps = rd.hap[ph.read_ids[sel]]
            tot += len(haps)
            ok += max((haps == 0).sum(), (haps == 1).sum())
    assert tot > 0 and ok >= 0.97 * tot, (ok, tot)
