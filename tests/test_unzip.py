"""End-to-end unzip: preads -> overlaps -> phased graph -> p_ctg + h_ctg."""
import numpy as np
import pytest

from falcon_unzip_tpu.models.aligner import ReadToContigAligner
from falcon_unzip_tpu.models.overlapper import OverlapperConfig, PreadOverlapper
from falcon_unzip_tpu.models.phaser import phase_contig_device
from falcon_unzip_tpu.models.unzipper import (OvlpFilterConfig, Unzipper,
                                              phase_filter_mask)
from falcon_unzip_tpu.oracle import align as oa
from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads


def _edit_dist_vs(hseq, ref):
    """Best banded tglocal distance of hseq (either strand) against ref."""
    from falcon_unzip_tpu.seq import revcomp
    best = 1 << 20
    for q in (hseq, revcomp(hseq)):
        res = oa.align(q, ref, W=256, mode="tglocal")
        if res:
            best = min(best, res["dist"])
    return best


@pytest.fixture(scope="module")
def pipeline():
    # het region confined to the middle: homozygous flanks anchor a bubble
    dip = make_diploid(length=12000, het_rate=0.015, seed=21,
                       het_span=(0.3, 0.7))
    # "preads" = error-corrected reads: error free here
    reads = simulate_reads(dip, coverage=18.0, read_len=2500,
                           error_rate=0.0, seed=22)
    # 1) map preads to the draft (hap0 acts as FALCON's p_ctg draft)
    al = ReadToContigAligner([dip.hap0])
    aln = al.align_batch(reads.batch)
    # 2) phase
    ph = phase_contig_device(aln, 0, len(dip.hap0))
    n_reads = len(reads.batch)
    read_ctg = np.full(n_reads, -1, np.int64)
    read_block = np.full(n_reads, -1, np.int64)
    read_phase = np.full(n_reads, -1, np.int8)
    read_ctg[ph.read_ids] = 0
    read_block[ph.read_ids] = ph.r_block
    read_phase[ph.read_ids] = ph.r_phase
    # 3) overlaps
    ov = PreadOverlapper(reads.batch,
                         OverlapperConfig(min_overlap=400)).compute()
    return dip, reads, ph, read_ctg, read_block, read_phase, ov


def test_overlaps_found(pipeline):
    dip, reads, ph, read_ctg, read_block, read_phase, ov = pipeline
    assert len(ov) > len(reads.batch)  # at least ~1 overlap per read
    assert (ov.identity() > 0.95).mean() > 0.9


def test_phase_filter_drops_cross_phase(pipeline):
    dip, reads, ph, read_ctg, read_block, read_phase, ov = pipeline
    # coverage filters off: this test isolates the PHASE constraint
    # (coverage-filter behavior is covered by tests/test_ovlp_filter.py)
    keep = phase_filter_mask(ov, read_ctg, read_block, read_phase,
                             OvlpFilterConfig(max_diff=0, max_cov=0,
                                              min_cov=0, bestn=0))
    # some overlaps join opposite phases and must be dropped
    hap_a = reads.hap[ov.a_id]
    hap_b = reads.hap[ov.b_id]
    cross = hap_a != hap_b
    # the filter should remove most TRUE cross-haplotype overlaps
    # (those the phaser saw and phased)
    phased_pair = (read_phase[ov.a_id] >= 0) & (read_phase[ov.b_id] >= 0) \
        & (read_block[ov.a_id] == read_block[ov.b_id]) \
        & (read_block[ov.a_id] >= 0)
    dropped = ~keep & phased_pair
    assert (cross[phased_pair & ~keep]).mean() > 0.9  # dropped are cross
    assert keep.sum() > 0


def _find_either(seq, hap):
    """Exact placement of seq (either strand) in hap: (strand, pos) or None."""
    from falcon_unzip_tpu.seq import revcomp
    p = hap.tobytes().find(seq.tobytes())
    if p >= 0:
        return 0, p
    p = hap.tobytes().find(revcomp(seq).tobytes())
    if p >= 0:
        return 1, p
    return None


def test_unzip_emits_primary_and_haplotigs(pipeline):
    dip, reads, ph, read_ctg, read_block, read_phase, ov = pipeline
    keep = phase_filter_mask(ov, read_ctg, read_block, read_phase)
    uz = Unzipper(reads.batch, read_block, read_phase, read_ctg=read_ctg)
    res = uz.unzip(ov, keep)
    assert len(res.p_ctg) >= 1
    total_p = sum(len(s) for _, s, _ in res.p_ctg)
    assert total_p > 0.8 * len(dip.hap0)
    assert len(res.h_ctg) >= 1

    # error-free preads: every contig must be an EXACT substring of one
    # haplotype (in some orientation)
    p_spans = []
    for name, seq, _ in res.p_ctg:
        hit0 = _find_either(seq, dip.hap0)
        hit1 = _find_either(seq, dip.hap1)
        assert hit0 or hit1, f"{name} not exact in either haplotype"
        if hit0:
            p_spans.append((0, hit0[1], hit0[1] + len(seq)))
        else:
            p_spans.append((1, hit1[1], hit1[1] + len(seq)))

    h_spans = []
    for h in res.h_ctg:
        if len(h.seq) < 300:
            continue
        hit0 = _find_either(h.seq, dip.hap0)
        hit1 = _find_either(h.seq, dip.hap1)
        assert hit0 or hit1, f"{h.name} not exact in either haplotype"
        if hit1:
            h_spans.append((1, hit1[1], hit1[1] + len(h.seq)))
        else:
            h_spans.append((0, hit0[1], hit0[1] + len(h.seq)))

    # both alleles recovered: most het SNPs covered by a primary span on
    # one hap AND a haplotig span on the other
    both = 0
    for p in dip.snp_pos:
        on0 = any(s <= p < e for hh, s, e in p_spans + h_spans if hh == 0)
        on1 = any(s <= p < e for hh, s, e in p_spans + h_spans if hh == 1)
        both += on0 and on1
    assert both > 0.8 * len(dip.snp_pos), (both, len(dip.snp_pos))


def test_chain_best_per_pair_matches_per_target_loop():
    """Batched per-pair chaining == the per-read chain_best_per_target."""
    import numpy as np
    from falcon_unzip_tpu.ops.kmer_index import (chain_best_per_pair,
                                                 chain_best_per_target)
    rng = np.random.default_rng(0)
    N_READS, N_TGT, N_ANCH = 17, 23, 4000
    rid = rng.integers(0, N_READS, N_ANCH).astype(np.int32)
    q_pos = rng.integers(0, 1800, N_ANCH).astype(np.int64)
    t_pos = rng.integers(0, 2000, N_ANCH).astype(np.int64)
    t_ctg = rng.integers(0, N_TGT, N_ANCH).astype(np.int32)

    got = set()
    a_ids, b_ids, t_los = chain_best_per_pair(
        rid, q_pos, t_pos, t_ctg, n_targets=N_TGT, min_anchors=3)
    for a, b, d in zip(a_ids, b_ids, t_los):
        got.add((int(a), int(b), int(d)))

    want = set()
    for a in range(N_READS):
        sel = rid == a
        bs, t_ls = chain_best_per_target(q_pos[sel], t_pos[sel],
                                         t_ctg[sel], min_anchors=3)
        for b, d in zip(bs, t_ls):
            want.add((a, int(b), int(d)))
    assert got == want and len(got) > 20
