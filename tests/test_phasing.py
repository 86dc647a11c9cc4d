"""Phasing: device ops == oracle; end-to-end phase recovery on sim data."""
import numpy as np
import pytest

from falcon_unzip_tpu.models.aligner import ReadToContigAligner
from falcon_unzip_tpu.models.phaser import (flat_delta0_tags,
                                            phase_contig_device)
from falcon_unzip_tpu.oracle import phasing as op
from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads


@pytest.fixture(scope="module")
def sim():
    dip = make_diploid(length=12000, het_rate=0.01, seed=10)
    reads = simulate_reads(dip, coverage=30.0, read_len=2000,
                           error_rate=0.05, seed=11)
    al = ReadToContigAligner([dip.hap0])
    aln = al.align_batch(reads.batch)
    return dip, reads, aln


def test_device_matches_oracle(sim):
    dip, reads, aln = sim
    t_len = len(dip.hap0)
    rec_idx = np.nonzero(aln.ctg == 0)[0]
    tags_list = [aln.tags[a] for a in rec_idx]
    cfg = op.PhasingConfig()
    oracle = op.phase_contig(tags_list, aln.read_id[rec_idx], t_len, cfg)
    dev = phase_contig_device(aln, 0, t_len, cfg)
    assert np.array_equal(oracle["counts"], dev.counts)
    assert np.array_equal(oracle["het_pos"], dev.het_pos)
    assert np.array_equal(oracle["b1"], dev.b1)
    assert np.array_equal(oracle["b2"], dev.b2)
    assert np.array_equal(oracle["block_id"], dev.block_id)
    assert np.array_equal(oracle["orient"], dev.orient)
    assert np.array_equal(oracle["r_block"], dev.r_block)
    assert np.array_equal(oracle["r_phase"], dev.r_phase)


def test_het_sites_found(sim):
    dip, reads, aln = sim
    dev = phase_contig_device(aln, 0, len(dip.hap0))
    true = set(dip.snp_pos.tolist())
    found = set(dev.het_pos.tolist())
    # most true SNPs recovered, few false positives
    recall = len(true & found) / len(true)
    precision = len(true & found) / max(len(found), 1)
    assert recall > 0.8, recall
    assert precision > 0.8, precision


def test_read_phases_consistent_with_truth(sim):
    dip, reads, aln = sim
    dev = phase_contig_device(aln, 0, len(dip.hap0))
    # within each block, phase labels must be consistent with true haplotypes
    # up to a global flip per block
    phased = dev.r_block >= 0
    assert phased.sum() > 0.7 * len(dev.read_ids)
    agree = 0
    total = 0
    for b in np.unique(dev.r_block[phased]):
        sel = phased & (dev.r_block == b)
        truth = reads.hap[dev.read_ids[sel]]
        pred = dev.r_phase[sel]
        match = max((truth == pred).sum(), (truth == 1 - pred).sum())
        agree += int(match)
        total += int(sel.sum())
    assert agree / total > 0.95, (agree, total)


def test_phase_contigs_batched_matches_per_contig():
    """phase_contigs_batched == [phase_contig_device(...)] bit-for-bit
    across contigs of different shapes (the grouped-dispatch driver)."""
    from falcon_unzip_tpu.models.phaser import phase_contigs_batched
    from falcon_unzip_tpu.models.aligner import ReadToContigAligner
    from falcon_unzip_tpu.seq import SeqBatch
    from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads

    contigs, all_reads = [], []
    for ci, ln in enumerate((9000, 5000, 14000)):
        dip = make_diploid(length=ln, het_rate=0.02, seed=70 + ci,
                           het_span=(0.1, 0.9))
        rd = simulate_reads(dip, coverage=14.0, read_len=2500,
                            error_rate=0.0, seed=80 + ci)
        contigs.append(dip.hap0)
        all_reads += [rd.batch.to_str(i) for i in range(len(rd.batch))]
    batch = SeqBatch.from_strs(all_reads)
    aln = ReadToContigAligner(contigs).align_batch(batch)
    t_lens = [len(c) for c in contigs]
    batched = phase_contigs_batched(aln, range(3), t_lens)
    # device-batched pileup path (host_tag_cap high) must agree too
    batched_dev = phase_contigs_batched(aln, range(3), t_lens,
                                        host_tag_cap=1 << 40)
    for ci in range(3):
        ref = phase_contig_device(aln, ci, t_lens[ci])
        got = batched[ci]
        dev = batched_dev[ci]
        assert np.array_equal(dev.het_pos, ref.het_pos)
        assert np.array_equal(dev.r_block, ref.r_block)
        assert np.array_equal(got.het_pos, ref.het_pos)
        assert np.array_equal(got.b1, ref.b1)
        assert np.array_equal(got.b2, ref.b2)
        assert np.array_equal(got.block_id, ref.block_id)
        assert np.array_equal(got.orient, ref.orient)
        assert np.array_equal(got.read_ids, ref.read_ids)
        assert np.array_equal(got.r_block, ref.r_block)
        assert np.array_equal(got.r_phase, ref.r_phase)


def test_phase_long_contig_windowed_matches_per_contig():
    """The long-contig path (windowed association + host pileup + sparse
    votes) must match phase_contig_device bit-for-bit; thresholds are
    forced tiny so a normal sim exercises every long-path branch."""
    from falcon_unzip_tpu.models.phaser import phase_contigs_batched
    from falcon_unzip_tpu.models.aligner import ReadToContigAligner
    from falcon_unzip_tpu.seq import SeqBatch
    from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads

    dip = make_diploid(length=24000, het_rate=0.02, seed=77,
                       het_span=(0.05, 0.95))
    rd = simulate_reads(dip, coverage=14.0, read_len=2500,
                        error_rate=0.0, seed=78)
    batch = SeqBatch.from_strs([rd.batch.to_str(i)
                                for i in range(len(rd.batch))])
    aln = ReadToContigAligner([dip.hap0]).align_batch(batch)
    t_len = len(dip.hap0)
    ref = phase_contig_device(aln, 0, t_len)
    assert len(ref.het_pos) > 150, "sim must produce enough het sites"
    # force: host pileup (host_tag_cap), long path (long_s), >2 windows
    got = phase_contigs_batched(
        aln, [0], [t_len], s_win=96, long_s=64, host_tag_cap=1)[0]
    assert np.array_equal(got.het_pos, ref.het_pos)
    assert np.array_equal(got.b1, ref.b1)
    assert np.array_equal(got.b2, ref.b2)
    assert np.array_equal(got.block_id, ref.block_id)
    assert np.array_equal(got.orient, ref.orient)
    assert np.array_equal(got.r_block, ref.r_block)
    assert np.array_equal(got.r_phase, ref.r_phase)


def test_het_call_host_matches_device():
    from falcon_unzip_tpu.ops.pileup import (het_call_host, het_call_vec,
                                             pileup_host, pileup_scatter)
    rng = np.random.default_rng(5)
    counts = rng.integers(0, 30, size=(4096, 5)).astype(np.int32)
    kw = dict(min_depth=10, min_allele_count=2, allele_freq_min=0.25,
              biallelic_frac=0.8)
    ih_d, b1_d, b2_d = (np.asarray(x) for x in het_call_vec(counts, **kw))
    ih_h, b1_h, b2_h = het_call_host(counts, **kw)
    assert np.array_equal(ih_d, ih_h)
    assert np.array_equal(b1_d, b1_h)
    assert np.array_equal(b2_d, b2_h)
    pos = rng.integers(-5, 1000, size=20000).astype(np.int32)
    base = rng.integers(0, 5, size=20000).astype(np.int32)
    assert np.array_equal(pileup_host(pos, base, 997),
                          np.asarray(pileup_scatter(pos, base, t_len=997)))


def test_windowed_phasing_rejects_degenerate_window():
    """s_win <= max_span would make the window stride non-positive and
    loop forever on the long path (ADVICE r4) — must raise up front."""
    import pytest
    from falcon_unzip_tpu.models.phaser import phase_contigs_batched
    from falcon_unzip_tpu.oracle.phasing import PhasingConfig
    cfg = PhasingConfig()
    with pytest.raises(ValueError, match="must exceed"):
        phase_contigs_batched(None, [], [], cfg, s_win=cfg.max_span)
