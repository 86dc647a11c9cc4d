"""Seed-chain-extend aligner on simulated reads: placement + identity."""
import numpy as np

from falcon_unzip_tpu.models.aligner import AlignerConfig, ReadToContigAligner
from falcon_unzip_tpu.oracle import align as oa
from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads


def test_align_clean_reads_exact_placement():
    dip = make_diploid(length=8000, het_rate=0.0, seed=0)
    reads = simulate_reads(dip, coverage=4.0, read_len=1500,
                           error_rate=0.0, seed=1)
    al = ReadToContigAligner([dip.hap0])
    res = al.align_batch(reads.batch)
    assert len(res) >= int(0.9 * len(reads.batch))
    placed = {}
    for a in range(len(res)):
        placed[int(res.read_id[a])] = a
    for rid, a in placed.items():
        assert res.dist[a] == 0
        assert int(res.t_start[a]) == reads.start[rid]
        assert int(res.t_end[a]) == reads.end[rid]


def test_align_noisy_reads():
    dip = make_diploid(length=6000, het_rate=0.0, seed=2)
    reads = simulate_reads(dip, coverage=4.0, read_len=1200,
                           error_rate=0.1, seed=3)
    al = ReadToContigAligner([dip.hap0])
    res = al.align_batch(reads.batch)
    assert len(res) >= int(0.9 * len(reads.batch))
    assert (res.identity() > 0.85).all()
    # placements must be near truth
    for a in range(len(res)):
        rid = int(res.read_id[a])
        assert abs(int(res.t_start[a]) - reads.start[rid]) < 50


def test_align_reverse_strand():
    from falcon_unzip_tpu.seq import SeqBatch, revcomp
    dip = make_diploid(length=4000, het_rate=0.0, seed=4)
    fwd = dip.hap0[1000:2500]
    rc = revcomp(fwd)
    batch = SeqBatch.from_strs([rc], names=["rc_read"])
    al = ReadToContigAligner([dip.hap0])
    res = al.align_batch(batch)
    assert len(res) == 1
    assert int(res.strand[0]) == 1
    assert int(res.dist[0]) == 0
    assert int(res.t_start[0]) == 1000
    assert int(res.t_end[0]) == 2500


def test_tags_reconstruct_read_bases():
    # delta-0 tags at matched positions must equal the contig base when dist=0
    dip = make_diploid(length=3000, het_rate=0.0, seed=5)
    reads = simulate_reads(dip, coverage=2.0, read_len=800,
                           error_rate=0.0, seed=6)
    al = ReadToContigAligner([dip.hap0])
    res = al.align_batch(reads.batch)
    for a in range(min(3, len(res))):
        tags = res.tags[a]
        d0 = tags[tags[:, 1] == 0]
        keep = d0[:, 2] < 4
        assert np.array_equal(d0[keep, 2].astype(np.int8),
                              dip.hap0[d0[keep, 0]])


def test_batched_seeding_matches_per_read_loop():
    """seed_batch fast path == seed_read fallback loop, field for field."""
    import dataclasses
    dip = make_diploid(length=12000, het_rate=0.01, seed=7)
    reads = simulate_reads(dip, coverage=6.0, read_len=1500,
                           error_rate=0.08, seed=8)
    # mix in reverse-strand reads
    from falcon_unzip_tpu.seq import SeqBatch, revcomp
    seqs = [reads.batch.row(i) for i in range(len(reads.batch))]
    seqs = [revcomp(s) if i % 3 == 0 else s for i, s in enumerate(seqs)]
    batch = SeqBatch.from_strs(seqs)
    contigs = [dip.hap0[:7000], dip.hap1[5000:]]
    fast = ReadToContigAligner(contigs).align_batch(batch)

    slow_al = ReadToContigAligner(contigs)
    # max_hits_per_read=2 routes through the per-read seed_read loop; its
    # record set is a SUPERSET of the fast path's single best placement
    # (per (read, ctg, strand) the chain and DP are identical)
    slow_al.cfg = dataclasses.replace(slow_al.cfg, max_hits_per_read=2)
    loop = slow_al.align_batch(batch)

    loop_keys = {}
    for b in range(len(loop)):
        key = (int(loop.read_id[b]), int(loop.ctg[b]), int(loop.strand[b]))
        loop_keys[key] = b
    assert len(fast) > 0
    assert set(int(r) for r in fast.read_id) == \
        set(int(r) for r in loop.read_id)
    for a in range(len(fast)):
        key = (int(fast.read_id[a]), int(fast.ctg[a]), int(fast.strand[a]))
        assert key in loop_keys, key
        b = loop_keys[key]
        assert int(fast.t_start[a]) == int(loop.t_start[b])
        assert int(fast.t_end[a]) == int(loop.t_end[b])
        assert int(fast.dist[a]) == int(loop.dist[b])
        assert np.array_equal(fast.tags[a], loop.tags[b])


def test_host_shard_merge_equivalence():
    """align_batch over read_range shards + AlnSet.merge must reproduce
    the full-batch result exactly (the multi-host gather contract), and
    the to_bytes/from_bytes payload must round-trip."""
    from falcon_unzip_tpu.models.aligner import AlnSet
    dip = make_diploid(length=6000, het_rate=0.01, seed=21)
    reads = simulate_reads(dip, coverage=5.0, read_len=1200,
                           error_rate=0.05, seed=22)
    al = ReadToContigAligner([dip.hap0])
    full = al.align_batch(reads.batch)
    n = len(reads.batch)
    parts = [al.align_batch(reads.batch, read_range=(0, n // 3)),
             al.align_batch(reads.batch, read_range=(n // 3, 2 * n // 3)),
             al.align_batch(reads.batch, read_range=(2 * n // 3, n))]
    parts = [AlnSet.from_bytes(p.to_bytes()) for p in parts]  # round-trip
    merged = AlnSet.merge(parts)
    assert len(merged) == len(full)
    for f in ("read_id", "ctg", "strand", "t_start", "t_end",
              "q_len", "dist"):
        np.testing.assert_array_equal(getattr(merged, f), getattr(full, f))
    for a, b in zip(merged.tags, full.tags):
        np.testing.assert_array_equal(a, b)


def test_chimeric_read_gets_multiple_placements():
    """A junction-spanning (chimeric) read: half from contig A + half from
    contig B.  max_hits_per_read=1 keeps ONE placement; =2 emits both
    halves on their own contigs ([U] blasr emits split/supplementary
    alignments — VERDICT.md missing #7)."""
    import dataclasses

    from falcon_unzip_tpu.utils.simulate import random_genome

    ca = random_genome(5000, 901)
    cb = random_genome(5000, 902)
    chimera = np.concatenate([ca[1000:2500], cb[2000:3500]])
    normal = ca[3000:4600].copy()
    from falcon_unzip_tpu.seq import SeqBatch, decode
    batch = SeqBatch.from_strs([decode(chimera), decode(normal)])

    al = ReadToContigAligner([ca, cb])
    single = al.align_batch(batch)
    al2 = ReadToContigAligner([ca, cb])
    al2.cfg = dataclasses.replace(al2.cfg, max_hits_per_read=2)
    multi = al2.align_batch(batch)

    # read 0: one placement in single-hit mode, both contigs in multi
    s0 = [int(single.ctg[a]) for a in range(len(single))
          if single.read_id[a] == 0]
    m0 = {int(multi.ctg[a]) for a in range(len(multi))
          if multi.read_id[a] == 0}
    assert len(s0) == 1
    assert m0 == {0, 1}, m0
    # each placement covers its own half's interval
    for a in range(len(multi)):
        if int(multi.read_id[a]) != 0:
            continue
        lo, hi = int(multi.t_start[a]), int(multi.t_end[a])
        if int(multi.ctg[a]) == 0:
            assert lo >= 900 and hi <= 2600, (lo, hi)
        else:
            assert lo >= 1900 and hi <= 3600, (lo, hi)
    # the normal read is single-placement in both modes
    m1 = [a for a in range(len(multi)) if int(multi.read_id[a]) == 1]
    assert len(m1) == 1 and int(multi.ctg[m1[0]]) == 0
