"""Unified ingest: FASTA/FASTQ/BAM/FOFN -> SeqBatch; BAM-driven polish."""
import os

import numpy as np

from falcon_unzip_tpu.io import bamlite as bl
from falcon_unzip_tpu.io.fasta import write_fasta
from falcon_unzip_tpu.io.ingest import concat_batches, read_seqs
from falcon_unzip_tpu.seq import SeqBatch, revcomp
from falcon_unzip_tpu.utils.simulate import (make_diploid, random_genome,
                                             simulate_reads)


def test_read_seqs_fasta_and_fofn(tmp_path):
    seqs = [random_genome(120, s) for s in range(3)]
    fa1 = str(tmp_path / "a.fa")
    fa2 = str(tmp_path / "b.fa")
    from falcon_unzip_tpu.seq import decode
    write_fasta(fa1, ((f"a{i}", decode(s)) for i, s in enumerate(seqs[:2])))
    write_fasta(fa2, [("b0", decode(seqs[2]))])
    fofn = str(tmp_path / "in.fofn")
    with open(fofn, "w") as fh:
        fh.write("a.fa\n#comment\nb.fa\n")        # relative + comment
    batch = read_seqs(fofn)
    assert len(batch) == 3
    assert batch.names == ["a0", "a1", "b0"]
    for i, s in enumerate(seqs):
        assert np.array_equal(batch.row(i), s)


def test_read_seqs_bam_unflips_reverse(tmp_path):
    fwd = random_genome(90, 1)
    rev_read = random_genome(70, 2)
    recs = [
        bl.BamRecord(name="f", flag=0, ref_id=0, pos=10, mapq=60,
                     cigar=[(90, 0)], seq=fwd,
                     qual=np.full(90, 30, np.uint8)),
        # stored in reference orientation; original read = revcomp
        bl.BamRecord(name="r", flag=16, ref_id=0, pos=50, mapq=60,
                     cigar=[(70, 0)], seq=revcomp(rev_read),
                     qual=np.full(70, 30, np.uint8)),
    ]
    path = str(tmp_path / "x.bam")
    bl.write_bam(path, bl.BamFile(text="@HD\tVN:1.6\n",
                                  refs=[("c0", 500)], records=recs))
    batch = read_seqs(path)
    assert batch.names == ["f", "r"]
    assert np.array_equal(batch.row(0), fwd)
    assert np.array_equal(batch.row(1), rev_read)


def test_concat_batches_empty_and_single():
    b = SeqBatch.from_strs([random_genome(10, 0)], names=["x"])
    assert concat_batches([]).data.shape[0] == 0
    assert concat_batches([b]) is b


def test_quiver_from_bam_fofn_matches_fasta(tmp_path):
    """Polish driven by raw-subread BAMs == polish driven by FASTA."""
    from falcon_unzip_tpu.config import PipelineConfig
    from falcon_unzip_tpu.pipeline.quiver import run_quiver
    from falcon_unzip_tpu.pipeline.unzip import run_unzip
    from falcon_unzip_tpu.seq import decode

    d = str(tmp_path)
    dip = make_diploid(length=6000, het_rate=0.02, seed=31,
                       het_span=(0.3, 0.7))
    pr = simulate_reads(dip, coverage=14.0, read_len=1800,
                        error_rate=0.0, seed=32)
    raw = simulate_reads(dip, coverage=16.0, read_len=1400,
                         error_rate=0.03, seed=33)
    write_fasta(f"{d}/preads.fa",
                ((pr.batch.names[i], pr.batch.to_str(i))
                 for i in range(len(pr.batch))))
    write_fasta(f"{d}/raw.fa",
                ((raw.batch.names[i], raw.batch.to_str(i))
                 for i in range(len(raw.batch))))
    write_fasta(f"{d}/draft.fa", [("d0", decode(dip.hap0))])

    # split raw reads across two unaligned BAMs + a fofn
    n = len(raw.batch)
    half = n // 2
    for part, lo, hi in (("p1", 0, half), ("p2", half, n)):
        recs = [bl.BamRecord(
            name=raw.batch.names[i], flag=4, ref_id=-1, pos=-1, mapq=255,
            cigar=[], seq=raw.batch.row(i),
            qual=np.full(int(raw.batch.lengths[i]), 30, np.uint8))
            for i in range(lo, hi)]
        bl.write_bam(f"{d}/{part}.bam",
                     bl.BamFile(text="@HD\tVN:1.6\n", refs=[],
                                records=recs))
    with open(f"{d}/raw.fofn", "w") as fh:
        fh.write("p1.bam\np2.bam\n")

    cfg_fa = PipelineConfig(preads=f"{d}/preads.fa", reads=f"{d}/raw.fa",
                            draft=f"{d}/draft.fa", out_dir=f"{d}/out_fa")
    run_unzip(cfg_fa)
    run_quiver(cfg_fa)

    cfg_bam = PipelineConfig(preads=f"{d}/preads.fa",
                             reads=f"{d}/raw.fofn",
                             draft=f"{d}/draft.fa", out_dir=f"{d}/out_bam")
    run_unzip(cfg_bam)
    run_quiver(cfg_bam)

    for rel in ("4-polish/cns_p_ctg.fasta", "4-polish/cns_h_ctg.fasta"):
        a = open(os.path.join(f"{d}/out_fa", rel)).read()
        b = open(os.path.join(f"{d}/out_bam", rel)).read()
        assert a == b, f"{rel} differs between FASTA and BAM-fofn ingest"
