"""BAM-lite codec: roundtrip, BGZF framing, partitioner."""
import numpy as np
import pytest

from falcon_unzip_tpu.io import bamlite as bl
from falcon_unzip_tpu.utils.simulate import random_genome


def _mk_bam(n=10, seed=0):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        L = int(rng.integers(50, 200))
        recs.append(bl.BamRecord(
            name=f"read/{i}", flag=0 if i % 2 else 16,
            ref_id=i % 3, pos=int(rng.integers(0, 1000)), mapq=60,
            cigar=[(L, 0)], seq=random_genome(L, seed + i),
            qual=rng.integers(10, 40, size=L).astype(np.uint8)))
    return bl.BamFile(text="@HD\tVN:1.6\n",
                      refs=[("ctg0", 5000), ("ctg1", 4000), ("ctg2", 3000)],
                      records=recs)


def test_bam_roundtrip(tmp_path):
    bam = _mk_bam(20)
    path = str(tmp_path / "t.bam")
    bl.write_bam(path, bam)
    back = bl.read_bam(path)
    assert back.text == bam.text
    assert back.refs == bam.refs
    assert len(back.records) == 20
    for a, b in zip(bam.records, back.records):
        assert a.name == b.name
        assert a.flag == b.flag
        assert a.ref_id == b.ref_id
        assert a.pos == b.pos
        assert a.cigar == b.cigar
        assert np.array_equal(a.seq, b.seq)
        assert np.array_equal(a.qual, b.qual)


def test_bgzf_blocks_large_payload():
    payload = bytes(np.random.default_rng(1).integers(
        0, 256, size=300_000).astype(np.uint8))
    comp = bl.bgzf_compress(payload)
    assert comp.endswith(bl.BGZF_EOF)
    import tempfile, os
    with tempfile.NamedTemporaryFile(delete=False) as fh:
        fh.write(comp)
        p = fh.name
    try:
        assert bl.bgzf_decompress(p) == payload
    finally:
        os.unlink(p)


def test_select_reads_partition(tmp_path):
    bam = _mk_bam(30)
    src = str(tmp_path / "in.bam")
    bl.write_bam(src, bam)
    r2c = {f"read/{i}": i % 2 for i in range(20)}  # reads 20..29 dropped
    outs = bl.select_reads_by_contig(
        src, r2c, str(tmp_path / "ctg_{}.bam"), n_ctg=2)
    assert len(outs) == 2
    total = 0
    for o in outs:
        part = bl.read_bam(o)
        total += len(part.records)
        assert part.refs == bam.refs
    assert total == 20
