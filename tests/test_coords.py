"""Coordinate toolkit: CIGAR <-> align-tags inverses, m4, tiling paths."""
import numpy as np
import pytest

from falcon_unzip_tpu import coords as C
from falcon_unzip_tpu.io import bamlite as bl
from falcon_unzip_tpu.oracle.align import GAP, banded_dp
from falcon_unzip_tpu.utils.simulate import mutate_read, random_genome


def test_cigar_parse_format_roundtrip():
    s = "5S12M3I4D7M2X1=10H"
    cig = C.parse_cigar(s)
    assert C.format_cigar(cig) == s
    assert C.parse_cigar("*") == []
    q, t = C.cigar_spans(cig)
    assert q == 5 + 12 + 3 + 7 + 2 + 1
    assert t == 12 + 4 + 7 + 2 + 1
    assert C.clip_lengths(cig) == (5, 10)


def _random_alignment(seed, L=300):
    """Oracle-align a mutated copy; return (q, tags, cigar, t_start)."""
    t = random_genome(L, seed)
    q = mutate_read(t, 0.08, np.random.default_rng(seed + 1))
    from falcon_unzip_tpu.ops.banded_align import moves_to_tags_vec
    from falcon_unzip_tpu.oracle.align import traceback_banded
    _, end, bp, lo = banded_dp(q, t, W=64, mode="global")
    moves = traceback_banded(bp, lo, end)
    tags = moves_to_tags_vec(q, moves, t_offset=17)
    return q, tags


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tags_cigar_inverse(seed):
    q, tags = _random_alignment(seed)
    cigar, t_start = C.tags_to_cigar(tags)
    assert t_start == 17
    # query recovered from tags == aligned query bases
    qa = C.tags_query(tags)
    assert np.array_equal(qa, q)
    # CIGAR spans match tag counts
    q_span, t_span = C.cigar_spans(cigar)
    assert q_span == len(qa)
    assert t_span == int(np.sum(tags[:, 2] == GAP) +
                         np.sum((tags[:, 1] == 0) & (tags[:, 2] != GAP)))
    # and converting back gives identical tags
    tags2 = C.cigar_to_tags(cigar, qa, t_start)
    assert np.array_equal(tags, tags2)


def test_cigar_to_tags_skips_softclip():
    q = random_genome(30, 3)
    cigar = [(5, 4), (20, 0), (5, 4)]        # 5S 20M 5S
    tags = C.cigar_to_tags(cigar, q, t_start=100)
    assert len(tags) == 20
    assert np.array_equal(tags[:, 2], q[5:25])
    assert tags[0, 0] == 100 and tags[-1, 0] == 119


def test_ref_to_query_map():
    cigar = C.parse_cigar("2M2D2M2I2M")
    t_pos, q_off = C.ref_to_query(cigar, t_start=10)
    assert list(t_pos) == [10, 11, 12, 13, 14, 15, 16, 17]
    assert list(q_off) == [0, 1, 2, 2, 2, 3, 6, 7]


def _mk_record(seed=5):
    L = 80
    seq = random_genome(L, seed)
    return bl.BamRecord(name="r0", flag=16, ref_id=1, pos=200, mapq=60,
                        cigar=[(10, 4), (30, 0), (2, 1), (3, 2), (38, 0)],
                        seq=seq,
                        qual=np.full(L, 30, np.uint8))


def test_sam_to_m4():
    rec = _mk_record()
    m4 = C.sam_to_m4(rec, refs=[("c0", 500), ("c1", 900)])
    assert m4.t_name == "c1" and m4.t_strand == 1
    assert m4.t_start == 200 and m4.t_end == 200 + 30 + 3 + 38
    assert m4.q_start == 10 and m4.q_end == 80 and m4.q_len == 80
    assert 0 < m4.identity <= 100
    unmapped = bl.BamRecord(name="u", flag=4, ref_id=-1, pos=-1, mapq=0,
                            cigar=[], seq=np.zeros(0, np.int8),
                            qual=np.zeros(0, np.uint8))
    assert C.sam_to_m4(unmapped, refs=[]) is None


def test_m4_file_roundtrip(tmp_path):
    rec = _mk_record()
    m4 = C.sam_to_m4(rec, refs=[("c0", 500), ("c1", 900)])
    p = str(tmp_path / "a.m4")
    C.write_m4(p, [m4])
    back = C.read_m4(p)
    assert len(back) == 1
    b = back[0]
    assert (b.q_name, b.t_name, b.t_start, b.t_end) == \
        (m4.q_name, m4.t_name, m4.t_start, m4.t_end)
    assert b.identity == pytest.approx(m4.identity, abs=0.01)


def test_bam_to_alnset_feeds_pileup(tmp_path):
    # a BAM'd alignment must produce the same tags as the in-process path
    t = random_genome(200, 9)
    q = mutate_read(t, 0.05, np.random.default_rng(10))
    from falcon_unzip_tpu.ops.banded_align import moves_to_tags_vec
    from falcon_unzip_tpu.oracle.align import traceback_banded
    _, end, bp, lo = banded_dp(q, t, W=64, mode="global")
    moves = traceback_banded(bp, lo, end)
    tags = moves_to_tags_vec(q, moves, t_offset=0)
    cigar, t_start = C.tags_to_cigar(tags)
    rec = bl.BamRecord(name="r", flag=0, ref_id=0, pos=t_start, mapq=60,
                       cigar=cigar, seq=C.tags_query(tags),
                       qual=np.full(len(q), 30, np.uint8))
    bam = bl.BamFile(text="@HD\tVN:1.6\n", refs=[("c0", 200)],
                     records=[rec])
    path = str(tmp_path / "x.bam")
    bl.write_bam(path, bam)
    aln = C.bam_to_alnset(bl.read_bam(path))
    assert len(aln) == 1
    assert np.array_equal(aln.tags[0], tags)
    assert aln.t_start[0] == 0 and aln.t_end[0] == 200


def test_tiling_path_coords():
    tp = C.TilingPath(edges=[C.TilingEdge(0, 1, 100),
                             C.TilingEdge(1, 2, 50),
                             C.TilingEdge(2, 3, 75)])
    assert tp.total == 225
    assert list(tp.coords) == [0, 100, 150]
    assert tp.edge_at(0) == 0 and tp.edge_at(99) == 0
    assert tp.edge_at(100) == 1 and tp.edge_at(224) == 2
    with pytest.raises(IndexError):
        tp.edge_at(225)
    sub = tp.subpath(60, 160)
    assert [e.v for e in sub.edges] == [0, 1, 2]
    sub2 = tp.subpath(100, 150)
    assert [e.v for e in sub2.edges] == [1]
