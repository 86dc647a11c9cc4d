"""Haplotig placement by re-alignment (SURVEY.md §3.3 step 3)."""
import numpy as np

from falcon_unzip_tpu.models.unzipper import Haplotig, place_haplotigs
from falcon_unzip_tpu.utils.simulate import make_diploid


def test_placement_matches_truth():
    """A haplotig cut from hap1's bubble region must align back to its
    primary (hap0) within a small fuzz of the true bubble interval."""
    dip = make_diploid(length=20000, het_rate=0.015, seed=11,
                       het_span=(0.35, 0.65))
    lo, hi = 7000, 13000          # true placement interval (covers bubble)
    h = Haplotig(name="000000F_001", seq=dip.hap1[lo:hi].copy(),
                 primary="000000F", p_start=0, p_end=0, reads=[], phase=1)
    p_ctg = [("000000F", dip.hap0, [])]
    m4 = place_haplotigs(p_ctg, [h])
    assert len(m4) == 1
    assert m4[0].q_name == "000000F_001"
    assert m4[0].t_name == "000000F"
    fuzz = 64
    assert abs(h.p_start - lo) <= fuzz, (h.p_start, lo)
    assert abs(h.p_end - hi) <= fuzz, (h.p_end, hi)
    assert m4[0].t_start == h.p_start and m4[0].t_end == h.p_end
    assert m4[0].identity > 90.0


def test_placement_reverse_strand_haplotig():
    from falcon_unzip_tpu.seq import revcomp
    dip = make_diploid(length=15000, het_rate=0.01, seed=12,
                       het_span=(0.3, 0.7))
    lo, hi = 5000, 10000
    h = Haplotig(name="h", seq=revcomp(dip.hap1[lo:hi]).copy(),
                 primary="p", p_start=0, p_end=0, reads=[], phase=1)
    m4 = place_haplotigs([("p", dip.hap0, [])], [h])
    assert len(m4) == 1
    assert m4[0].t_strand == 1
    assert abs(h.p_start - lo) <= 64 and abs(h.p_end - hi) <= 64


def test_unaligned_haplotig_keeps_walk_estimate():
    rng = np.random.default_rng(0)
    p_seq = rng.integers(0, 4, 5000).astype(np.int8)
    alien = rng.integers(0, 4, 2000).astype(np.int8)  # unrelated sequence
    h = Haplotig(name="h", seq=alien, primary="p",
                 p_start=111, p_end=222, reads=[], phase=0)
    m4 = place_haplotigs([("p", p_seq, [])], [h])
    assert m4 == [] or all(r.q_name != "h" for r in m4)
    assert (h.p_start, h.p_end) == (111, 222)


def test_long_haplotig_chunked_placement():
    """30kb haplotig on a 60kb primary: placement must come from the
    chunk-sampled path (a whole-contig traceback DP OOMs on device) and
    still land within seed fuzz of the true interval."""
    dip = make_diploid(length=60000, het_rate=0.01, seed=21,
                       het_span=(0.2, 0.8))
    lo, hi = 15000, 45000
    h = Haplotig(name="h", seq=dip.hap1[lo:hi].copy(), primary="p",
                 p_start=0, p_end=0, reads=[], phase=1)
    m4 = place_haplotigs([("p", dip.hap0, [])], [h])
    assert len(m4) == 1
    assert abs(h.p_start - lo) <= 128 and abs(h.p_end - hi) <= 128
    assert m4[0].identity > 95.0
