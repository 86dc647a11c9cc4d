"""Coverage-statistics overlap filters (falcon fc_ovlp_filter parity)."""
import numpy as np

from falcon_unzip_tpu.models.overlapper import OverlapSet
from falcon_unzip_tpu.models.unzipper import (OvlpFilterConfig,
                                              coverage_filter_mask,
                                              phase_filter_mask)


def _mk_ovl(rows):
    """rows: (a, b, strand, a_s, a_e, b_s, b_e, a_len, b_len, dist)."""
    arr = np.array(rows, np.int32)
    return OverlapSet(
        a_id=arr[:, 0], b_id=arr[:, 1], strand=arr[:, 2].astype(np.int8),
        a_start=arr[:, 3], a_end=arr[:, 4], b_start=arr[:, 5],
        b_end=arr[:, 6], a_len=arr[:, 7], b_len=arr[:, 8], dist=arr[:, 9])


def _dovetail(a, b, L=2000, ov=800, dist=0):
    # suffix of a overlaps prefix of b
    return (a, b, 0, L - ov, L, 0, ov, L, L, dist)


def test_max_cov_drops_repeat_read():
    """Read 0 is a repeat magnet: its end coverage exceeds max_cov, so ALL
    its overlaps drop while the clean pair 10-11 survives
    (VERDICT.md missing #4 done-condition)."""
    rows = [_dovetail(0, b) for b in range(1, 9)]      # 8 overlaps on 0's right
    rows += [(b, 0, 0, 0, 800, 1200, 2000, 2000, 2000, 0)
             for b in range(1, 9)]                     # 8 more on 0's left
    rows.append(_dovetail(10, 11))
    ovl = _mk_ovl(rows)
    cfg = OvlpFilterConfig(min_overlap=500, max_cov=6, max_diff=0,
                           min_cov=0, bestn=0)
    keep = coverage_filter_mask(ovl, cfg)
    involved0 = (ovl.a_id == 0) | (ovl.b_id == 0)
    assert not keep[involved0].any()
    assert keep[~involved0].all()


def test_max_diff_drops_asymmetric_read():
    """A chimeric junction read: many left overlaps, no right ones."""
    rows = [(b, 0, 0, 0, 800, 1200, 2000, 2000, 2000, 0)
            for b in range(1, 7)]                      # 6 on 0's left only
    rows.append(_dovetail(10, 11))
    ovl = _mk_ovl(rows)
    cfg = OvlpFilterConfig(min_overlap=500, max_cov=0, max_diff=4,
                           min_cov=0, bestn=0)
    keep = coverage_filter_mask(ovl, cfg)
    involved0 = (ovl.a_id == 0) | (ovl.b_id == 0)
    assert not keep[involved0].any()
    assert keep[~involved0].all()


def test_min_cov_drops_uncovered_end():
    rows = [_dovetail(0, 1)]      # read 0: right cov 1, left cov 0
    ovl = _mk_ovl(rows)
    assert not coverage_filter_mask(
        ovl, OvlpFilterConfig(min_cov=1, max_cov=0, max_diff=0,
                              bestn=0)).any()
    assert coverage_filter_mask(
        ovl, OvlpFilterConfig(min_cov=0, max_cov=0, max_diff=0,
                              bestn=0)).all()


def test_bestn_keeps_longest():
    """bestn=2 on read 0's right end keeps the 2 longest overlaps; the
    shortest drops (it is also each partner's only overlap, ranked 1st
    for them on their LEFT end — union keeps by partner only if the
    partner's side ranks it, which it does here, so use one-sided
    geometry: partners' left ends are covered, rank 1 each -> to isolate
    bestn on read 0 the partners' bestn must be high)."""
    rows = [_dovetail(0, 1, ov=900), _dovetail(0, 2, ov=800),
            _dovetail(0, 3, ov=700)]
    ovl = _mk_ovl(rows)
    cfg = OvlpFilterConfig(min_overlap=100, max_cov=0, max_diff=0,
                           min_cov=0, bestn=2)
    keep = coverage_filter_mask(ovl, cfg)
    # each partner ranks its own single overlap 1st, so union keeps all
    assert keep.all()
    # now crowd the partners too: bestn must actually cut
    rows = [_dovetail(0, 1, ov=900), _dovetail(0, 2, ov=800),
            _dovetail(0, 3, ov=700),
            _dovetail(4, 1, ov=950), _dovetail(5, 2, ov=950),
            _dovetail(6, 3, ov=950), _dovetail(7, 1, ov=920),
            _dovetail(8, 2, ov=920), _dovetail(9, 3, ov=920)]
    ovl = _mk_ovl(rows)
    keep = coverage_filter_mask(ovl, cfg)
    # read 0 ranks: 900, 800 kept; 700 dropped unless partner 3 keeps it;
    # partner 3's left end sees 950, 920, 700 -> 700 is rank 3 > bestn=2
    assert list(keep[:3]) == [True, True, False]


def test_phase_filter_composes_with_coverage():
    rows = [_dovetail(0, 1), _dovetail(2, 3)]
    ovl = _mk_ovl(rows)
    read_ctg = np.zeros(4, np.int64)
    read_block = np.zeros(4, np.int64)
    read_phase = np.array([0, 1, 0, 0], np.int8)   # 0-1 opposite phases
    cfg = OvlpFilterConfig(min_overlap=100, max_cov=0, max_diff=0,
                           min_cov=0, bestn=0)
    keep = phase_filter_mask(ovl, read_ctg, read_block, read_phase, cfg)
    assert list(keep) == [False, True]


def test_overlap_host_shard_merge_equivalence():
    """compute(a_range) shards + OverlapSet.merge == full compute (the
    multi-host overlap gather contract), including byte round-trip."""
    from falcon_unzip_tpu.models.overlapper import PreadOverlapper
    from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads
    dip = make_diploid(length=5000, het_rate=0.0, seed=31)
    reads = simulate_reads(dip, coverage=6.0, read_len=1400,
                           error_rate=0.0, seed=32)
    ov = PreadOverlapper(reads.batch)
    full = ov.compute()
    n = len(reads.batch)
    parts = [ov.compute(a_range=(0, n // 2)),
             ov.compute(a_range=(n // 2, n))]
    parts = [OverlapSet.from_bytes(p.to_bytes()) for p in parts]
    merged = OverlapSet.merge(parts)
    assert len(merged) == len(full)
    for f in OverlapSet._COLS:
        np.testing.assert_array_equal(getattr(merged, f), getattr(full, f))


def test_overlap_empty_candidate_shard():
    """A shard whose a_range yields zero candidates returns an empty
    OverlapSet instead of crashing (ADVICE r4: np.split on an empty
    order produced one empty group and bq[grp[0]] raised IndexError)."""
    from falcon_unzip_tpu.models.overlapper import PreadOverlapper
    from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads
    dip = make_diploid(length=5000, het_rate=0.0, seed=31)
    reads = simulate_reads(dip, coverage=6.0, read_len=1400,
                           error_rate=0.0, seed=32)
    ov = PreadOverlapper(reads.batch)
    n = len(reads.batch)
    empty = ov.compute(a_range=(n, n))
    assert len(empty) == 0
    # and the empty shard still merges cleanly with a real one
    rest = ov.compute(a_range=(0, n))
    merged = OverlapSet.merge(
        [OverlapSet.from_bytes(p.to_bytes()) for p in (empty, rest)])
    assert len(merged) == len(rest)
