"""Device banded aligner == numpy oracle (distances, moves, tags)."""
import numpy as np
import pytest

from falcon_unzip_tpu.ops import banded_align as ba
from falcon_unzip_tpu.oracle import align as oa
from falcon_unzip_tpu.seq import PAD, SeqBatch
from falcon_unzip_tpu.utils.simulate import mutate_read, random_genome


def _batch(n_pairs, tlen, err, seed):
    rng = np.random.default_rng(seed)
    ts, qs = [], []
    for k in range(n_pairs):
        t = random_genome(tlen + int(rng.integers(0, 40)), seed * 100 + k)
        q = mutate_read(t, err, rng)
        ts.append(t)
        qs.append(q)
    qb = SeqBatch.from_strs(qs)
    tb = SeqBatch.from_strs(ts)
    return qb, tb, qs, ts


@pytest.mark.parametrize("err", [0.0, 0.1, 0.2])
def test_batch_matches_oracle_global(err):
    qb, tb, qs, ts = _batch(6, 180, err, 3)
    aligner = ba.BandedAligner(W=128, mode="global")
    res = aligner(qb.data, tb.data, qb.lengths, tb.lengths)
    for k in range(6):
        dist_o, end_o, bp_o, lo_o = oa.banded_dp(qs[k], ts[k], 128, "global")
        assert int(res["dist"][k]) == dist_o, k
        moves_o = oa.traceback_banded(bp_o, lo_o, end_o)
        assert np.array_equal(res["moves"][k], moves_o), k
        tags_dev = ba.moves_to_tags_vec(qs[k], res["moves"][k])
        tags_o = oa.moves_to_tags(qs[k], moves_o)
        assert np.array_equal(tags_dev, tags_o), k


def test_batch_qglocal():
    # queries that are noisy prefixes of targets: free tail
    rng = np.random.default_rng(0)
    ts = [random_genome(300, s) for s in range(4)]
    qs = [mutate_read(t[:200], 0.05, rng) for t in ts]
    qb = SeqBatch.from_strs(qs)
    tb = SeqBatch.from_strs(ts)
    aligner = ba.BandedAligner(W=128, mode="qglocal")
    res = aligner(qb.data, tb.data, qb.lengths, tb.lengths)
    for k in range(4):
        dist_o, end_o, bp_o, lo_o = oa.banded_dp(qs[k], ts[k], 128, "qglocal")
        assert int(res["dist"][k]) == dist_o
        assert int(res["end_j"][k]) == end_o[1]


def test_tags_vec_matches_oracle_loop():
    rng = np.random.default_rng(9)
    t = random_genome(150, 9)
    q = mutate_read(t, 0.25, rng)
    res = oa.align(q, t, W=128)
    tags_vec = ba.moves_to_tags_vec(q, res["moves"])
    assert np.array_equal(tags_vec, res["tags"])
