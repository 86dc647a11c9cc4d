"""ops.consensus must be byte-equal to the oracle spec on any vote tensor."""
import numpy as np
import pytest

from falcon_unzip_tpu.oracle import consensus as oc
from falcon_unzip_tpu.ops import consensus as opc


def _rand_votes(rng, t_len, D=oc.MAX_DELTA + 1, max_cov=12, p_zero=0.5):
    v = rng.integers(0, max_cov, size=(t_len, D, 5)).astype(np.int32)
    # sparsify: most insertion columns empty, some positions uncovered
    mask = rng.random((t_len, D, 5)) < p_zero
    v[mask] = 0
    v[:, 1:, 4] = 0  # deletion votes only occur at delta 0
    return v


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("min_cov", [1, 3, 6])
@pytest.mark.parametrize("with_template", [True, False])
def test_fast_equals_oracle(seed, min_cov, with_template):
    rng = np.random.default_rng(seed)
    t_len = int(rng.integers(1, 200))
    votes = _rand_votes(rng, t_len)
    tmpl = rng.integers(0, 4, t_len).astype(np.int8) if with_template else None
    ref_c, ref_cov = oc.consensus_from_votes(votes, tmpl, min_cov=min_cov)
    got_c, got_cov = opc.consensus_from_votes(votes, tmpl, min_cov=min_cov)
    np.testing.assert_array_equal(ref_c, got_c)
    np.testing.assert_array_equal(ref_cov, got_cov)


def test_edge_cases():
    # empty tensor
    c, v = opc.consensus_from_votes(np.zeros((0, 9, 5), np.int32))
    assert len(c) == 0 and len(v) == 0
    # all-gap delta-0 winner suppresses the base but not the insertions
    votes = np.zeros((1, 3, 5), np.int32)
    votes[0, 0, 4] = 10          # deletion wins
    votes[0, 1, 2] = 9           # insertion supported by 9/10 > 1/2
    ref = oc.consensus_from_votes(votes, None, min_cov=1)
    got = opc.consensus_from_votes(votes, None, min_cov=1)
    np.testing.assert_array_equal(ref[0], got[0])
    assert list(got[0]) == [2]
    # break semantics: unsupported delta-1 gates a supported delta-2
    votes = np.zeros((1, 3, 5), np.int32)
    votes[0, 0, 1] = 10
    votes[0, 1, 0] = 2           # 2*2 <= 10 -> break
    votes[0, 2, 3] = 9           # would pass, but must NOT be emitted
    ref = oc.consensus_from_votes(votes, None)
    got = opc.consensus_from_votes(votes, None)
    np.testing.assert_array_equal(ref[0], got[0])
    assert list(got[0]) == [1]


def test_device_masks_match_host():
    rng = np.random.default_rng(3)
    votes = _rand_votes(rng, 64)
    tmpl = rng.integers(0, 4, 64).astype(np.int8)
    for t in (tmpl, None):
        e, b, c = opc.consensus_masks_device(votes, t, min_cov=2)
        got = opc.compact_masks(e, b, c)
        ref = oc.consensus_from_votes(votes, t, min_cov=2)
        np.testing.assert_array_equal(ref[0], got[0])
        np.testing.assert_array_equal(ref[1], got[1])


def test_votes_scatter_matches_vote_matrix():
    rng = np.random.default_rng(5)
    tags = rng.integers(0, 40, size=(300, 3)).astype(np.int32)
    tags[:, 1] = rng.integers(0, 10, 300)   # some deltas exceed MAX_DELTA
    tags[:, 2] = rng.integers(0, 5, 300)
    t_len = 32
    ref = oc.vote_matrix([tags], t_len)
    fast = opc.vote_matrix([tags], t_len)
    dev = np.asarray(opc.votes_scatter(tags[:, 0], tags[:, 1], tags[:, 2],
                                       t_len=t_len))
    np.testing.assert_array_equal(ref, fast)
    np.testing.assert_array_equal(ref, dev)
