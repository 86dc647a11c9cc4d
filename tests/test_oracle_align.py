"""Oracle self-consistency: banded DP == full DP; tags/CIGAR invariants."""
import numpy as np
import pytest

from falcon_unzip_tpu.oracle import align as oa
from falcon_unzip_tpu.seq import encode, decode
from falcon_unzip_tpu.utils.simulate import mutate_read, random_genome


def _pair(n, err, seed):
    rng = np.random.default_rng(seed)
    t = random_genome(n, seed)
    q = mutate_read(t, err, rng)
    return q, t


@pytest.mark.parametrize("n,err,seed", [
    (50, 0.0, 0), (80, 0.1, 1), (200, 0.15, 2), (300, 0.2, 3), (7, 0.3, 4),
])
def test_banded_matches_full(n, err, seed):
    q, t = _pair(n, err, seed)
    D = oa.edit_dp_full(q, t)
    dist, end, bp, lo = oa.banded_dp(q, t, W=128, mode="global")
    assert dist == D[len(q), len(t)]
    moves = oa.traceback_banded(bp, lo, end)
    # moves must reconstruct the pair: #diag+#up == len(q), #diag+#left == len(t)
    assert (moves == 0).sum() + (moves == 1).sum() == len(q)
    assert (moves == 0).sum() + (moves == 2).sum() == len(t)
    # cost of traced path equals dist
    i = j = cost = 0
    for mv in moves:
        if mv == 0:
            cost += 0 if (q[i] == t[j] and q[i] < 4) else 1
            i += 1; j += 1
        elif mv == 1:
            cost += 1; i += 1
        else:
            cost += 1; j += 1
    assert cost == dist


def test_qglocal_free_tail():
    t = random_genome(200, 5)
    q = t[:120].copy()  # query is a prefix: qglocal dist should be 0
    dist, end, bp, lo = oa.banded_dp(q, t, W=128, mode="qglocal")
    assert dist == 0
    assert end == (120, 120)


def test_tags_roundtrip_identity():
    t = encode("ACGTACGTACGT")
    res = oa.align(t, t, W=64)
    assert res["dist"] == 0
    assert res["cigar"] == "12M"
    tags = res["tags"]
    assert np.array_equal(tags[:, 0], np.arange(12))
    assert np.array_equal(tags[:, 2], t)


def test_cigar_indels():
    t = encode("AAAACCCCGGGG")
    q = encode("AAAATCCCCGGG")  # 1 insertion (T) + 1 deletion (last G)
    res = oa.align(q, t, W=64)
    assert res["dist"] == 2
    assert sum(int(x) for x in
               res["cigar"].replace("M", " ").replace("I", " ")
               .replace("D", " ").split()) >= 12


def test_unmatched_lengths_global():
    q, t = _pair(100, 0.1, 7)
    t2 = np.concatenate([t, random_genome(30, 8)])
    D = oa.edit_dp_full(q, t2)
    dist, _, _, _ = oa.banded_dp(q, t2, W=128, mode="global")
    assert dist == D[len(q), len(t2)]
