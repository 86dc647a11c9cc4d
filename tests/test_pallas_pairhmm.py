"""Pallas pair-HMM kernel (interpret mode on CPU) == numpy oracle."""
import numpy as np

from falcon_unzip_tpu.oracle import hmm as oh
from falcon_unzip_tpu.ops.pallas_pairhmm import PallasPairHMMScorer
from falcon_unzip_tpu.seq import SeqBatch
from falcon_unzip_tpu.utils.simulate import mutate_read, random_genome


def test_pallas_forward_matches_oracle_interpret():
    rng = np.random.default_rng(0)
    ts = [random_genome(100, s) for s in range(8)]
    qs = [mutate_read(t, e, rng)
          for t, e in zip(ts, (0.0, 0.05, 0.1, 0.2) * 2)]
    qb = SeqBatch.from_strs(qs)
    tb = SeqBatch.from_strs(ts)
    sc = PallasPairHMMScorer(W=64, PB=8, interpret=True)
    ll = sc(qb.data, tb.data, qb.lengths, tb.lengths)
    for k in range(8):
        want = oh.forward_full(qs[k], ts[k])
        assert abs(ll[k] - want) < 1e-3 * max(1, abs(want)), (k, ll[k], want)


def test_pallas_pads_ragged_batch():
    rng = np.random.default_rng(1)
    ts = [random_genome(80, s + 10) for s in range(3)]  # P=3 not % PB
    qs = [mutate_read(t, 0.05, rng) for t in ts]
    qb = SeqBatch.from_strs(qs)
    tb = SeqBatch.from_strs(ts)
    sc = PallasPairHMMScorer(W=64, PB=8, interpret=True)
    ll = sc(qb.data, tb.data, qb.lengths, tb.lengths)
    assert len(ll) == 3
    for k in range(3):
        want = oh.forward_full(qs[k], ts[k])
        assert abs(ll[k] - want) < 1e-3 * max(1, abs(want))
