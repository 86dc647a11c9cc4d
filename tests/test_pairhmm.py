"""Pair-HMM: banded device forward == full numpy oracle; mutation scoring."""
import numpy as np
import pytest

from falcon_unzip_tpu.oracle import hmm as oh
from falcon_unzip_tpu.ops.pairhmm import PairHMMScorer
from falcon_unzip_tpu.seq import PAD, SeqBatch
from falcon_unzip_tpu.utils.simulate import mutate_read, random_genome


def _batch_of(qs, ts):
    qb = SeqBatch.from_strs(qs)
    tb = SeqBatch.from_strs(ts)
    return qb.data, tb.data, qb.lengths, tb.lengths


def test_forward_matches_oracle():
    rng = np.random.default_rng(0)
    ts = [random_genome(120, s) for s in range(4)]
    qs = [mutate_read(t, e, rng) for t, e in zip(ts, (0.0, 0.05, 0.1, 0.2))]
    scorer = PairHMMScorer(W=64)
    ll = scorer(*_batch_of(qs, ts))
    for k in range(4):
        want = oh.forward_full(qs[k], ts[k])
        assert abs(ll[k] - want) < 1e-3 * max(1, abs(want)), (k, ll[k], want)


def test_true_template_scores_best():
    rng = np.random.default_rng(1)
    truth = random_genome(100, 2)
    reads = [mutate_read(truth, 0.05, rng) for _ in range(8)]
    wrong = truth.copy()
    wrong[50] = (wrong[50] + 1) % 4
    qs, ts, var = [], [], []
    for v, t in ((0, truth), (1, wrong)):
        for r in reads:
            qs.append(r)
            ts.append(t)
            var.append(v)
    scorer = PairHMMScorer(W=64)
    ll = scorer(*_batch_of(qs, ts))
    var = np.array(var)
    assert ll[var == 0].sum() > ll[var == 1].sum()


def test_oracle_polish_fixes_error():
    rng = np.random.default_rng(3)
    truth = random_genome(60, 4)
    reads = [mutate_read(truth, 0.03, rng) for _ in range(10)]
    draft = truth.copy()
    draft[30] = (draft[30] + 2) % 4
    polished = oh.polish_window_oracle(draft, reads, candidate_pos=[30])
    assert np.array_equal(polished, truth)
