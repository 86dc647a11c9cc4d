"""Alpha/beta-spliced Arrow mutation scoring == full re-forward.

The splice identity (oracle.hmm.forward_backward_full + splice_scores)
is the ConsensusCore2 trick ([U] variantCaller --algorithm=arrow,
SURVEY.md §3.4): score a point mutation from cached forward/backward
matrices in O(n) instead of a full O(n*m) forward per variant.
"""
import numpy as np
import pytest

from falcon_unzip_tpu.oracle import hmm as oh
from falcon_unzip_tpu.utils.simulate import mutate_read, random_genome


def _check_all_mutations(q, t, params=None, tol=2e-3):
    fb = oh.forward_backward_full(q, t, params)
    ll_cur = oh.forward_full(q, t, params)
    # backward at origin is the full loglik
    assert abs(fb[1][0][0, 0] - ll_cur) < tol * max(1.0, abs(ll_cur))
    m = len(t)
    for p in range(m):
        got = oh.splice_scores(q, t, fb, p, params)
        # identity substitution == unmutated loglik (built-in check)
        assert abs(got[int(t[p])] - ll_cur) < tol * max(1.0, abs(ll_cur)), p
        for b in range(4):
            if b != t[p]:
                v = t.copy()
                v[p] = b
                want = oh.forward_full(q, v, params)
                assert abs(got[b] - want) < tol * max(1.0, abs(want)), \
                    ("sub", p, b, got[b], want)
            v = np.insert(t, p, b)
            want = oh.forward_full(q, v, params)
            assert abs(got[4 + b] - want) < tol * max(1.0, abs(want)), \
                ("ins", p, b, got[4 + b], want)
        v = np.delete(t, p)
        want = oh.forward_full(q, v, params)
        assert abs(got[8] - want) < tol * max(1.0, abs(want)), \
            ("del", p, got[8], want)


def test_splice_matches_full_reforward():
    rng = np.random.default_rng(7)
    t = random_genome(24, 1)
    q = mutate_read(t, 0.1, rng)
    _check_all_mutations(q, t)


def test_splice_exact_read():
    t = random_genome(16, 3)
    _check_all_mutations(t.copy(), t)


def test_splice_short_and_skewed():
    rng = np.random.default_rng(11)
    t = random_genome(12, 5)
    q = mutate_read(t, 0.3, rng)      # heavy error: bands of paths differ
    _check_all_mutations(q, t)
    # read much shorter / longer than template
    _check_all_mutations(q[:6].copy(), t)
    q2 = np.concatenate([q, mutate_read(t, 0.2, rng)[:8]])
    _check_all_mutations(q2, t)


def test_device_splicer_matches_oracle():
    from falcon_unzip_tpu.ops.arrow import ArrowSplicer

    rng = np.random.default_rng(21)
    qs, ts, cands, params = [], [], [], oh.HMMParams()
    for s in range(6):
        t = random_genome(30 + 7 * s, 100 + s)
        q = mutate_read(t, (0.0, 0.05, 0.1, 0.2, 0.3, 0.15)[s], rng)
        qs.append(q)
        ts.append(t)
        cands.append([0, 3, len(t) // 2, len(t) - 1][: (s % 4) + 1])
    sp = ArrowSplicer(max_cand=4, chunk=8)
    ll_cur, ll_mut = sp(qs, ts, cands)
    for k in range(len(qs)):
        want_cur = oh.forward_full(qs[k], ts[k], params)
        assert abs(ll_cur[k] - want_cur) < 2e-3 * max(1, abs(want_cur)), k
        fb = oh.forward_backward_full(qs[k], ts[k], params)
        for ci, p in enumerate(cands[k]):
            want = oh.splice_scores(qs[k], ts[k], fb, p, params)
            got = ll_mut[k, ci]
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3,
                                       err_msg=f"pair {k} cand {p}")
        # padded candidate slots are NEG
        for ci in range(len(cands[k]), 4):
            assert (ll_mut[k, ci] < -1e29).all()


def test_device_splicer_per_pair_params():
    from falcon_unzip_tpu.ops.arrow import ArrowSplicer
    from falcon_unzip_tpu.ops.pairhmm import params_vector

    rng = np.random.default_rng(23)
    t = random_genome(40, 200)
    q0 = mutate_read(t, 0.05, rng)
    q1 = mutate_read(t, 0.25, rng)
    pa = oh.HMMParams(e_sub=0.01)
    pb = oh.HMMParams(e_sub=0.15)
    pvecs = np.stack([params_vector(pa), params_vector(pb)])
    sp = ArrowSplicer(max_cand=2, chunk=4)
    ll_cur, ll_mut = sp([q0, q1], [t, t], [[5], [5]], pvecs=pvecs)
    for k, (q, prm) in enumerate(((q0, pa), (q1, pb))):
        want = oh.forward_full(q, t, prm)
        assert abs(ll_cur[k] - want) < 2e-3 * max(1, abs(want))
        fb = oh.forward_backward_full(q, t, prm)
        np.testing.assert_allclose(
            ll_mut[k, 0], oh.splice_scores(q, t, fb, 5, prm),
            rtol=2e-3, atol=2e-3)


def test_splice_nondefault_params():
    rng = np.random.default_rng(13)
    t = random_genome(18, 9)
    q = mutate_read(t, 0.15, rng)
    params = oh.HMMParams(e_sub=0.08, p_ins=0.12, p_del=0.03,
                          eps_ins=0.4, eps_del=0.1)
    _check_all_mutations(q, t, params)


# ---- per-BASE quality tiers (real Arrow's IQV/DQV conditioning, ----
# ---- SURVEY.md §2b variantCaller row) ------------------------------

def _tier_table():
    from falcon_unzip_tpu.ops.pairhmm import params_vector
    return np.stack([
        params_vector(oh.HMMParams(e_sub=0.01, p_ins=0.02, p_del=0.02)),
        params_vector(oh.HMMParams(e_sub=0.08, p_ins=0.10, p_del=0.08,
                                   eps_ins=0.35)),
        params_vector(oh.HMMParams(e_sub=0.20, p_ins=0.18, p_del=0.15,
                                   eps_ins=0.45, eps_del=0.3)),
    ])


def _check_all_mutations_pb(q, t, pb, tol=2e-3):
    """Per-base oracle: splice == full re-forward with the SAME pb."""
    fb = oh.forward_backward_full_pb(q, t, pb)
    ll_cur = oh.forward_full_pb(q, t, pb)
    assert abs(fb[1][0][0, 0] - ll_cur) < tol * max(1.0, abs(ll_cur))
    for p in range(len(t)):
        got = oh.splice_scores_pb(q, t, fb, p, pb)
        assert abs(got[int(t[p])] - ll_cur) < tol * max(1.0, abs(ll_cur))
        for b in range(4):
            if b != t[p]:
                v = t.copy()
                v[p] = b
                want = oh.forward_full_pb(q, v, pb)
                assert abs(got[b] - want) < tol * max(1.0, abs(want)), \
                    ("sub", p, b)
            v = np.insert(t, p, b)
            want = oh.forward_full_pb(q, v, pb)
            assert abs(got[4 + b] - want) < tol * max(1.0, abs(want)), \
                ("ins", p, b)
        v = np.delete(t, p)
        want = oh.forward_full_pb(q, v, pb)
        assert abs(got[8] - want) < tol * max(1.0, abs(want)), ("del", p)


def test_oracle_per_base_splice_identity():
    rng = np.random.default_rng(31)
    tiers = _tier_table()
    t = random_genome(20, 41)
    q = mutate_read(t, 0.15, rng)
    tier_ids = rng.integers(0, 3, len(q))
    _check_all_mutations_pb(q, t, tiers[tier_ids])


def test_oracle_per_base_uniform_matches_scalar():
    # all bases on one tier == the per-pair scalar path
    rng = np.random.default_rng(33)
    t = random_genome(25, 43)
    q = mutate_read(t, 0.1, rng)
    prm = oh.HMMParams(e_sub=0.08, p_ins=0.10, p_del=0.08, eps_ins=0.35)
    from falcon_unzip_tpu.ops.pairhmm import params_vector
    pb = np.tile(params_vector(prm), (len(q), 1))
    want = oh.forward_full(q, t, prm)
    got = oh.forward_full_pb(q, t, pb)
    assert abs(got - want) < 1e-3 * max(1, abs(want))
    fb_s = oh.forward_backward_full(q, t, prm)
    fb_p = oh.forward_backward_full_pb(q, t, pb)
    for a, b in zip(fb_s, fb_p):
        for ma, mb in zip(a, b):
            np.testing.assert_allclose(
                np.where(ma < -1e29, 0, ma), np.where(mb < -1e29, 0, mb),
                rtol=1e-4, atol=1e-3)


def test_device_splicer_per_base_tiers():
    from falcon_unzip_tpu.ops.arrow import ArrowSplicer

    rng = np.random.default_rng(37)
    tiers = _tier_table()
    qs, ts, cands, qtiers = [], [], [], []
    for s in range(5):
        t = random_genome(28 + 5 * s, 300 + s)
        q = mutate_read(t, (0.02, 0.1, 0.2, 0.05, 0.3)[s], rng)
        qs.append(q)
        ts.append(t)
        cands.append([0, len(t) // 3, len(t) - 1][: (s % 3) + 1])
        qtiers.append(rng.integers(0, 3, len(q)).astype(np.int8))
    sp = ArrowSplicer(max_cand=3, chunk=8, tier_params=tiers)
    ll_cur, ll_mut = sp(qs, ts, cands, qtiers=qtiers)
    for k in range(len(qs)):
        pb = tiers[qtiers[k].astype(np.int64)]
        want_cur = oh.forward_full_pb(qs[k], ts[k], pb)
        assert abs(ll_cur[k] - want_cur) < 2e-3 * max(1, abs(want_cur)), k
        fb = oh.forward_backward_full_pb(qs[k], ts[k], pb)
        for ci, p in enumerate(cands[k]):
            want = oh.splice_scores_pb(qs[k], ts[k], fb, p, pb)
            np.testing.assert_allclose(
                ll_mut[k, ci], want, rtol=2e-3, atol=2e-3,
                err_msg=f"pair {k} cand {p}")


def test_device_splicer_tiers_uniform_matches_pvec():
    # a constant tier track must reproduce the per-pair pvec path
    from falcon_unzip_tpu.ops.arrow import ArrowSplicer
    from falcon_unzip_tpu.ops.pairhmm import params_vector

    rng = np.random.default_rng(39)
    tiers = _tier_table()
    t = random_genome(40, 400)
    q = mutate_read(t, 0.1, rng)
    prm_mid = oh.HMMParams(e_sub=0.08, p_ins=0.10, p_del=0.08,
                           eps_ins=0.35)
    sp_t = ArrowSplicer(max_cand=2, chunk=4, tier_params=tiers)
    cur_t, mut_t = sp_t([q], [t], [[7, 20]],
                        qtiers=[np.ones(len(q), np.int8)])
    sp_p = ArrowSplicer(max_cand=2, chunk=4)
    cur_p, mut_p = sp_p([q], [t], [[7, 20]],
                        pvecs=params_vector(prm_mid)[None])
    np.testing.assert_allclose(cur_t, cur_p, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(mut_t, mut_p, rtol=1e-4, atol=1e-3)
