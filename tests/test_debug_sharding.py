"""Sharding-invariant debug mode (SURVEY.md §5 race detection row).

Verifies both directions: (1) the mesh-sharded ops pass their
single-device invariant checks on real inputs, and (2) a seeded
inconsistency — the class of bug the mode exists for — is actually
caught (not silently accepted).
"""
import numpy as np
import pytest

from falcon_unzip_tpu.parallel import debug
from falcon_unzip_tpu.parallel.mesh import make_mesh
from falcon_unzip_tpu.parallel.sharding import (ShardedPairHMMScorer,
                                                ShardedPhaseOps,
                                                ShardedWindowVotes)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


@pytest.fixture()
def debug_mode():
    debug.enable(True)
    yield
    debug.enable(None)


def test_phase_ops_pass_invariants(mesh8, debug_mode):
    rng = np.random.default_rng(0)
    ops = ShardedPhaseOps(mesh8)
    pos = rng.integers(0, 300, 2000).astype(np.int32)
    base = rng.integers(0, 5, 2000).astype(np.int32)
    counts = ops.pileup(pos, base, t_len=300)
    assert counts.sum() == 2000
    M = rng.integers(-1, 2, size=(64, 48)).astype(np.int8)
    ops.association(M, max_span=8)          # raises on violation


def test_scorer_and_votes_pass_invariants(mesh8, debug_mode):
    rng = np.random.default_rng(1)
    s = ShardedPairHMMScorer(mesh8, W=16)
    q = rng.integers(0, 4, size=(5, 64)).astype(np.int8)
    t = rng.integers(0, 4, size=(5, 64)).astype(np.int8)
    n = np.full(5, 60, np.int32)
    m = np.full(5, 62, np.int32)
    ll = s(q, t, n, m)
    assert np.isfinite(ll).all()
    v = ShardedWindowVotes(mesh8)
    pos = rng.integers(0, 1024, 500).astype(np.int32)
    delta = rng.integers(0, 3, 500).astype(np.int32)
    base = rng.integers(0, 5, 500).astype(np.int32)
    v.blocks(pos, delta, base, t_len=1024, window=128)


def test_seeded_inconsistency_is_caught(mesh8, debug_mode, monkeypatch):
    """Corrupt the sharded pileup program's result (a stand-in for a
    wrong-spec / stale-cache bug): the invariant check must fire."""
    ops = ShardedPhaseOps(mesh8)
    real = ops._pileup_fn(100)

    def corrupted(pos, base):
        out = np.asarray(real(pos, base)).copy()
        out[3, 2] += 1          # one shard "lost" / double-counted a vote
        return out

    monkeypatch.setitem(ops._pileup_cache, 100, corrupted)
    pos = np.arange(100, dtype=np.int32)
    base = np.zeros(100, np.int32)
    with pytest.raises(debug.ShardingInvariantError, match="pileup"):
        ops.pileup(pos, base, t_len=100)


def test_disabled_mode_skips_checks(mesh8, monkeypatch):
    debug.enable(False)
    try:
        ops = ShardedPhaseOps(mesh8)
        real = ops._pileup_fn(50)
        monkeypatch.setitem(
            ops._pileup_cache, 50,
            lambda p, b: np.asarray(real(p, b)) + 1)   # corrupt, unchecked
        out = ops.pileup(np.zeros(10, np.int32), np.zeros(10, np.int32),
                         t_len=50)
        assert out is not None   # no invariant error when mode is off
    finally:
        debug.enable(None)
