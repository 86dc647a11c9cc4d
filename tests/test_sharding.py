"""Sharded steps on the 8-device CPU mesh == single-device reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from falcon_unzip_tpu.oracle.phasing import PhasingConfig
from falcon_unzip_tpu.ops.association import association_band_device
from falcon_unzip_tpu.ops.pairhmm import (PairHMMScorer, build_schedule,
                                          params_vector, prepare_batch)
from falcon_unzip_tpu.ops.pileup import het_call_vec, pileup_scatter
from falcon_unzip_tpu.parallel.mesh import make_mesh
from falcon_unzip_tpu.parallel.sharding import (make_phase_step,
                                                make_polish_step)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_mesh_axes(mesh8):
    assert mesh8.axis_names == ("data", "window")
    assert mesh8.devices.size == 8


def test_sharded_phase_step_matches_single(mesh8):
    t_len, s_cap, max_span = 512, 64, 16
    R, T = 32, 160  # depth ~ R*T/t_len = 10 per position
    rng = np.random.default_rng(7)
    # synthesize a biallelic signal: half the reads carry alt alleles
    base_seq = rng.integers(0, 4, size=t_len).astype(np.int32)
    tagpos = np.zeros((R, T), np.int32)
    tagbase = np.zeros((R, T), np.int32)
    snp = rng.choice(t_len, 20, replace=False)
    alt = (base_seq[snp] + 1) % 4
    for r in range(R):
        ps = np.sort(rng.choice(t_len, T, replace=False)).astype(np.int32)
        tagpos[r] = ps
        tagbase[r] = base_seq[ps]
        if r % 2 == 1:
            hit = np.isin(ps, snp)
            tagbase[r][hit] = (base_seq[ps][hit] + 1) % 4
    step = make_phase_step(mesh8, t_len=t_len, s_cap=s_cap,
                           max_span=max_span, min_depth=2)
    counts, is_het, b1, b2, score, cov, M = step(
        jnp.asarray(tagpos), jnp.asarray(tagbase))

    # single-device reference using the ops
    counts_ref = pileup_scatter(tagpos.reshape(-1), tagbase.reshape(-1),
                                t_len=t_len)
    assert np.array_equal(np.asarray(counts), np.asarray(counts_ref))
    is_het_ref, b1_ref, b2_ref = het_call_vec(
        counts_ref, min_depth=2, min_allele_count=2,
        allele_freq_min=0.25, biallelic_frac=0.8)
    assert np.array_equal(np.asarray(is_het), np.asarray(is_het_ref))
    # association matches the unsharded op on the same allele matrix
    score_ref, cov_ref = association_band_device(M, max_span=max_span)
    assert np.array_equal(np.asarray(score), np.asarray(score_ref))
    assert np.array_equal(np.asarray(cov), np.asarray(cov_ref))
    # most injected SNPs detected
    assert np.asarray(is_het)[snp].mean() > 0.8


def test_sharded_polish_matches_single(mesh8):
    W, Lq, Lt = 32, 128, 128
    P_ = 16
    rng = np.random.default_rng(9)
    q = rng.integers(0, 4, size=(P_, Lq)).astype(np.int8)
    t = q.copy()
    nn = np.full(P_, 90, np.int32)
    mm = np.full(P_, 90, np.int32)
    qg, trg, G = prepare_batch(q, t, W)
    _, lo = build_schedule(Lq, Lt, W)
    step = make_polish_step(mesh8, W=W, Lt=Lt, G=G)
    ll = np.asarray(step(jnp.asarray(qg), jnp.asarray(trg), jnp.asarray(nn),
                         jnp.asarray(mm), jnp.asarray(lo),
                         jnp.asarray(params_vector())))
    ll_ref = PairHMMScorer(W=W)(q, t, nn, mm)
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-5)


def test_graft_entry_contract():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn, static_argnames=())(*args) if False else fn(*args)
    assert np.isfinite(np.asarray(out)).all()
    ge.dryrun_multichip(8)


def test_window_sharded_votes_match_host(mesh8):
    """ShardedWindowVotes (device scatter + psum + ppermute halo) must
    reproduce ops.consensus.vote_matrix bit-exactly for every polish
    window, including windows straddling shard boundaries."""
    from falcon_unzip_tpu.ops.consensus import vote_matrix
    from falcon_unzip_tpu.parallel.sharding import ShardedWindowVotes
    rng = np.random.default_rng(0)
    t_len, window, n_tags = 2200, 256, 6000
    pos = rng.integers(0, t_len, n_tags).astype(np.int32)
    delta = rng.integers(0, 4, n_tags).astype(np.int32)
    base = rng.integers(0, 5, n_tags).astype(np.int32)
    tags = np.stack([pos, delta, base], axis=1)

    ops = ShardedWindowVotes(mesh8)
    assert ops.supports(t_len, window)
    blocks, seg = ops.blocks(pos, delta, base, t_len=t_len, window=window)
    ref = vote_matrix([tags], t_len)

    step = window - 64
    lo = 0
    while lo < t_len:
        hi = min(t_len, lo + window)
        s = lo // seg
        got = blocks[s, lo - s * seg : lo - s * seg + (hi - lo)]
        np.testing.assert_array_equal(got, ref[lo:hi], err_msg=f"lo={lo}")
        if hi >= t_len:
            break
        lo += step


def test_polisher_window_sharded_votes_byte_identical(mesh8):
    """Polisher(vote_ops=...) must emit byte-identical consensus + QV to
    the host vote path on a simulated contig."""
    from falcon_unzip_tpu.models.aligner import ReadToContigAligner
    from falcon_unzip_tpu.models.polisher import Polisher, PolisherConfig
    from falcon_unzip_tpu.parallel.sharding import ShardedWindowVotes
    from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads
    dip = make_diploid(length=3000, het_rate=0.0, seed=51)
    reads = simulate_reads(dip, coverage=10.0, read_len=900,
                           error_rate=0.02, seed=52)
    aln = ReadToContigAligner([dip.hap0]).align_batch(reads.batch)
    cfg = PolisherConfig(arrow_rounds=2)
    host = Polisher(cfg).polish_contig("c", dip.hap0, aln, 0)
    dev = Polisher(cfg, vote_ops=ShardedWindowVotes(mesh8)) \
        .polish_contig("c", dip.hap0, aln, 0)
    np.testing.assert_array_equal(host.seq, dev.seq)
    np.testing.assert_array_equal(host.qv, dev.qv)
