"""Collectives on the 8-device CPU mesh: regroup + halo exchange."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from falcon_unzip_tpu.io.overlaps import read_overlaps, write_overlaps
from falcon_unzip_tpu.parallel.collectives import (make_halo_exchange,
                                                   make_regroup)
from falcon_unzip_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


def test_all_to_all_regroup(mesh8):
    n_dev, cap, feat = 8, 16, 4
    R = 64  # 8 rows per shard
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 1000, size=(R, feat)).astype(np.int32)
    owner = rng.integers(-1, n_dev, size=(R,)).astype(np.int32)
    fn = make_regroup(mesh8, cap=cap, feat=feat)
    recv, counts, dropped = fn(jnp.asarray(payload), jnp.asarray(owner))
    recv = np.asarray(recv)        # (n_dev * n_dev, cap, feat) global view
    counts = np.asarray(counts)
    assert int(np.asarray(dropped).sum()) == 0
    # reconstruct: device d receives, from each source s, the rows with
    # owner == d originating in s's shard (8 rows per shard)
    recv = recv.reshape(n_dev, n_dev, cap, feat)   # [dst, src, slot, feat]
    counts = counts.reshape(n_dev, n_dev)
    for dst in range(n_dev):
        got = []
        for src in range(n_dev):
            c = counts[dst, src]
            got.extend(map(tuple, recv[dst, src, :c]))
        want = [tuple(payload[i]) for i in range(R)
                if owner[i] == dst]
        assert sorted(got) == sorted(want), dst


def test_halo_exchange(mesh8):
    nw = mesh8.shape["window"]
    L, F, halo = nw * 8, 4, 2
    x = np.arange(L * F, dtype=np.float32).reshape(L, F)
    fn = make_halo_exchange(mesh8, halo=halo)
    lg, rg = (np.asarray(v) for v in fn(jnp.asarray(x)))
    lg = lg.reshape(nw, halo, F)
    rg = rg.reshape(nw, halo, F)
    shard = x.reshape(nw, 8, F)
    for w in range(nw):
        assert np.array_equal(lg[w], shard[(w - 1) % nw][-halo:])
        assert np.array_equal(rg[w], shard[(w + 1) % nw][:halo])


def test_overlap_dump_roundtrip(tmp_path):
    from falcon_unzip_tpu.models.overlapper import OverlapperConfig, \
        PreadOverlapper
    from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads
    dip = make_diploid(length=5000, het_rate=0.0, seed=1)
    reads = simulate_reads(dip, coverage=6.0, read_len=1500,
                           error_rate=0.0, seed=2)
    ovl = PreadOverlapper(reads.batch,
                          OverlapperConfig(min_overlap=300)).compute()
    assert len(ovl) > 0
    path = str(tmp_path / "preads.ovl")
    names = reads.batch.names
    write_overlaps(path, ovl, names=names)
    back = read_overlaps(path, {n: i for i, n in enumerate(names)})
    assert len(back) == len(ovl)
    for f in ("a_id", "b_id", "strand", "a_start", "a_end",
              "b_start", "b_end", "a_len", "b_len"):
        assert np.array_equal(getattr(back, f), getattr(ovl, f)), f


def test_regroup_partition_matches_host_groupby(mesh8):
    """regroup_partition must reproduce the host groupby exactly
    (per-group indices in input order) for uneven group sizes."""
    from falcon_unzip_tpu.parallel.collectives import regroup_partition
    rng = np.random.default_rng(3)
    n_groups = 5
    ctg = rng.integers(-1, n_groups, 203).astype(np.int64)
    got = regroup_partition(ctg, n_groups, mesh8)
    for g in range(n_groups):
        np.testing.assert_array_equal(got[g], np.nonzero(ctg == g)[0],
                                      err_msg=f"group {g}")
