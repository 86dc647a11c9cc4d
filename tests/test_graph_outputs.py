"""String-graph completeness: chimer mask, utg_data, ctg_paths, sg.gfa."""
import numpy as np

from falcon_unzip_tpu.graph.string_graph import StringGraph
from falcon_unzip_tpu.models.overlapper import OverlapSet


def _mk_ovl(rows):
    arr = np.array(rows, np.int32)
    return OverlapSet(
        a_id=arr[:, 0], b_id=arr[:, 1], strand=arr[:, 2].astype(np.int8),
        a_start=arr[:, 3], a_end=arr[:, 4], b_start=arr[:, 5],
        b_end=arr[:, 6], a_len=arr[:, 7], b_len=arr[:, 8], dist=arr[:, 9])


def _chain_rows(ids, L=2000, ov=800):
    """Dovetail chain: suffix of ids[i] overlaps prefix of ids[i+1]."""
    return [(a, b, 0, L - ov, L, 0, ov, L, L, 0)
            for a, b in zip(ids, ids[1:])]


def test_find_chimers_flags_junction_read():
    """Read 8 overlaps only the INTERIOR of reads from two loci: flagged.
    Chain-terminal reads (one-sided but no interior evidence) are NOT."""
    rows = _chain_rows([0, 1, 2, 3]) + _chain_rows([4, 5, 6, 7])
    # chimer 8: its overlaps never reach one of its ends, and they bury
    # themselves mid-read
    rows.append((8, 1, 0, 100, 900, 700, 1500, 2000, 2000, 0))
    rows.append((8, 5, 0, 1100, 1900, 300, 1100, 2000, 2000, 0))
    ovl = _mk_ovl(rows)
    keep = np.ones(len(ovl), bool)
    chim = StringGraph.find_chimers(ovl, keep, fuzz=60)
    assert chim[8]
    assert not chim[:8].any()


def test_utg_and_ctg_paths_records(tmp_path):
    lens = np.full(6, 2000, np.int64)
    ovl = _mk_ovl(_chain_rows([0, 1, 2, 3, 4, 5]))
    g = StringGraph.from_overlaps(ovl, lens)
    g.transitive_reduction()
    recs = g.utg_records()
    assert recs, "chain should yield at least one unitig"
    # canonical dedup: no record should be another's mirror
    starts = {r[0] for r in recs}
    lengths = {r[4] for r in recs}
    assert all(ln > 0 for ln in lengths)
    p = tmp_path / "utg_data"
    g.write_utg_data(str(p))
    assert p.read_text().count("\n") == len(recs)

    # ctg_paths from an Unzipper walk over the same chain
    from falcon_unzip_tpu.io.gfa import write_ctg_paths
    from falcon_unzip_tpu.models.unzipper import Unzipper, UnzipConfig
    from falcon_unzip_tpu.seq import SeqBatch
    rng = np.random.default_rng(3)
    base = rng.integers(0, 4, 8000).astype(np.int8)
    reads = SeqBatch.from_strs([base[i * 1200 : i * 1200 + 2000]
                                for i in range(6)])
    ov2 = _mk_ovl(_chain_rows([0, 1, 2, 3, 4, 5], L=2000, ov=800))
    uz = Unzipper(reads, np.full(6, -1, np.int64), np.full(6, -1, np.int8),
                  cfg=UnzipConfig(drop_chimers=False))
    res = uz.unzip(ov2, np.ones(len(ov2), bool))
    assert res.p_paths is not None and len(res.p_paths) == len(res.p_ctg)
    cp = tmp_path / "ctg_paths"
    write_ctg_paths(str(cp), res.p_ctg, res.p_paths, res.graph)
    lines = [ln.split() for ln in cp.read_text().splitlines()]
    assert lines and lines[0][1] == "ctg_linear"
    assert int(lines[0][5]) == len(res.p_paths[0]) - 1


def test_sg_gfa_loads_and_has_links(tmp_path):
    from falcon_unzip_tpu.io.gfa import write_sg_gfa
    lens = np.full(5, 2000, np.int64)
    ovl = _mk_ovl(_chain_rows([0, 1, 2, 3, 4]))
    g = StringGraph.from_overlaps(ovl, lens)
    g.transitive_reduction()
    p = tmp_path / "sg.gfa"
    write_sg_gfa(str(p), g, lens)
    s_lines = [ln for ln in p.read_text().splitlines() if ln[0] == "S"]
    l_lines = [ln.split("\t") for ln in p.read_text().splitlines()
               if ln[0] == "L"]
    assert s_lines and l_lines
    names = {ln.split("\t")[1] for ln in s_lines}
    for l in l_lines:
        # structural GFA-1 validity: L from to orientations + overlap
        assert l[1] in names and l[3] in names
        assert l[2] in "+-" and l[4] in "+-"
        assert l[5].endswith("M") and int(l[5][:-1]) > 0
    # mirror dedup: each adjacency appears exactly once
    keys = {(l[1], l[3]) for l in l_lines}
    assert len(keys) == len(l_lines)
