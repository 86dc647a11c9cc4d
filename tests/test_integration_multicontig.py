"""Config-3 style gate: multi-contig diploid unzip + polish, with QV.

Scaled-down 'yeast-like' scenario: several independent contigs, each a
diploid pair with a diverged middle region, assembled + phased + unzipped
+ polished end-to-end through the pipeline drivers.
"""
import os

import numpy as np
import pytest

from falcon_unzip_tpu.config import PipelineConfig
from falcon_unzip_tpu.io.fasta import read_fasta, write_fasta
from falcon_unzip_tpu.pipeline.quiver import run_quiver
from falcon_unzip_tpu.pipeline.unzip import run_unzip
from falcon_unzip_tpu.seq import decode, revcomp
from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads

pytestmark = pytest.mark.slow

N_CTG = 3
CTG_LEN = 9000


@pytest.fixture(scope="module")
def multi(tmp_path_factory):
    d = tmp_path_factory.mktemp("multi")
    dips = [make_diploid(length=CTG_LEN, het_rate=0.012, seed=60 + i,
                         het_span=(0.25, 0.75)) for i in range(N_CTG)]
    pread_recs, raw_recs, draft_recs = [], [], []
    for i, dip in enumerate(dips):
        pr = simulate_reads(dip, coverage=14.0, read_len=2200,
                            error_rate=0.0, seed=70 + i)
        rw = simulate_reads(dip, coverage=18.0, read_len=1800,
                            error_rate=0.03, seed=80 + i)
        pread_recs += [(f"c{i}_{pr.batch.names[k]}", pr.batch.to_str(k))
                       for k in range(len(pr.batch))]
        raw_recs += [(f"c{i}_{rw.batch.names[k]}", rw.batch.to_str(k))
                     for k in range(len(rw.batch))]
        draft_recs.append((f"draft{i}", decode(dip.hap0)))
    write_fasta(str(d / "preads.fa"), pread_recs)
    write_fasta(str(d / "raw.fa"), raw_recs)
    write_fasta(str(d / "draft.fa"), draft_recs)
    cfg = PipelineConfig(preads=str(d / "preads.fa"),
                         reads=str(d / "raw.fa"),
                         draft=str(d / "draft.fa"),
                         out_dir=str(d / "out"))
    res = run_unzip(cfg)
    return d, dips, cfg, res


def test_multicontig_unzip(multi):
    d, dips, cfg, res = multi
    total_true = N_CTG * CTG_LEN
    assert res["p_ctg"]["total_bp"] > 0.85 * total_true
    assert res["p_ctg"]["n_seqs"] >= N_CTG
    assert res["h_ctg"]["n_seqs"] >= N_CTG  # one bubble per contig minimum

    # every contig is an exact substring of SOME haplotype of SOME dip
    out = os.path.join(cfg.out_dir, "3-unzip")
    for fa in ("all_p_ctg.fa", "all_h_ctg.fa"):
        batch = read_fasta(os.path.join(out, fa))
        for i in range(len(batch)):
            s = batch.row(i)
            if len(s) < 300:
                continue
            found = any(
                hp.tobytes().find(x.tobytes()) >= 0
                for dip in dips for hp in (dip.hap0, dip.hap1)
                for x in (s, revcomp(s)))
            assert found, (fa, batch.names[i], len(s))


def test_multicontig_polish_qv(multi):
    d, dips, cfg, res = multi
    run_quiver(cfg)
    pol = os.path.join(cfg.out_dir, "4-polish")
    cns = read_fasta(os.path.join(pol, "cns_p_ctg.fasta"))
    # polished primaries must stay exact substrings of a haplotype
    # (preads were error-free; polishing with 3%-error raw reads must not
    # corrupt them) => QV effectively infinite on this input
    errors = 0
    bases = 0
    for i in range(len(cns)):
        s = cns.row(i)
        if len(s) < 500:
            continue
        best = None
        for dip in dips:
            for hp in (dip.hap0, dip.hap1):
                for x in (s, revcomp(s)):
                    if hp.tobytes().find(x.tobytes()) >= 0:
                        best = 0
        bases += len(s)
        if best is None:
            # count mismatches via banded alignment fallback
            errors += 1
    assert bases > 0
    # allow at most one imperfect contig (stitch boundary effects)
    assert errors <= 1, errors
