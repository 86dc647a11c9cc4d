"""Full pipeline drivers: unzip + quiver end-to-end on disk, with resume."""
import json
import os

import numpy as np
import pytest

from falcon_unzip_tpu.config import PipelineConfig, load_config
from falcon_unzip_tpu.io.fasta import read_fasta, write_fasta
from falcon_unzip_tpu.pipeline.quiver import run_quiver
from falcon_unzip_tpu.pipeline.unzip import run_unzip
from falcon_unzip_tpu.seq import decode
from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    dip = make_diploid(length=9000, het_rate=0.015, seed=40,
                       het_span=(0.3, 0.7))
    preads = simulate_reads(dip, coverage=16.0, read_len=2200,
                            error_rate=0.0, seed=41)
    raw = simulate_reads(dip, coverage=20.0, read_len=1800,
                         error_rate=0.03, seed=42)
    write_fasta(str(d / "preads.fa"),
                ((preads.batch.names[i], preads.batch.to_str(i))
                 for i in range(len(preads.batch))))
    write_fasta(str(d / "raw.fa"),
                ((raw.batch.names[i], raw.batch.to_str(i))
                 for i in range(len(raw.batch))))
    write_fasta(str(d / "draft.fa"), [("draft0", decode(dip.hap0))])
    return d, dip


@pytest.fixture(scope="module")
def unzip_result(workdir):
    d, dip = workdir
    cfg = PipelineConfig(preads=str(d / "preads.fa"),
                         reads=str(d / "raw.fa"),
                         draft=str(d / "draft.fa"),
                         out_dir=str(d / "out"))
    res = run_unzip(cfg)
    return d, dip, cfg, res


def test_unzip_outputs_on_disk(unzip_result):
    d, dip, cfg, res = unzip_result
    out = os.path.join(cfg.out_dir, "3-unzip")
    for f in ("all_p_ctg.fa", "all_h_ctg.fa", "all_h_ctg_ids",
              "all_phased_reads", "h_ctg_placements.json"):
        assert os.path.exists(os.path.join(out, f)), f
    p = read_fasta(os.path.join(out, "all_p_ctg.fa"))
    h = read_fasta(os.path.join(out, "all_h_ctg.fa"))
    assert res["p_ctg"]["total_bp"] > 0.8 * len(dip.hap0)
    assert len(h) >= 1
    # haplotigs exact vs one haplotype (error-free preads)
    from falcon_unzip_tpu.seq import revcomp
    for i in range(len(h)):
        s = h.row(i)
        found = any(hp.tobytes().find(x.tobytes()) >= 0
                    for hp in (dip.hap0, dip.hap1)
                    for x in (s, revcomp(s)))
        assert found, h.names[i]


def test_unzip_resume_skips_stages(unzip_result, caplog):
    d, dip, cfg, res = unzip_result
    import logging
    with caplog.at_level(logging.INFO):
        res2 = run_unzip(cfg)
    assert res2["p_ctg"] == res["p_ctg"]
    assert any("skipped" in r.message for r in caplog.records)


def test_quiver_polish(unzip_result):
    d, dip, cfg, res = unzip_result
    out = run_quiver(cfg)
    pol = os.path.join(cfg.out_dir, "4-polish")
    for f in ("cns_p_ctg.fasta", "cns_p_ctg.fastq",
              "cns_h_ctg.fasta", "cns_h_ctg.fastq"):
        assert os.path.exists(os.path.join(pol, f)), f
    cns = read_fasta(os.path.join(pol, "cns_p_ctg.fasta"))
    assert sum(int(cns.lengths[i]) for i in range(len(cns))) > \
        0.8 * len(dip.hap0)


def test_cli_gen_gfa_and_dedup(unzip_result, capsys):
    d, dip, cfg, res = unzip_result
    from falcon_unzip_tpu.cli import main
    unzip_dir = os.path.join(cfg.out_dir, "3-unzip")
    gfa = str(d / "asm.gfa")
    assert main(["gen-gfa", "--unzip-dir", unzip_dir, "--out", gfa]) == 0
    text = open(gfa).read()
    assert text.startswith("H\tVN:Z:1.0")
    assert "\nL\t" in text and "S\t000000F" in text
    # dedup: haplotigs differ from primary -> all kept
    out_fa = str(d / "h.dedup.fa")
    assert main(["dedup", "--p-ctg", os.path.join(unzip_dir, "all_p_ctg.fa"),
                 "--h-ctg", os.path.join(unzip_dir, "all_h_ctg.fa"),
                 "--out", out_fa]) == 0
    assert os.path.exists(out_fa)


def test_config_ini_loading(tmp_path):
    ini = tmp_path / "fc_unzip.cfg"
    ini.write_text(
        "[General]\ninput_fofn = preads.fa\n"
        "[Unzip]\ninput_bam_fofn = raw.fa\n"
        "unzip_blasr_concurrent_jobs = 16\n"
        "[polish]\narrow_rounds = 2\nwindow = 256\n"
        "[align]\nband = 512\n")
    cfg = load_config(str(ini))
    assert cfg.preads == "preads.fa"
    assert cfg.reads == "raw.fa"
    assert cfg.polish.arrow_rounds == 2
    assert cfg.polish.window == 256
    assert cfg.align.band == 512
    cfg.out_dir = str(tmp_path)
    cfg.validate()


def test_quiver_resume_skips_polish(unzip_result, caplog):
    """Second run must skip both quiver stages (and the alignment)."""
    import logging
    _d, _dip, cfg, _res = unzip_result
    r1 = run_quiver(cfg)
    with caplog.at_level(logging.INFO):
        r2 = run_quiver(cfg)
    assert "up to date -- skipped" in caplog.text
    assert r2["mean_qv"] == r1["mean_qv"]
    assert r2["p"] == r1["p"]


def test_unzip_dedup_flag(tmp_path):
    """graph.dedup drops haplotigs near-identical to their primary."""
    import dataclasses
    import numpy as np
    from falcon_unzip_tpu.models.dedup import dedup_haplotigs
    from falcon_unzip_tpu.seq import SeqBatch
    from falcon_unzip_tpu.utils.simulate import random_genome, mutate_read
    p = random_genome(3000, 1)
    dup = mutate_read(p, 0.001, np.random.default_rng(2))      # ~99.9% id
    distinct = mutate_read(p, 0.05, np.random.default_rng(3))  # ~95% id
    p_b = SeqBatch.from_strs([p])
    h_b = SeqBatch.from_strs([dup, distinct])
    kept = dedup_haplotigs(p_b, h_b, max_identity=0.99)
    assert 1 in kept and 0 not in kept


def test_unzip_full_resume_skips_all_compute(unzip_result, caplog, monkeypatch):
    """A fully up-to-date unzip resume must never align (lazy aln)."""
    import logging
    from falcon_unzip_tpu.models import aligner as aligner_mod
    d, dip, cfg, first = unzip_result

    def _boom(*a, **k):
        raise AssertionError("aligner ran on a fully resumed pipeline")

    monkeypatch.setattr(aligner_mod.ReadToContigAligner, "align_batch",
                        _boom)
    with caplog.at_level(logging.INFO):
        res = run_unzip(cfg)
    assert res["p_ctg"] == first["p_ctg"]
    assert caplog.text.count("up to date -- skipped") >= 3


def test_quiver_per_base_qv_fastq(tmp_path):
    """Raw reads as FASTQ with a per-base quality track drive the
    PER-BASE tier path through the full quiver driver (real Arrow's
    IQV/DQV conditioning, SURVEY.md §2b variantCaller row): the run
    completes, logs tier mode, and emits calibrated consensus."""
    from falcon_unzip_tpu.io.fasta import write_fastq

    d = tmp_path
    dip = make_diploid(length=9000, het_rate=0.015, seed=40,
                       het_span=(0.3, 0.7))
    preads = simulate_reads(dip, coverage=16.0, read_len=2200,
                            error_rate=0.0, seed=41)
    raw = simulate_reads(dip, coverage=20.0, read_len=1800,
                         error_rate=0.03, seed=42, rc_frac=0.5,
                         qv_profile="hotspot")
    write_fasta(str(d / "preads.fa"),
                ((preads.batch.names[i], preads.batch.to_str(i))
                 for i in range(len(preads.batch))))
    write_fastq(str(d / "raw.fastq"),
                ((raw.batch.names[i], raw.batch.to_str(i),
                  (raw.quals[i] + 33).tobytes().decode("latin1"))
                 for i in range(len(raw.batch))))
    write_fasta(str(d / "draft.fa"), [("draft0", decode(dip.hap0))])
    cfg = PipelineConfig(preads=str(d / "preads.fa"),
                         reads=str(d / "raw.fastq"),
                         draft=str(d / "draft.fa"),
                         out_dir=str(d / "out"))
    run_unzip(cfg)
    res = run_quiver(cfg)
    assert res["mean_qv"] > 30
    fa = os.path.join(cfg.out_dir, "4-polish", "cns_p_ctg.fasta")
    cns = read_fasta(fa)
    assert len(cns) >= 1
    # polished primary matches one haplotype closely (chunk containment)
    s = cns.to_str(0)
    hap_strs = [decode(dip.hap0), decode(dip.hap1)]
    chunks = [s[o : o + 400] for o in range(0, len(s) - 400, 400)]
    n_hit = sum(any(c in h for h in hap_strs) for c in chunks)
    assert n_hit >= 0.9 * len(chunks), (n_hit, len(chunks))
