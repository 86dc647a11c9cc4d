"""Draft-guided walk contiguity: thin coverage must not fragment or
duplicate primaries (VERDICT r4 weak #2 / round-5 task #1).

Role parity: [U] graphs_to_h_tigs_2 inherits primary contiguity from
the FALCON p_ctg tiling path (SURVEY.md §3.3) — a thin-coverage spot
cannot fragment a reference primary, so it must not fragment ours.
"""
import os

import numpy as np
import pytest

from falcon_unzip_tpu.config import PipelineConfig
from falcon_unzip_tpu.io.fasta import read_fasta, write_fasta
from falcon_unzip_tpu.pipeline.unzip import run_unzip
from falcon_unzip_tpu.seq import decode
from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads


@pytest.fixture(scope="module")
def thin_run(tmp_path_factory):
    """40 kb diploid at 7x pread coverage: the graph has dead ends the
    pre-round-5 walk fragmented into many short primaries."""
    d = tmp_path_factory.mktemp("thin")
    dip = make_diploid(length=40_000, het_rate=0.012, seed=71,
                       het_span=(0.2, 0.8))
    preads = simulate_reads(dip, coverage=7.0, read_len=2200,
                            error_rate=0.0, seed=72)
    write_fasta(str(d / "preads.fa"),
                ((preads.batch.names[i], preads.batch.to_str(i))
                 for i in range(len(preads.batch))))
    write_fasta(str(d / "draft.fa"), [("draft0", decode(dip.hap0))])
    cfg = PipelineConfig(preads=str(d / "preads.fa"),
                         draft=str(d / "draft.fa"),
                         out_dir=str(d / "out"))
    res = run_unzip(cfg)
    return d, dip, cfg, res


def test_thin_coverage_single_primary(thin_run):
    _d, dip, cfg, res = thin_run
    p = res["p_ctg"]
    # one end-to-end primary per draft contig, no fragmentation
    assert p["n_seqs"] == 1, p
    assert p["max_len"] >= 0.97 * len(dip.hap0), p


def test_thin_coverage_no_duplicated_primary_bp(thin_run):
    _d, dip, cfg, res = thin_run
    # total primary bp ~= genome size: duplicate walks over already
    # covered draft spans are demoted to haplotigs, not re-emitted
    assert res["p_ctg"]["total_bp"] <= 1.02 * len(dip.hap0), res["p_ctg"]
    assert res["p_ctg"]["total_bp"] >= 0.97 * len(dip.hap0), res["p_ctg"]


def test_thin_coverage_primary_matches_truth(thin_run):
    """Gap rescue must splice exactly: every 500 bp chunk of the primary
    either matches a truth haplotype verbatim, or is a junction chunk
    (phase-block switch of the mosaic pseudo-haplotype, or a splice)
    whose interior windows still match truth — no fabricated sequence."""
    _d, dip, cfg, res = thin_run
    p = read_fasta(os.path.join(cfg.out_dir, "3-unzip", "all_p_ctg.fa"))
    assert len(p) == 1
    s = p.to_str(0)
    haps = [decode(dip.hap0), decode(dip.hap1)]
    rc = str.maketrans("ACGT", "TGCA")
    if not any(s[:200] in h for h in haps):
        s = s.translate(rc)[::-1]
    chunk = 500
    pieces = [s[o:o + chunk] for o in range(0, len(s), chunk)]
    n_bad = 0
    for piece in pieces:
        if len(piece) < 100 or any(piece in h for h in haps):
            continue
        n_bad += 1
        # a single junction breaks at most 2 of the 5 100bp windows;
        # more means the splice fabricated sequence
        wins = [piece[o:o + 100] for o in range(0, len(piece) - 99, 100)]
        exact = sum(any(w in h for h in haps) for w in wins)
        assert exact >= len(wins) - 2, (exact, len(wins), piece[:80])
    # junction chunks are bounded by phase blocks + rescues, not O(len)
    assert n_bad <= max(2, len(pieces) // 6), (n_bad, len(pieces))


def test_haplotigs_survive_thin_coverage(thin_run):
    _d, dip, _cfg, res = thin_run
    # het bubbles still come out as haplotigs
    assert res["h_ctg"]["n_seqs"] >= 1


@pytest.fixture(scope="module")
def repeat_thin_run(tmp_path_factory):
    """Thin coverage over a repeat-rich diploid: gap rescues fire INSIDE
    segmental duplications, where round-5's qv_attrib found the walk
    junction skipping same-haplotype bases (runs of cns_missing_base on
    E2E_r05_n50).  The position-consistent, double-anchor splice must
    stay exact here."""
    d = tmp_path_factory.mktemp("repthin")
    dip = make_diploid(length=60_000, het_rate=0.015, seed=81,
                       het_span=(0.1, 0.9), n_repeats=3,
                       repeat_len=3000, repeat_identity=0.97)
    preads = simulate_reads(dip, coverage=7.0, read_len=2200,
                            error_rate=0.0, seed=82)
    write_fasta(str(d / "preads.fa"),
                ((preads.batch.names[i], preads.batch.to_str(i))
                 for i in range(len(preads.batch))))
    write_fasta(str(d / "draft.fa"), [("draft0", decode(dip.hap0))])
    cfg = PipelineConfig(preads=str(d / "preads.fa"),
                         draft=str(d / "draft.fa"),
                         out_dir=str(d / "out"))
    res = run_unzip(cfg)
    return d, dip, cfg, res


def test_repeat_rescue_junctions_exact(repeat_thin_run):
    _d, dip, cfg, res = repeat_thin_run
    p = read_fasta(os.path.join(cfg.out_dir, "3-unzip", "all_p_ctg.fa"))
    haps = [decode(dip.hap0), decode(dip.hap1)]
    rc = str.maketrans("ACGT", "TGCA")
    tot, bad_windows = 0, 0
    for i in range(len(p)):
        s = p.to_str(i)
        if not any(s[:200] in h for h in haps):
            s = s.translate(rc)[::-1]
        wins = [s[o:o + 100] for o in range(0, len(s) - 99, 100)]
        tot += len(wins)
        bad_windows += sum(not any(w in h for h in haps) for w in wins)
    # every junction may break at most ~2 windows; runs of missing
    # bases (the round-5 bug: 458 missing over ~40 junctions) would
    # blow well past this bound
    assert tot > 0
    assert bad_windows <= 14, (bad_windows, tot)
    # no duplicated primary sequence; some REPEAT-interior loss is a
    # known limitation at 7x over 97%-identity segdups (reads inside a
    # copy multi-map, so copies partially collapse — real assemblers
    # collapse here too); the walk must still keep >= 80% and stay one
    # piece
    assert res["p_ctg"]["total_bp"] <= 1.03 * len(dip.hap0)
    assert res["p_ctg"]["total_bp"] >= 0.80 * len(dip.hap0)
    assert res["p_ctg"]["n_seqs"] == 1
