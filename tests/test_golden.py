"""Golden-output regression gate (SURVEY.md §4 implication 1).

The reference's conformance story is golden files: stage-boundary
artifacts ARE the spec.  The upstream mount is empty, so the executable
oracle defines semantics — this test pins the COMPLETE pipeline output
bytes on a fixed simulation so any unintended semantic drift (phasing
rules, graph tie-breaks, consensus votes, HMM numerics) fails loudly.

If a change ALTERS semantics on purpose, re-derive the hashes with the
snippet in this file's history and update GOLDEN alongside the change.
"""
import hashlib
import os

import pytest

from falcon_unzip_tpu.config import PipelineConfig
from falcon_unzip_tpu.io.fasta import write_fasta
from falcon_unzip_tpu.pipeline.quiver import run_quiver
from falcon_unzip_tpu.pipeline.unzip import run_unzip
from falcon_unzip_tpu.seq import decode
from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads

# Re-derived 2026-08-19 (round 2): falcon coverage filters (bestn et al.)
# + graph chimer filter shift the walk start; alignment-end anchoring +
# arrow_min_cov make polish reproduce BOTH unzip contigs byte-exactly
# (each output verified an exact substring of its true sim haplotype).
# all_phased_reads re-derived same day for AlnSet.sort_canonical (records
# now in read-id order, shard-count invariant for multi-host runs); all
# contig outputs were verified byte-UNCHANGED by that re-derivation.
# Re-derived 2026-08-21 (round 5): the DRAFT-GUIDED walk starts each
# primary at the leftmost placed read in draft orientation instead of
# the longest source read (models/unzipper.py round-5 contiguity work);
# both contigs verified exact substrings of their truth haplotypes
# (p 5650 bp, h 5394 bp), polish still byte-reproduces them, and
# all_phased_reads is byte-UNCHANGED.
# Re-derived 2026-08-21 (round 5, second pass): head/tail DRAFT FILLS —
# the primary now spans the WHOLE draft like the reference's tiling
# path (p grew 5650 -> 6000 bp, still an exact substring of truth
# hap0, in fact the complete haplotype); polish byte-reproduces it;
# haplotig + phased reads byte-UNCHANGED.
GOLDEN = {
    "3-unzip/all_p_ctg.fa": "2864673ab4dc9bf2",
    "3-unzip/all_h_ctg.fa": "70b2521a58bd85f1",
    "3-unzip/all_phased_reads": "3c3f04ee8364d5f6",
    # polish reproduces primary AND haplotig exactly on this sim, so the
    # cns files are legitimately byte-equal to the 3-unzip outputs
    "4-polish/cns_p_ctg.fasta": "2864673ab4dc9bf2",
    "4-polish/cns_h_ctg.fasta": "70b2521a58bd85f1",
}


def test_pipeline_outputs_match_golden(tmp_path):
    d = str(tmp_path)
    dip = make_diploid(length=6000, het_rate=0.02, seed=77,
                       het_span=(0.3, 0.7))
    pr = simulate_reads(dip, coverage=14.0, read_len=1800,
                        error_rate=0.0, seed=78)
    raw = simulate_reads(dip, coverage=16.0, read_len=1500,
                         error_rate=0.03, seed=79)
    write_fasta(f"{d}/preads.fa",
                ((pr.batch.names[i], pr.batch.to_str(i))
                 for i in range(len(pr.batch))))
    write_fasta(f"{d}/raw.fa",
                ((raw.batch.names[i], raw.batch.to_str(i))
                 for i in range(len(raw.batch))))
    write_fasta(f"{d}/draft.fa", [("d0", decode(dip.hap0))])
    cfg = PipelineConfig(preads=f"{d}/preads.fa", reads=f"{d}/raw.fa",
                         draft=f"{d}/draft.fa", out_dir=f"{d}/out")
    run_unzip(cfg)
    run_quiver(cfg)
    mismatches = []
    for rel, want in GOLDEN.items():
        got = hashlib.sha256(
            open(os.path.join(d, "out", rel), "rb").read()).hexdigest()[:16]
        if got != want:
            mismatches.append(f"{rel}: got {got}, golden {want}")
    assert not mismatches, (
        "pipeline outputs drifted from the golden gate:\n  "
        + "\n  ".join(mismatches)
        + "\nIf the semantic change is intentional, update GOLDEN "
          "(see module docstring).")
