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

GOLDEN = {
    "3-unzip/all_p_ctg.fa": "2214212ca4a79346",
    "3-unzip/all_h_ctg.fa": "dd7bd5703ca50cf8",
    "3-unzip/all_phased_reads": "1b581ee77a2e0a7d",
    "4-polish/cns_p_ctg.fasta": "0dc81b4ccec72c86",
    # polish reproduces the haplotig exactly on this sim, so the cns
    # file is legitimately byte-equal to all_h_ctg.fa
    "4-polish/cns_h_ctg.fasta": "dd7bd5703ca50cf8",
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
