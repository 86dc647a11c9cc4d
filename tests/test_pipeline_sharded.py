"""Config-5 gate: full pipeline over an 8-device mesh == single device.

The sharded executors (parallel.sharding.ShardedPhaseOps /
ShardedPairHMMScorer) use integer psum merges and the identical banded
forward, so the WHOLE pipeline output (haplotigs, phased reads, polished
consensus FASTA) must be byte-identical between mesh and single-device
runs (BASELINE.json north star: "bit-identical ... outputs").
"""
import os

import numpy as np
import pytest

from falcon_unzip_tpu.config import MeshCfg, PipelineConfig
from falcon_unzip_tpu.io.fasta import write_fasta
from falcon_unzip_tpu.pipeline.quiver import run_quiver
from falcon_unzip_tpu.pipeline.unzip import run_unzip
from falcon_unzip_tpu.seq import decode
from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads


def _prep(tmp, seed=21):
    dip = make_diploid(length=7000, het_rate=0.018, seed=seed,
                       het_span=(0.3, 0.7))
    pr = simulate_reads(dip, coverage=14.0, read_len=2000,
                        error_rate=0.0, seed=seed + 1)
    raw = simulate_reads(dip, coverage=16.0, read_len=1500,
                         error_rate=0.03, seed=seed + 2)
    write_fasta(f"{tmp}/preads.fa",
                ((pr.batch.names[i], pr.batch.to_str(i))
                 for i in range(len(pr.batch))))
    write_fasta(f"{tmp}/raw.fa",
                ((raw.batch.names[i], raw.batch.to_str(i))
                 for i in range(len(raw.batch))))
    write_fasta(f"{tmp}/draft.fa", [("d0", decode(dip.hap0))])


def _run(tmp, out, n_devices):
    cfg = PipelineConfig(
        preads=f"{tmp}/preads.fa", reads=f"{tmp}/raw.fa",
        draft=f"{tmp}/draft.fa", out_dir=f"{tmp}/{out}",
        mesh=MeshCfg(n_devices=n_devices))
    run_unzip(cfg)
    run_quiver(cfg)
    return cfg.out_dir


FILES = ["3-unzip/all_p_ctg.fa", "3-unzip/all_h_ctg.fa",
         "3-unzip/all_phased_reads", "4-polish/cns_p_ctg.fasta",
         "4-polish/cns_h_ctg.fasta", "4-polish/cns_p_ctg.fastq",
         "4-polish/cns_h_ctg.fastq"]


def test_sharded_pipeline_bit_identical(tmp_path):
    import jax
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    tmp = str(tmp_path)
    _prep(tmp)
    single = _run(tmp, "out_single", n_devices=1)
    sharded = _run(tmp, "out_mesh", n_devices=8)
    for rel in FILES:
        a = open(os.path.join(single, rel), "rb").read()
        b = open(os.path.join(sharded, rel), "rb").read()
        assert a == b, f"{rel} differs between mesh and single-device runs"
    assert open(os.path.join(sharded, FILES[0])).read().startswith(">")
