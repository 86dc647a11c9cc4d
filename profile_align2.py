"""Timing split of the NEW align_batch at a given scale (repo-root TPU script)."""
import sys, time
import numpy as np
from falcon_unzip_tpu.models.aligner import AlignerConfig, ReadToContigAligner
from falcon_unzip_tpu.utils.simulate import make_diploid, simulate_reads
from falcon_unzip_tpu.seq import SeqBatch

genome_bp = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
n_ctg = max(1, genome_bp // 50_000)
per = genome_bp // n_ctg
contigs, seqs = [], []
for ci in range(n_ctg):
    dip = make_diploid(length=per, het_rate=0.012, seed=100 + ci, het_span=(0.2, 0.8))
    pr = simulate_reads(dip, coverage=14.0, read_len=2200, error_rate=0.0, seed=200 + ci)
    seqs += [pr.batch.to_str(i) for i in range(len(pr.batch))]
    contigs.append(dip.hap0)
reads = SeqBatch.from_strs(seqs)
al = ReadToContigAligner(contigs, AlignerConfig())
t0 = time.time()
aln = al.align_batch(reads)
print({"wall_s": round(time.time() - t0, 2), "n_aligned": len(aln), **al.timings})
