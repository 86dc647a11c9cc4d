"""Emitted-QV reliability vs simulated truth (VERDICT r3 weak #4).

Reads a finished e2e scratch dir's cns FASTQs, re-derives the seeded
truth haplotypes, and compares PREDICTED errors (sum of 10^(-q/10) over
emitted per-base qualities) against OBSERVED errors (chunk edit
distance vs the best-matching haplotype) — overall and binned by
chunk-mean emitted QV.  A calibrated emitter has predicted ~= observed
in every bin.

  python scripts/qv_calibrate.py [genome_bp] [coverage] [profile]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("QV_CAL_CPU"):     # chunk re-alignment on host CPU
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def chunk_stats(cns_path: str, fastq_path: str, haps: list,
                chunk: int = 500):
    from falcon_unzip_tpu.io.fasta import read_fasta
    from falcon_unzip_tpu.io.ingest import read_seqs
    from falcon_unzip_tpu.models.aligner import (AlignerConfig,
                                                 ReadToContigAligner)
    from falcon_unzip_tpu.seq import SeqBatch, decode

    batch = read_fasta(cns_path)
    # per-base qualities from the fastq
    quals = []
    with open(fastq_path) as fh:
        lines = fh.read().splitlines()
    for i in range(0, len(lines), 4):
        quals.append(np.frombuffer(
            lines[i + 3].encode(), np.uint8).astype(np.int32) - 33)
    hap_strs = [decode(h) for h in haps]
    rc_tr = str.maketrans("ACGT", "TGCA")
    rows = []           # (chunk_mean_q, predicted, observed)
    al = None
    for ci in range(len(batch)):
        s = batch.to_str(ci)
        q = quals[ci]
        s_r = s.translate(rc_tr)[::-1]
        probes = [s[o : o + chunk] for o in
                  (0, max(0, len(s) // 2), max(0, len(s) - chunk))]
        n_f = sum(any(p in h for h in hap_strs) for p in probes if p)
        probes_r = [s_r[o : o + chunk] for o in
                    (0, max(0, len(s) // 2), max(0, len(s) - chunk))]
        n_r = sum(any(p in h for h in hap_strs) for p in probes_r if p)
        if n_r > n_f:
            s = s_r
            q = q[::-1]
        pieces = [(o, s[o : o + chunk]) for o in range(0, len(s), chunk)]
        pieces = [(o, p) for o, p in pieces if len(p) >= 50]
        resid = [(o, p) for o, p in pieces
                 if not any(p in h for h in hap_strs)]
        obs = {o: 0.0 for o, _ in pieces}
        if resid:
            if al is None:
                al = ReadToContigAligner(haps, AlignerConfig(band=256))
            sub = SeqBatch.from_strs([p for _, p in resid])
            res = al.align_batch(sub)
            best = {r: None for r in range(len(sub))}
            for a in range(len(res)):
                r = int(res.read_id[a])
                if best[r] is None or res.dist[a] < best[r]:
                    best[r] = float(res.dist[a])
            for r, (o, p) in enumerate(resid):
                obs[o] = best[r] if best[r] is not None else float(len(p))
        for o, p in pieces:
            qc = q[o : o + len(p)]
            rows.append((float(qc.mean()),
                         float(np.sum(10.0 ** (-qc / 10.0))),
                         obs[o]))
    return rows


def main():
    genome_bp = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    coverage = float(sys.argv[2]) if len(sys.argv) > 2 else 14.0
    profile = sys.argv[3] if len(sys.argv) > 3 else "uniform"
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from e2e_bench import contig_lengths
    from falcon_unzip_tpu.utils.simulate import make_diploid

    d = f"/tmp/e2e_bench_{genome_bp}" + (f"_{profile}"
                                         if profile != "uniform" else "")
    lens = contig_lengths(genome_bp, profile)
    true_haps = []
    for ci, per in enumerate(lens):
        dip = make_diploid(length=per, het_rate=0.012, seed=100 + ci,
                           het_span=(0.2, 0.8))
        true_haps += [dip.hap0, dip.hap1]
    rows = []
    for stem in ("cns_p_ctg", "cns_h_ctg"):
        fa = f"{d}/out/4-polish/{stem}.fasta"
        fq = f"{d}/out/4-polish/{stem}.fastq"
        if os.path.exists(fa):
            rows += chunk_stats(fa, fq, true_haps)
    rows = np.array(rows)          # (n, 3): mean_q, predicted, observed
    bins = [0, 20, 30, 40, 45, 50, 55, 61]
    table = []
    for lo, hi in zip(bins[:-1], bins[1:]):
        sel = (rows[:, 0] >= lo) & (rows[:, 0] < hi)
        if not sel.any():
            continue
        pred = rows[sel, 1].sum()
        obs = rows[sel, 2].sum()
        bases = sel.sum() * 500
        table.append({
            "q_bin": f"{lo}-{hi}", "n_chunks": int(sel.sum()),
            "predicted_errs": round(pred, 1),
            "observed_errs": round(obs, 1),
            "pred_qv": round(-10 * np.log10(max(pred / bases, 1e-9)), 1),
            "obs_qv": round(-10 * np.log10(max(obs / bases, 1e-9)), 1)})
    print(json.dumps({
        "metric": "qv_reliability",
        "genome_bp": genome_bp, "profile": profile,
        "total_predicted": round(float(rows[:, 1].sum()), 1),
        "total_observed": round(float(rows[:, 2].sum()), 1),
        "bins": table}))


if __name__ == "__main__":
    main()
