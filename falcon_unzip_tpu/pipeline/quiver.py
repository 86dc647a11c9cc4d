"""4-polish pipeline driver (the fc_quiver.py role).

Role parity: [U] tasks/quiver.py DAG — rr_hctg_track read tracking, BAM
partition by contig, per-contig blasr + Arrow, cns merge (SURVEY.md
§3.4).  Re-design: raw reads are aligned in-process to the combined
p_ctg + h_ctg reference, partitioned by columnar masks (no BAM shuffle),
and each contig is polished with the windowed vote + pair-HMM stage.

Outputs (under <out>/4-polish/):
  cns_p_ctg.fasta / cns_p_ctg.fastq
  cns_h_ctg.fasta / cns_h_ctg.fastq
  read_to_contig_map.msgpack
"""
from __future__ import annotations

import logging
import os

import numpy as np

from ..config import PipelineConfig
from ..io.fasta import read_fasta, write_fasta, write_fastq
from ..io.serialize import serialize
from ..models.aligner import AlignerConfig, ReadToContigAligner
from ..models.polisher import Polisher, PolisherConfig
from ..parallel.checkpoint import Stage
from ..seq import decode
from ..utils.metrics import MetricsLog, assembly_stats

logger = logging.getLogger(__name__)


def run_quiver(cfg: PipelineConfig) -> dict:
    if cfg.profile_dir:  # jax.profiler device trace around the whole run
        from ..utils.profiling import device_trace
        with device_trace(cfg.profile_dir):
            return _run_quiver(cfg)
    return _run_quiver(cfg)


def _run_quiver(cfg: PipelineConfig) -> dict:
    # ---- multi-host (see pipeline.unzip): canonical 3-unzip inputs are
    # always read from host 0's out_dir; non-primary hosts write scratch
    from ..parallel import distributed as dist
    if cfg.mesh.debug_sharding:
        from ..parallel import debug
        debug.enable(True)
    if cfg.mesh.multihost:
        dist.initialize()
    multi = dist.process_count() > 1
    out_root = cfg.out_dir
    if multi and not dist.is_primary_host():
        import jax
        out_root = os.path.join(cfg.out_dir, f".host{jax.process_index()}")
    sync = dist.sync_stage_done if multi else None
    unzip_dir = os.path.join(cfg.out_dir, "3-unzip")
    out = os.path.join(out_root, "4-polish")
    os.makedirs(out, exist_ok=True)
    metrics = MetricsLog(os.path.join(out_root, "metrics.jsonl"))

    p_path = os.path.join(unzip_dir, "all_p_ctg.fa")
    h_path = os.path.join(unzip_dir, "all_h_ctg.fa")
    if not os.path.exists(p_path):
        raise FileNotFoundError(f"run the unzip stage first: {p_path}")
    p_batch = read_fasta(p_path)
    h_batch = read_fasta(h_path) if os.path.exists(h_path) else None

    names = list(p_batch.names or [])
    contigs = [p_batch.row(i) for i in range(len(p_batch))]
    n_primary = len(contigs)
    if h_batch is not None and len(h_batch):
        names += list(h_batch.names or [])
        contigs += [h_batch.row(i) for i in range(len(h_batch))]

    reads_path = cfg.reads or cfg.preads
    from ..io.ingest import read_seqs
    reads = read_seqs(reads_path)   # FASTA/FASTQ/BAM or .fofn of them
    logger.info("polish: %d reads vs %d contigs", len(reads), len(contigs))

    # reads are aligned once, lazily — if every stage below is up to date
    # on resume, the (expensive) alignment never runs
    _aln = {}

    def get_aln():
        if "a" not in _aln:
            aligner = ReadToContigAligner(contigs, AlignerConfig(
                k=cfg.align.k, band=cfg.align.band,
                window_pad=cfg.align.window_pad,
                min_identity=cfg.align.min_identity,
                batch_pairs=cfg.align.batch_pairs))
            if multi:
                # host-sharded raw-read alignment + cross-host gather
                # (see pipeline.unzip.get_aln)
                from ..models.aligner import AlnSet
                local = aligner.align_batch(
                    reads, read_range=dist.host_shard(len(reads)))
                _aln["a"] = AlnSet.merge(
                    [AlnSet.from_bytes(b)
                     for b in dist.allgather_bytes(local.to_bytes())])
            else:
                _aln["a"] = aligner.align_batch(reads)
        return _aln["a"]

    # ---- stage 1: track reads -> combined reference (rr_hctg_track role)
    track_stage = Stage(out, "1-track", inputs=[reads_path, p_path, h_path],
                        outputs=["read_to_contig_map.msgpack"],
                        resume=cfg.resume, sync=sync)

    def _track(st: Stage):
        aln = get_aln()
        r2c = {int(aln.read_id[a]): int(aln.ctg[a]) for a in range(len(aln))}
        serialize(st.out("read_to_contig_map.msgpack"), r2c)
        return {"n_aligned": len(aln)}

    track_stage.run(_track)

    # ---- stage 2: windowed polish (variantCaller/arrow role), resumable
    polish_stage = Stage(
        out, "2-polish", inputs=[reads_path, p_path, h_path],
        outputs=["../cns_p_ctg.fasta", "../cns_p_ctg.fastq",
                 "../cns_h_ctg.fasta", "../cns_h_ctg.fastq"],
        resume=cfg.resume, sync=sync)

    def _polish(st: Stage):
        from ..parallel.sharding import (ShardedArrowSplicer,
                                         ShardedWindowVotes,
                                         make_pipeline_mesh)
        mesh = make_pipeline_mesh(cfg.mesh.n_devices, cfg.mesh.window_par)
        splicer = ShardedArrowSplicer(
            mesh, max_cand=cfg.polish.arrow_candidates,
            chunk=cfg.polish.splice_chunk) if mesh is not None else None
        vote_ops = ShardedWindowVotes(mesh) \
            if mesh is not None and mesh.shape["window"] > 1 else None
        if mesh is not None:
            logger.info("polish scoring over mesh %s", dict(mesh.shape))
        polisher = Polisher(PolisherConfig(
            window=cfg.polish.window, overlap=cfg.polish.overlap,
            min_cov=cfg.polish.min_cov, arrow_rounds=cfg.polish.arrow_rounds,
            arrow_candidates=cfg.polish.arrow_candidates,
            arrow_min_cov=cfg.polish.arrow_min_cov,
            margin_frac=cfg.polish.margin_frac,
            hmm_band=cfg.polish.hmm_band,
            score_batch=cfg.polish.score_batch,
            splice_chunk=cfg.polish.splice_chunk,
            use_pallas=None if cfg.polish.use_pallas else False),
            splicer=splicer, vote_ops=vote_ops)
        polished = polisher.polish_all(list(zip(names, contigs)), get_aln())
        p_out = [c for i, c in enumerate(polished) if i < n_primary]
        h_out = [c for i, c in enumerate(polished) if i >= n_primary]
        _emit(out, "cns_p_ctg", p_out)
        _emit(out, "cns_h_ctg", h_out)
        return {
            "p": assembly_stats([c.seq for c in p_out]),
            "h": assembly_stats([c.seq for c in h_out]),
            "mean_qv": round(float(np.mean([c.qv.mean() for c in polished
                                            if len(c.qv)])), 2)
            if polished else 0.0,
        }

    polish_stage.run(_polish)
    stats = polish_stage.metrics()
    metrics.log("polish", **stats)
    logger.info("polish done: %s", stats)
    if multi:
        dist.barrier("quiver-done")
    return {**stats, "out_dir": out}


def _emit(out_dir: str, stem: str, contigs) -> None:
    write_fasta(os.path.join(out_dir, f"{stem}.fasta"),
                ((c.name, decode(c.seq)) for c in contigs))
    write_fastq(os.path.join(out_dir, f"{stem}.fastq"),
                ((c.name, decode(c.seq),
                  "".join(chr(33 + int(q)) for q in c.qv))
                 for c in contigs))


