"""All-vs-all pread overlapper (the DALIGNER/LA4Falcon role).

Role parity: [U] DALIGNER `daligner` + `LA4Falcon -mo` overlap dumps that
feed ovlp_filter_with_phase and the string graph (SURVEY.md §2b).
Re-design: overlap candidates come from the same k-mer index + diagonal
chaining as the aligner; the overlap DP verification is the batched banded
wavefront on device; output is a columnar OverlapSet (arrays in memory,
not .las files) consumed directly by the graph builder.

Overlap record convention (falcon/m4-style, b-coords on b's FORWARD
strand never flipped; ``strand``=1 means b was reverse-complemented for
the match):
  a_start/a_end : matched window on a (forward)
  b_start/b_end : matched window on b as used in the match orientation
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..seq import PAD, SeqBatch, revcomp
from ..ops.banded_align import BandedAligner
from ..ops.kmer_index import (KmerIndex, chain_best_per_pair,
                              query_flat)


@dataclasses.dataclass
class OverlapSet:
    a_id: np.ndarray      # (O,) int32
    b_id: np.ndarray      # (O,) int32
    strand: np.ndarray    # (O,) int8  0: b fwd, 1: b rc
    a_start: np.ndarray   # (O,) int32 on a forward
    a_end: np.ndarray     # (O,) int32
    b_start: np.ndarray   # (O,) int32 on b in match orientation
    b_end: np.ndarray     # (O,) int32
    a_len: np.ndarray     # (O,) int32
    b_len: np.ndarray     # (O,) int32
    dist: np.ndarray      # (O,) int32 edit distance of the matched region

    def __len__(self):
        return len(self.a_id)

    def identity(self) -> np.ndarray:
        span = np.maximum(self.a_end - self.a_start, 1)
        return 1.0 - self.dist / span

    _COLS = ("a_id", "b_id", "strand", "a_start", "a_end",
             "b_start", "b_end", "a_len", "b_len", "dist")

    def sort_canonical(self) -> "OverlapSet":
        """Reorder records by (a_id, strand, b_id, a_start): a pure
        function of the record set, so host-sharded candidate batches
        merge to the identical overlap stream (graph construction
        consumes this order — SURVEY.md §2c cluster fan-out row)."""
        order = np.lexsort((self.a_start, self.b_id, self.strand,
                            self.a_id))
        return OverlapSet(**{k: getattr(self, k)[order]
                             for k in self._COLS})

    def to_bytes(self) -> bytes:
        from ..parallel.distributed import pack_arrays
        return pack_arrays({k: getattr(self, k) for k in self._COLS})

    @staticmethod
    def from_bytes(blob: bytes) -> "OverlapSet":
        from ..parallel.distributed import unpack_arrays
        return OverlapSet(**unpack_arrays(blob))

    @staticmethod
    def merge(parts: list["OverlapSet"]) -> "OverlapSet":
        return OverlapSet(**{
            k: np.concatenate([getattr(p, k) for p in parts])
            for k in OverlapSet._COLS}).sort_canonical()


@dataclasses.dataclass
class OverlapperConfig:
    k: int = 13
    max_hits: int = 128
    band: int = 256
    min_anchors: int = 4
    min_overlap: int = 500      # minimum overlap length
    min_identity: float = 0.70
    end_fuzz: int = 60          # tolerance for dovetail/containment calls
    batch_pairs: int = 256


class PreadOverlapper:
    """Compute all proper overlaps among a batch of preads."""

    def __init__(self, reads: SeqBatch, cfg: OverlapperConfig | None = None):
        self.cfg = cfg or OverlapperConfig()
        self.reads = reads
        self.seqs = [reads.row(i) for i in range(len(reads))]
        self.index = KmerIndex.build(self.seqs, k=self.cfg.k,
                                     max_hits=self.cfg.max_hits)

    def _candidates(self, a_range: tuple[int, int] | None = None):
        """Seed/chain candidate overlap placements (a_id < b_id only; the
        symmetric record is derived, not recomputed).

        a_range: optional [lo, hi) slice of a-read ids to seed from — the
        host-shard hook (each unordered pair is generated from its smaller
        id, so sharding the a axis partitions the candidate set exactly).
        """
        cfg = self.cfg
        n = len(self.seqs)
        a_lo, a_hi = a_range if a_range is not None else (0, n)
        cands = []  # (a, b, strand, diag)
        # pair keys must stay < 2^31 inside chain_best_per_pair; beyond
        # that, small blocks keep the anchor temporaries cache-resident
        # (measured: 64-read blocks beat both per-read and full-batch)
        block = max(1, min(n, 64, (1 << 31) // max(n, 1) - 1))
        for strand in (0, 1):
            seqs = self.seqs if strand == 0 else \
                [revcomp(s) for s in self.seqs]
            for a0 in range(a_lo, a_hi, block):
                rid, q_pos, t_pos, t_ctg = query_flat(
                    self.index, seqs[a0 : min(a0 + block, a_hi)])
                a_glob = rid.astype(np.int64) + a0
                # each unordered pair is chained once, from the smaller
                # id (self anchors drop with it; self-rc also skipped)
                keep = t_ctg > a_glob
                # best placement per (read, partner) pair, one numpy pass
                # (t_lo is the exact minimum anchor diagonal, NOT the
                # quantized bin start — quantization here shifts the DP
                # window and corrupts overlap ends)
                a_l, bs, t_los = chain_best_per_pair(
                    rid[keep], q_pos[keep], t_pos[keep], t_ctg[keep],
                    n_targets=n, min_anchors=cfg.min_anchors)
                for al, b, d in zip(a_l, bs, t_los):
                    cands.append((int(al) + a0, int(b), strand, int(d)))
        # deterministic order matching the per-read formulation: a, then
        # strand, then partner (graph construction consumes this order)
        cands.sort(key=lambda c: (c[0], c[2], c[1]))
        return cands

    def compute(self, a_range: tuple[int, int] | None = None) -> OverlapSet:
        """Verify candidates with banded DP and emit overlap records.

        For a candidate with diagonal D (approx b_pos - a_pos in match
        orientation): the overlapping window is a[max(0,D'):...] vs
        b[max(0,-D'):...] — we align the overhanging suffix of one onto
        the other with a free-tail DP (qglocal) in both directions.

        a_range host-shards the candidate set (see _candidates).
        """
        cfg = self.cfg
        cands = self._candidates(a_range)
        aligner = BandedAligner(W=cfg.band, mode="tglocal")
        cols = {k: [] for k in ("a_id", "b_id", "strand", "a_start", "a_end",
                                "b_start", "b_end", "a_len", "b_len", "dist")}
        jobs = []
        for (a, b, strand, diag) in cands:
            ra = self.seqs[a]
            rb = self.seqs[b] if strand == 0 else revcomp(self.seqs[b])
            # diag ~ rb_pos - ra_pos: a[x] matches rb[x + diag]
            a_lo = max(0, -diag)
            b_lo = max(0, diag)
            ov = min(len(ra) - a_lo, len(rb) - b_lo)
            if ov < cfg.min_overlap:
                continue
            # align the overlapping slice of a (query) onto a padded window
            # of rb (target) with free target start/end
            pad = cfg.band // 4
            q = ra[a_lo : a_lo + ov]
            t_lo = max(0, b_lo - pad)
            t_hi = min(len(rb), b_lo + ov + pad)
            jobs.append((a, b, strand, a_lo, ov, t_lo, t_hi, q,
                         rb[t_lo:t_hi]))

        # bucketed batched DP; the target bucket tracks the query bucket
        # and the Pallas path uses the sparse canonical ladder (one
        # serialized remote Mosaic compile per SHAPE — see
        # models.aligner._q_bucket/_t_bucket notes)
        from .aligner import _q_bucket
        buckets: dict[tuple[int, int], list[int]] = {}
        for ji, j in enumerate(jobs):
            bq = _q_bucket(len(j[7]), aligner.use_pallas)
            bt = _t_bucket(len(j[8]), bq)
            buckets.setdefault((bq, bt), []).append(ji)
        # two-phase async: dispatch all chunks, then collect (see
        # models.aligner — avoids one blocking device round trip per chunk)
        pending = []  # (chunk, n_real, handle)
        # 2x chunks on the Pallas path: fewer relay round trips (see
        # models.aligner)
        chunk_pairs = cfg.batch_pairs * (2 if aligner.use_pallas else 1)
        for (bq, bt), jidx in sorted(buckets.items()):
            for s in range(0, len(jidx), chunk_pairs):
                chunk = jidx[s : s + chunk_pairs]
                P = len(chunk)
                # pad the tail chunk to the full batch (repeat last job,
                # results discarded): one device shape per bucket, so the
                # serialized remote kernel compile runs once, not per
                # ragged tail size
                n_real = P
                if P < chunk_pairs and s > 0:
                    chunk = chunk + [chunk[-1]] * (chunk_pairs - P)
                    P = chunk_pairs
                qa = np.full((P, bq), PAD, np.int8)
                ta = np.full((P, bt), PAD, np.int8)
                nn = np.zeros(P, np.int32)
                mm = np.zeros(P, np.int32)
                for pi, ji in enumerate(chunk):
                    _, _, _, _, _, _, _, q, t = jobs[ji]
                    qa[pi, : len(q)] = q
                    ta[pi, : len(t)] = t
                    nn[pi] = len(q)
                    mm[pi] = len(t)
                pending.append((chunk, n_real,
                                aligner.dispatch(qa, ta, nn, mm,
                                                 want_moves="summary")))
        # the moves strings are reduced ON DEVICE to a 7-int summary per
        # pair (ops.banded_align._summarize_moves) and ALL chunks are
        # fetched in one concatenated RPC: both the packed-moves payload
        # and the per-chunk fetch latency were the wall-clock terms here
        allres = aligner.collect_summaries([h for _, _, h in pending])
        row0 = 0
        for chunk, n_real, handle in pending:
                res = {k: v[row0 : row0 + len(chunk)]
                       for k, v in allres.items()}
                row0 += len(chunk)
                for pi, ji in enumerate(chunk[:n_real]):
                    a, b, strand, a_lo, ov, t_lo, t_hi, q, t = jobs[ji]
                    dist = int(res["dist"][pi])
                    if dist >= (1 << 20):
                        continue
                    end_j = int(res["end_j"][pi])
                    start_j = end_j - int(res["n_t"][pi])
                    # trim query insertions hanging off the target's ends
                    # (the q window may overshoot the true overlap): leading
                    # ups advance a_start, trailing ups retract a_end
                    lead = int(res["lead"][pi])
                    trail = max(0, min(int(res["trail"][pi]),
                                       int(res["n_up"][pi]) - lead))
                    a_s = a_lo + lead
                    a_e = a_lo + ov - trail
                    dist -= lead + trail
                    span = a_e - a_s
                    if span < cfg.min_overlap:
                        continue
                    if 1.0 - dist / max(span, 1) < cfg.min_identity:
                        continue
                    b_start = t_lo + start_j
                    b_end = t_lo + end_j
                    rb_len = len(self.seqs[b])
                    cols["a_id"].append(a)
                    cols["b_id"].append(b)
                    cols["strand"].append(strand)
                    cols["a_start"].append(a_s)
                    cols["a_end"].append(a_e)
                    cols["b_start"].append(b_start)
                    cols["b_end"].append(b_end)
                    cols["a_len"].append(len(self.seqs[a]))
                    cols["b_len"].append(rb_len)
                    cols["dist"].append(dist)

        return OverlapSet(**{k: np.array(v, np.int32 if k != "strand"
                                         else np.int8)
                             for k, v in cols.items()}).sort_canonical()


def _bucket(n: int, minimum: int = 256) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _t_bucket(t_len: int, bq: int, step: int = 512) -> int:
    """See models.aligner._t_bucket: one kernel shape per query bucket."""
    return bq + step * max(1, -(-max(t_len - bq, 1) // step))
