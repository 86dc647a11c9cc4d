"""Polisher: draft with injected errors + noisy reads -> exact truth."""
import numpy as np
import pytest

from falcon_unzip_tpu.models.aligner import AlignerConfig, ReadToContigAligner
from falcon_unzip_tpu.models.polisher import Polisher, PolisherConfig
from falcon_unzip_tpu.utils.simulate import (make_diploid, mutate_read,
                                             random_genome, simulate_reads)


def _inject_errors(seq, n_err, seed):
    rng = np.random.default_rng(seed)
    out = seq.copy()
    pos = rng.choice(len(seq) - 20, size=n_err, replace=False) + 10
    for p in pos:
        out[p] = (out[p] + 1 + rng.integers(0, 3)) % 4
    return out, np.sort(pos)


@pytest.fixture(scope="module")
def polish_setup():
    truth = random_genome(4000, 31)
    draft, err_pos = _inject_errors(truth, 12, 32)
    rng = np.random.default_rng(33)
    from falcon_unzip_tpu.seq import SeqBatch
    reads = [mutate_read(truth, 0.04, rng) for _ in range(40)]
    # give each read a random placement so windows have staggered coverage
    segs, names = [], []
    for i, r in enumerate(reads):
        s = rng.integers(0, 1500)
        e = min(len(r), s + 2500)
        segs.append(r[s:e])
        names.append(f"r{i}")
    batch = SeqBatch.from_strs(segs, names=names)
    al = ReadToContigAligner([draft])
    aln = al.align_batch(batch)
    return truth, draft, err_pos, aln


def test_vote_polish_fixes_draft(polish_setup):
    truth, draft, err_pos, aln = polish_setup
    pol = Polisher(PolisherConfig(arrow_rounds=0))
    out = pol.polish_contig("ctg0", draft, aln, 0)
    assert np.array_equal(out.seq, truth), (
        len(out.seq), len(truth),
        int((out.seq[:len(truth)] != truth[:len(out.seq)]).sum()))


def test_arrow_polish_also_exact(polish_setup):
    truth, draft, err_pos, aln = polish_setup
    pol = Polisher(PolisherConfig(arrow_rounds=1))
    out = pol.polish_contig("ctg0", draft, aln, 0)
    assert np.array_equal(out.seq, truth)


def test_qv_emitted(polish_setup):
    truth, draft, err_pos, aln = polish_setup
    pol = Polisher(PolisherConfig(arrow_rounds=0))
    out = pol.polish_contig("ctg0", draft, aln, 0)
    assert len(out.qv) == len(out.seq)
    assert out.qv.mean() > 10
