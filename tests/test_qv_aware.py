"""Base-quality-conditioned pair-HMM tier (SURVEY.md §2b variantCaller
row: Arrow conditions on per-read features; VERDICT round-2 missing #5)."""
import numpy as np

from falcon_unzip_tpu.models.polisher import Polisher, PolisherConfig, _WinState
from falcon_unzip_tpu.oracle.hmm import HMMParams, params_for_read_qv
from falcon_unzip_tpu.ops.pairhmm import params_vector
from falcon_unzip_tpu.utils.simulate import mutate_read, random_genome


def test_params_for_read_qv_scaling():
    base = HMMParams()
    assert params_for_read_qv(0.0) is base or \
        params_for_read_qv(0.0).e_sub == base.e_sub
    hi = params_for_read_qv(30.0)
    lo = params_for_read_qv(5.0)
    assert hi.e_sub < base.e_sub < lo.e_sub
    assert hi.p_ins < base.p_ins < lo.p_ins
    # proportions preserved
    assert abs(hi.e_sub / hi.p_ins - base.e_sub / base.p_ins) < 1e-6
    # clamped: absurdly high QV doesn't claim per-base certainty
    assert params_for_read_qv(90.0).e_sub == params_for_read_qv(35.0).e_sub


def test_qv_tier_flips_outvoted_column():
    """5 clean reads (QV 30) vs 6 noisy reads (QV ~5) disagreeing at one
    column: uniform params keep the noisy majority's base; per-read
    quality tiers let the clean minority win."""
    rng = np.random.default_rng(91)
    truth = random_genome(200, 91)
    p = 100
    wrong = truth.copy()
    wrong[p] = (wrong[p] + 1) % 4
    clean = [truth.copy() for _ in range(4)]
    # noisy reads: errors scattered OUTSIDE [p-10, p+10] so every one
    # still cleanly carries the wrong base at the disputed column
    noisy = [np.concatenate([mutate_read(wrong[:p - 10], 0.05, rng),
                             wrong[p - 10 : p + 10],
                             mutate_read(wrong[p + 10 :], 0.05, rng)])
             for _ in range(8)]
    segs = clean + noisy
    draft = wrong.copy()

    def refine(seg_pvecs):
        st = _WinState(cns=draft.copy(), votes=np.zeros((200, 9, 5), np.int32),
                       segs=list(segs), active=True, cand=[p],
                       seg_pvecs=seg_pvecs)
        pol = Polisher(PolisherConfig(arrow_rounds=4, window=200))
        pol._refine_windows([st])
        return st.cns

    uniform = refine(None)
    assert uniform[p] == wrong[p], "expected noisy majority to win flat"

    pv = np.stack([params_vector(params_for_read_qv(30.0))] * 4
                  + [params_vector(params_for_read_qv(5.0))] * 8)
    tiered = refine(pv)
    assert tiered[p] == truth[p], "quality tier should rescue the column"


def test_read_fastq_mean_qv(tmp_path):
    from falcon_unzip_tpu.io.fasta import read_fastq
    fq = tmp_path / "r.fastq"
    fq.write_text("@a\nACGT\n+\nIIII\n@b\nACG\n+\n###\n")
    batch, quals = read_fastq(str(fq))
    assert batch.mean_qv is not None
    np.testing.assert_allclose(batch.mean_qv, [40.0, 2.0], atol=0.01)


def test_ingest_fofn_carries_mean_qv(tmp_path):
    from falcon_unzip_tpu.io.fasta import write_fasta
    from falcon_unzip_tpu.io.ingest import read_seqs
    fq = tmp_path / "r.fastq"
    fq.write_text("@a\nACGT\n+\nIIII\n")
    fa = tmp_path / "s.fasta"
    write_fasta(str(fa), [("b", "ACGTT")])
    fofn = tmp_path / "in.fofn"
    fofn.write_text(f"{fq}\n{fa}\n")
    batch = read_seqs(str(fofn))
    assert batch.mean_qv is not None
    np.testing.assert_allclose(batch.mean_qv, [40.0, 0.0], atol=0.01)
