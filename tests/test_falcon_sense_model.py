"""FalconSense device model: BASELINE config-1 style gate.

'falcon_sense consensus of one contig from a small read subset' --
noisy draft + noisy reads must reconstruct the true sequence, and the
device model must agree with the pure-numpy oracle.
"""
import numpy as np

from falcon_unzip_tpu.models.consensus import ConsensusConfig, FalconSense
from falcon_unzip_tpu.oracle.consensus import falcon_sense as oracle_sense
from falcon_unzip_tpu.utils.simulate import mutate_read, random_genome


def test_device_consensus_recovers_truth():
    """Interior exact recovery; template errors within ~anchor_k of the
    template ENDS are inherently unfixable (alignments are anchored on
    exact k-runs, like DW_banded aligning between k-mer seeds), so the
    outermost 16 columns are excluded from the exactness check."""
    rng = np.random.default_rng(0)
    truth = random_genome(3000, 1)
    template = mutate_read(truth, 0.02, rng)
    reads = [mutate_read(truth, 0.08, rng) for _ in range(24)]
    fs = FalconSense(ConsensusConfig(min_cov=2))
    cns = fs(template, reads)
    assert abs(len(cns) - len(truth)) <= 16
    interior = cns[16:-16].tobytes()
    assert truth.tobytes().find(interior) >= 0, \
        "consensus interior must be an exact substring of the truth"


def test_device_matches_oracle_small():
    rng = np.random.default_rng(3)
    truth = random_genome(400, 4)
    template = mutate_read(truth, 0.02, rng)
    reads = [mutate_read(truth, 0.06, rng) for _ in range(12)]
    fs = FalconSense(ConsensusConfig(min_cov=1))
    dev = fs(template, reads)
    orc = oracle_sense(template, reads, W=256, min_cov=1)
    # oracle aligns whole reads globally; model seeds+windows -- the
    # consensus sequences (not intermediate tags) must agree
    assert np.array_equal(dev, orc)
