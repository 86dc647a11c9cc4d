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
    rng = np.random.default_rng(0)
    truth = random_genome(3000, 1)
    template = mutate_read(truth, 0.02, rng)
    reads = [mutate_read(truth, 0.08, rng) for _ in range(24)]
    fs = FalconSense(ConsensusConfig(min_cov=2))
    cns = fs(template, reads)
    assert len(cns) == len(truth)
    assert np.array_equal(cns, truth)


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
