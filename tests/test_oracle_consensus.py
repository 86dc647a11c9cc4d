"""Consensus oracle: noisy reads over a template reconstruct the truth."""
import numpy as np

from falcon_unzip_tpu.oracle.consensus import falcon_sense
from falcon_unzip_tpu.utils.simulate import mutate_read, random_genome


def test_consensus_recovers_truth():
    rng = np.random.default_rng(0)
    truth = random_genome(500, 1)
    # the template itself is a noisy draft of the truth
    template = mutate_read(truth, 0.02, rng)
    reads = [mutate_read(truth, 0.08, rng) for _ in range(20)]
    cns = falcon_sense(template, reads, W=256)
    # consensus should equal truth exactly at this depth/error
    assert len(cns) == len(truth)
    assert np.array_equal(cns, truth)


def test_consensus_low_coverage_keeps_template():
    truth = random_genome(100, 2)
    cns = falcon_sense(truth, [], W=64, min_cov=1)
    assert np.array_equal(cns, truth)
