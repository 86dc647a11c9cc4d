"""Native C++ FASTX parser == pure-Python reader."""
import numpy as np
import pytest

from falcon_unzip_tpu.io import native
from falcon_unzip_tpu.io.fasta import read_fasta, write_fasta, write_fastq
from falcon_unzip_tpu.utils.simulate import random_genome
from falcon_unzip_tpu.seq import decode

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_native_fasta_matches_python(tmp_path):
    seqs = [random_genome(int(l), s) for s, l in
            enumerate((100, 250, 77, 1024))]
    path = str(tmp_path / "x.fa")
    write_fasta(path, ((f"s{i}", decode(s)) for i, s in enumerate(seqs)))
    a = read_fasta(path)
    b = native.read_fasta_native(path)
    assert a.names == b.names
    assert np.array_equal(a.lengths, b.lengths)
    for i in range(len(a)):
        assert np.array_equal(a.row(i), b.row(i))


def test_native_fastq(tmp_path):
    seqs = [random_genome(50, s + 9) for s in range(3)]
    path = str(tmp_path / "x.fq")
    write_fastq(path, ((f"q{i}", decode(s), "I" * len(s))
                       for i, s in enumerate(seqs)))
    b = native.read_fasta_native(path)
    assert len(b) == 3
    for i in range(3):
        assert np.array_equal(b.row(i), seqs[i])
