"""KmerCounter oracles ported from the reference test suite
(reference tests/KmerCounterTest.cpp), incl. the committed .jf
database fixtures."""

import os

import pytest

from pangenie_tpu.kmers.counter import ExactKmerCounter

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference fixtures not available"
)


def test_count_all_kmers():
    """KmerCounterTest.cpp 'JellyfishCounter'"""
    counter = ExactKmerCounter.count_file(f"{DATA}/reads.fa", 10)
    read = "ATGCTGTAAAAAAACGGC"
    for i in range(len(read) - 9):
        assert counter.get_kmer_abundance(read[i : i + 10]) == 1


def test_count_intersection_mode():
    """KmerCounterTest.cpp 'JellyfishCounter_if' (PRIME+UPDATE)."""
    counter = ExactKmerCounter.count_file_primed(
        f"{DATA}/reads.fa", [f"{DATA}/kmerfile.fa"], 10
    )
    assert counter.get_kmer_abundance("ATGCTGTAAA") == 1
    assert counter.get_kmer_abundance("TGCTGTAAAA") == 1
    kmers = "GCTGTAAAAAAACGGC"
    for i in range(len(kmers) - 9):
        assert counter.get_kmer_abundance(kmers[i : i + 10]) == 0


def test_jellyfish_reader():
    """KmerCounterTest.cpp 'JellyfishReader' — committed .jf fixture."""
    from pangenie_tpu.kmers.jf_reader import read_jf

    reader = read_jf(f"{DATA}/reads.jf", 10)
    read = "ATGCTGTAAAAAAACGGC"
    for i in range(len(read) - 9):
        assert reader.get_kmer_abundance(read[i : i + 10]) == 1

    # counted without -C: must be rejected
    with pytest.raises(RuntimeError):
        read_jf(f"{DATA}/reads.no-canonical.jf", 10)

    # wrong kmer size
    with pytest.raises(RuntimeError):
        read_jf(f"{DATA}/reads.jf", 11)
