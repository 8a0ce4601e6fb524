"""FastaReader / SampledPanel / sequence-helper oracles ported from the
reference test suite (FastaReaderTest.cpp, SampledPanelTest.cpp,
DnaSequenceTest.cpp equivalents)."""

import os

import pytest

from pangenie_tpu.io.fasta import FastaReader
from pangenie_tpu.io.sequence import contains_undefined, revcomp
from pangenie_tpu.panel.variant import SampledPanel

DATA = "/root/reference/tests/data"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference fixtures not available"
)


@needs_fixtures
def test_fasta_reader_basics():
    f = FastaReader(f"{DATA}/simple-fasta.fa")
    assert f.contains_name("chr01")
    assert f.contains_name("chr02")
    assert not f.contains_name("chr03")
    assert f.get_size_of("chr01") == 1688
    assert f.get_size_of("chr02") == 2135
    with pytest.raises(RuntimeError):
        f.get_size_of("chrNone")
    assert f.get_total_kmers(20) == 3785


@needs_fixtures
def test_fasta_reader_subsequence():
    f = FastaReader(f"{DATA}/simple-fasta.fa")
    assert f.get_subsequence("chr01", 0, 10) == b"CATTTTAAAG"
    assert f.get_subsequence("chr01", 21, 40) == b"CCCAGAGCAGGCAAAACCC"
    assert f.get_subsequence("chr02", 1, 12) == b"CCAACAATTTA"
    assert f.get_subsequence("chr02", 71, 81) == b"TCAAATCACA"
    with pytest.raises(RuntimeError):
        f.get_subsequence("chrNone", 71, 80)


@needs_fixtures
def test_fasta_reader_invalid():
    with pytest.raises(RuntimeError):
        FastaReader(f"{DATA}/broken-fasta.fa")


@needs_fixtures
def test_fasta_reader_extract_name():
    f = FastaReader(f"{DATA}/simple-fasta.fa")
    with pytest.raises(RuntimeError):
        f.extract_name("chrNone")
    assert f.get_names() == ["chr01", "chr02"]

    extracted = f.extract_name("chr01")
    assert f.get_size_of("chr02") == 2135
    with pytest.raises(RuntimeError):
        f.get_size_of("chr01")
    assert extracted.contains_name("chr01")
    assert not f.contains_name("chr01")
    assert f.get_names() == ["chr02"]
    assert extracted.get_names() == ["chr01"]
    assert extracted.get_size_of("chr01") == 1688
    with pytest.raises(RuntimeError):
        f.get_subsequence("chr01", 0, 10)
    with pytest.raises(RuntimeError):
        f.extract_name("chr01")

    f.extract_name("chr02")
    assert f.get_names() == []


def test_sampled_panel_basics():
    path_to_allele = [0, 1, 2, 0, 3, 2, 1, 1, 0, 0, 0]
    s = SampledPanel(list(path_to_allele), 0)
    assert s.path_to_allele == path_to_allele
    assert s.nr_unique_kmers == 0


def test_sampled_panel_specific_alleles():
    s = SampledPanel([0, 1, 1, 0, 3, 2, 1, 0, 1, 4], 9)
    expected = [-1, 0, 0, -1, -1, 1, 0, -1, 0, -1]
    assert s.get_specific_alleles([1, 2]).path_to_allele == expected
    assert s.nr_unique_kmers == 9

    s2 = SampledPanel([0, 1, 1, 0, 3, 2, 1, 0, 1, 4], 1)
    assert s2.get_specific_alleles([]).path_to_allele == [-1] * 10
    assert s2.nr_unique_kmers == 1


def test_sequence_helpers():
    # DnaSequenceTest equivalents (the 4-bit packing is a reference
    # implementation detail; semantics live in these helpers)
    assert revcomp(b"ACGTTG") == b"CAACGT"
    assert revcomp(b"A") == b"T"
    assert contains_undefined(b"ACGNNT")
    assert not contains_undefined(b"ACGT")
