"""VariantBubble oracles ported from the reference test suite
(reference tests/VariantTest.cpp): combine/separate semantics, allele
projection, uncovered/undefined alleles, panel separation, statistics."""

import numpy as np
import pytest

from pangenie_tpu.kmers.unique import UniqueKmersRecord
from pangenie_tpu.panel.variant import (
    GenotypeLikelihoods,
    SampledPanel,
    VariantBubble,
)


def var(lf, rf, chrom, start, end, alleles, paths):
    return VariantBubble(
        lf.encode(), rf.encode(), chrom, start, end,
        [a.encode() for a in alleles], paths,
    )


def test_basic_combine():
    """VariantTest.cpp 'Variant testcase 1'"""
    v1 = var("AAA", "TAC", "chr1", 10, 14, ["ATGC", "ATT"], [0, 1])
    v2 = var("GCT", "CCC", "chr1", 15, 16, ["A", "G"], [1, 0])
    assert v1.nr_of_alleles() == 2
    assert v1.get_allele_string(0) == "ATGC"
    assert v2.get_allele_string(1) == "G"

    v1.combine_variants(v2)
    assert v1.get_allele_string(0) == "ATGCTA"
    assert v1.get_allele_string(1) == "ATGCTG"
    assert v1.get_allele_string(2) == "ATTTA"
    assert v1.nr_of_alleles() == 3
    assert v1.is_combined()

    v1.add_flanking_sequence()
    assert v1.get_allele_string(0) == "AAAATGCTACCC"
    assert v1.get_allele_string(1) == "AAAATGCTGCCC"
    assert v1.get_allele_string(2) == "AAAATTTACCC"
    v1.remove_flanking_sequence()
    assert v1.get_allele_string(0) == "ATGCTA"


def test_equality():
    """VariantTest.cpp 'Variant operator=='"""
    v1 = var("AAA", "TAC", "chr1", 10, 13, ["ATG", "C"], [0, 1])
    assert v1 != var("GCT", "TTT", "chr1", 10, 13, ["ATG", "C"], [0, 1])
    assert v1 != var("AAA", "TAC", "chr1", 10, 13, ["ATG", "CG"], [0, 1])
    assert v1 != var("AAA", "TAC", "chr2", 10, 13, ["ATG", "CG"], [0, 1])
    assert v1 != var("AAA", "TAC", "chr1", 10, 13, ["ATG", "C"], [1, 0])
    v7 = var("AAA", "TAC", "chr1", 10, 13, ["ATG", "C"], [0, 1])
    assert v1 == v7
    v7.add_flanking_sequence()
    assert v1 != v7


def test_invalid_construction():
    """VariantTest.cpp 'Variant invalid1'"""
    with pytest.raises(RuntimeError):
        var("AAA", "TTAA", "chr1", 10, 14, ["ATGC", "ATT"], [0, 1])
    with pytest.raises(RuntimeError):
        var("AAA", "TAA", "chr1", 10, 11, ["ATGC", "ATT"], [0, 1])
    with pytest.raises(RuntimeError):
        var("AAA", "TAA", "chr1", 10, 14, ["ATGC", "ATT"], [0, 2])
    with pytest.raises(RuntimeError):
        var("AAA", "TAA", "chr1", 14, 10, ["ATGC", "ATT"], [0, 1])


def test_combine_invalid():
    """VariantTest.cpp 'Variant combine_variants_invalid'"""
    v1 = var("AAA", "TAC", "chr1", 10, 14, ["ATGC", "ATT"], [0, 1])
    v2 = var("TGCT", "CCCC", "chr1", 15, 16, ["A", "G"], [1, 0])
    with pytest.raises(RuntimeError):
        v1.combine_variants(v2)
    assert not v1.is_combined()
    v3 = var("CCC", "TTT", "chr2", 17, 18, ["A", "G"], [1, 0])
    with pytest.raises(RuntimeError):
        v2.combine_variants(v3)
    assert not v2.is_combined()


def test_combine_three():
    """VariantTest.cpp 'Variant combine_variants'"""
    v1 = var("ATGA", "CTGA", "chr2", 4, 5, ["A", "T"], [0, 0, 1, 1])
    v2 = var("AACT", "ACTG", "chr2", 7, 10, ["GAG", "ACC"], [0, 0, 1, 1])
    v3 = var("GACT", "GGAA", "chr2", 13, 14, ["G", "GTC"], [0, 0, 1, 0])
    v1.combine_variants(v2)
    v1.combine_variants(v3)
    assert v1.nr_of_alleles() == 3
    assert v1.nr_of_paths() == 4
    assert v1.get_allele_string(0) == "ACTGAGACTG"
    assert v1.get_allele_string(1) == "TCTACCACTG"
    assert v1.get_allele_string(2) == "TCTACCACTGTC"
    assert v1.chromosome == "chr2"
    assert v1.get_start_position() == 4
    assert v1.get_end_position() == 14
    assert [v1.get_allele_on_path(p) for p in range(4)] == [0, 0, 2, 1]


def test_separate_variants():
    """VariantTest.cpp 'Variant separate_variants'"""
    v1 = var("AAA", "TAC", "chr1", 10, 14, ["ATGC", "ATT"], [0, 0, 1])
    v2 = var("GCT", "CCC", "chr1", 15, 16, ["A", "G"], [0, 1, 0])
    v3 = var("ACC", "GGC", "chr1", 18, 19, ["C", "CTA"], [0, 1, 1])
    v4 = var("AAA", "TAC", "chr1", 10, 14, ["ATGC", "ATT"], [0, 0, 1])

    v1.combine_variants(v2)
    singles, _ = v1.separate_variants()
    assert len(singles) == 2
    assert singles[0] == v4
    assert singles[1] == v2

    v1.combine_variants(v3)
    singles, _ = v1.separate_variants()
    assert [singles[0], singles[1], singles[2]] == [v4, v2, v3]

    v1.add_flanking_sequence()
    singles, _ = v1.separate_variants()
    assert [singles[0], singles[1], singles[2]] == [v4, v2, v3]

    singles, _ = v4.separate_variants()
    assert singles == [v4]


def test_separate_variants_likelihoods():
    """VariantTest.cpp 'Variant separate_variants_likelihoods'"""
    v1 = var("ATGA", "CTGA", "chr2", 4, 5, ["A", "T"], [0, 0, 1, 1])
    v2 = var("AACT", "ACTG", "chr2", 7, 10, ["GAG", "ACC"], [0, 0, 1, 1])
    v3 = var("GACT", "GGAA", "chr2", 13, 14, ["G", "GTC"], [0, 0, 1, 0])
    v4 = var("ATGA", "CTGA", "chr2", 4, 5, ["A", "T"], [0, 0, 1, 1])

    g = GenotypeLikelihoods()
    for (a, b), val in [((0, 0), 0.05), ((0, 1), 0.05), ((1, 1), 0.0),
                        ((0, 2), 0.3), ((1, 2), 0.5), ((2, 2), 0.1)]:
        g.add_to_likelihood(a, b, val)
    g.haplotype_1 = 0
    g.haplotype_2 = 2

    u = UniqueKmersRecord(0, [0, 0, 2, 1])
    for _ in range(3):
        u.insert_kmer(20, [0])
    for _ in range(9):
        u.insert_kmer(20, [1])
    for _ in range(2):
        u.insert_kmer(20, [2])

    v1.combine_variants(v2)
    v1.combine_variants(v3)
    singles, genotypes = v1.separate_variants(g)
    stats = v1.variant_statistics(u)
    assert [singles[0], singles[1], singles[2]] == [v4, v2, v3]
    assert len(genotypes) == 3
    assert len(stats) == 3

    expected = [[0.05, 0.35, 0.6], [0.05, 0.35, 0.6], [0.1, 0.8, 0.1]]
    for i in range(3):
        got = [float(x) for x in genotypes[i].get_all_likelihoods(2)]
        assert np.allclose(got, expected[i], atol=1e-12)
        assert (genotypes[i].haplotype_1, genotypes[i].haplotype_2) == (0, 1)
        assert stats[i].nr_unique_kmers == 14

    expected_counts = [{0: 3, 1: 11}, {0: 3, 1: 11}, {0: 12, 1: 2}]
    expected_alleles = [["A", "T"], ["GAG", "ACC"], ["G", "GTC"]]
    for i in range(3):
        assert stats[i].kmer_counts == expected_counts[i]
        assert singles[i].get_allele_string(0) == expected_alleles[i][0]
        assert singles[i].get_allele_string(1) == expected_alleles[i][1]


def test_separate_single():
    """VariantTest.cpp 'Variant separate_variants_single'"""
    v = var("ATGA", "CTGA", "chr2", 4, 5, ["A", "T"], [0, 0, 1, 1])
    g = GenotypeLikelihoods()
    g.add_to_likelihood(0, 0, 0.1)
    g.add_to_likelihood(0, 1, 0.7)
    g.add_to_likelihood(1, 1, 0.2)

    u = UniqueKmersRecord(0, [0, 0, 1, 1])
    for _ in range(10):
        u.insert_kmer(20, [0, 1])
    for _ in range(6):
        u.insert_kmer(30, [1])

    singles, genotypes = v.separate_variants(g)
    stats = v.variant_statistics(u)
    assert singles == [v]
    assert float(genotypes[0].get_genotype_likelihood(0, 1)) == pytest.approx(0.7)
    assert stats[0].kmer_counts == {0: 10, 1: 16}

    v.add_flanking_sequence()
    singles, genotypes = v.separate_variants(g)
    assert len(singles) == 1
    v.remove_flanking_sequence()
    assert singles[0] == v
    assert stats[0].nr_unique_kmers == 16


def test_separate_single_uncovered_ref():
    """VariantTest.cpp 'Variant separate_variants_single2'"""
    v = var("ATGA", "CTGA", "chr2", 4, 5, ["A", "T"], [1, 1])
    u = UniqueKmersRecord(0, [1, 1])
    u.insert_kmer(20, [0])
    u.insert_kmer(20, [0])
    for _ in range(4):
        u.insert_kmer(20, [1])
    g = GenotypeLikelihoods()
    g.add_to_likelihood(0, 0, 0.1)
    singles, _ = v.separate_variants(g)
    stats = v.variant_statistics(u)
    assert singles == [v]
    assert stats[0].nr_unique_kmers == 6
    assert stats[0].kmer_counts == {0: -1, 1: 4}


def test_separate_single_long_flanks():
    """VariantTest.cpp 'Variant separate_variants_single3'"""
    v = var("AAAAAAAAAAAGCCTTTTAACTACTGAAAG", "AAAAAAAAAAAAAAGCACAAGGAAGAAATT",
            "chr16", 45143, 45144, ["T", "TA"], [0, 0, 1, 0, 0, 0, 0, 0, 0, 0])
    v.add_flanking_sequence()
    singles, _ = v.separate_variants()
    assert len(singles) == 1
    v.remove_flanking_sequence()
    assert singles[0] == v


def test_uncovered_alleles():
    """VariantTest.cpp 'Variant uncovered_alleles' — merging collapses
    to observed path pairs; separation restores all alleles."""
    v1 = var("AAA", "TCA", "chr1", 4, 5, ["A", "T", "G"], [0, 0])
    v2 = var("AAT", "AAG", "chr1", 6, 7, ["C", "T"], [0, 0])
    v3 = var("CAA", "CCC", "chr1", 9, 10, ["G", "A"], [0, 0])
    v4 = var("AAA", "TCA", "chr1", 4, 5, ["A", "T", "G"], [0, 0])

    v1.combine_variants(v2)
    v1.combine_variants(v3)
    assert v1.nr_of_alleles() == 1
    assert v1.get_allele_string(0) == "ATCAAG"

    singles, _ = v1.separate_variants()
    assert len(singles) == 3
    assert [s.nr_of_alleles() for s in singles] == [3, 2, 2]
    assert [singles[0], singles[1], singles[2]] == [v4, v2, v3]


def test_uncovered_single():
    v1 = var("AAA", "TTT", "chr1", 5, 6, ["A", "G", "T"], [0, 0, 1, 0])
    v2 = var("AAA", "TTT", "chr1", 5, 6, ["A", "G", "T"], [0, 0, 1, 0])
    singles, _ = v1.separate_variants()
    assert singles[0] == v2


def test_nr_missing_alleles():
    v1 = var("AAA", "TTT", "chr1", 5, 6, ["A", "GNN", "T"], [0, 1, 1, 2])
    assert v1.nr_missing_alleles() == 2
    v2 = var("AAAN", "TTTN", "chr1", 5, 6, ["A", "G", "T"], [0, 0, 1, 0])
    assert v2.nr_missing_alleles() == 0
    v2.add_flanking_sequence()
    assert v2.nr_missing_alleles() == 4


def test_combine_combined():
    """VariantTest.cpp 'Variant combine_combined'"""
    v1 = var("AAA", "TCA", "chr1", 4, 5, ["A", "T", "G"], [0, 0])
    v2 = var("AAT", "AAG", "chr1", 6, 7, ["C", "T"], [0, 1])
    v3 = var("CAA", "CCC", "chr1", 9, 10, ["G", "A"], [0, 0])
    v4 = var("AAA", "TCA", "chr1", 4, 5, ["A", "T", "G"], [0, 0])
    v5 = var("AAT", "AAG", "chr1", 6, 7, ["C", "T"], [0, 1])

    v2.combine_variants(v3)
    v1.combine_variants(v2)
    assert v1.nr_of_alleles() == 2
    assert v1.get_allele_string(0) == "ATCAAG"
    assert v1.get_allele_string(1) == "ATTAAG"

    singles, _ = v1.separate_variants()
    assert [singles[0], singles[1], singles[2]] == [v4, v5, v3]


def test_combine_combined2():
    """VariantTest.cpp 'Variant combine_combined2'"""
    v1 = var("AAA", "TGC", "chr1", 4, 5, ["A", "G"],
             [0, 0, 0, 0, 0, 0, 1, 0, 0, 0])
    v2 = var("AAT", "CCG", "chr1", 6, 7, ["G", "C"],
             [0, 0, 0, 0, 0, 0, 1, 0, 0, 0])
    v3 = var("GCC", "GGG", "chr1", 9, 10, ["G", "C"],
             [0, 0, 0, 0, 0, 0, 0, 1, 0, 0])
    v4 = var("AAA", "TGC", "chr1", 4, 5, ["A", "G"],
             [0, 0, 0, 0, 0, 0, 1, 0, 0, 0])

    v1.combine_variants(v2)
    v1.combine_variants(v3)
    assert v1.nr_of_alleles() == 3
    assert v1.get_allele_string(0) == "ATGCCG"
    assert v1.get_allele_string(1) == "ATGCCC"
    assert v1.get_allele_string(2) == "GTCCCG"

    g = GenotypeLikelihoods()
    g.add_to_likelihood(0, 0, 0.9)
    g.add_to_likelihood(0, 1, 0.05)
    g.add_to_likelihood(0, 2, 0.05)
    g.haplotype_1 = 0
    g.haplotype_2 = 2

    u = UniqueKmersRecord(0, [0, 0, 0, 0, 0, 0, 2, 1, 0])
    for _ in range(10):
        u.insert_kmer(20, [0])
    for _ in range(2):
        u.insert_kmer(30, [1])
    for _ in range(4):
        u.insert_kmer(25, [2])

    singles, genotypes = v1.separate_variants(g)
    stats = v1.variant_statistics(u)
    assert [singles[0], singles[1], singles[2]] == [v4, v2, v3]
    assert float(genotypes[0].get_genotype_likelihood(0, 0)) == pytest.approx(0.95)
    assert float(genotypes[0].get_genotype_likelihood(0, 1)) == pytest.approx(0.05)
    assert (genotypes[0].haplotype_1, genotypes[0].haplotype_2) == (0, 1)
    assert (genotypes[1].haplotype_1, genotypes[1].haplotype_2) == (0, 1)
    assert (genotypes[2].haplotype_1, genotypes[2].haplotype_2) == (0, 0)
    expected_counts = [{0: 12, 1: 4}, {0: 12, 1: 4}, {0: 14, 1: 2}]
    for i in range(3):
        assert stats[i].kmer_counts == expected_counts[i]


def test_get_paths_of_allele():
    v1 = var("AAA", "TTA", "chr1", 10, 14, ["ATGC", "ATT", "TT"], [0, 1, 2])
    assert v1.get_paths_of_allele(0) == [0]
    assert v1.get_paths_of_allele(1) == [1]
    assert v1.get_paths_of_allele(2) == [2]
    v2 = var("AAA", "TTA", "chr1", 10, 14, ["ATGC", "ATT"], [0, 1, 0, 1, 1])
    assert v2.get_paths_of_allele(0) == [0, 2]
    assert v2.get_paths_of_allele(1) == [1, 3, 4]


def test_allele_frequencies():
    v1 = var("AAA", "TTA", "chr1", 10, 14, ["ATGC", "ATT", "TT"], [0, 1, 2])
    assert v1.allele_frequency(0, False) == pytest.approx(1 / 3)
    assert v1.allele_frequency(0, True) == pytest.approx(0.0)
    assert v1.allele_frequency(1, True) == pytest.approx(0.5)

    v2 = var("AAA", "TGC", "chr1", 4, 5, ["A", "G"],
             [0, 0, 0, 0, 0, 0, 1, 0, 0, 0])
    assert v2.allele_frequency(0, False) == pytest.approx(0.9)
    assert v2.allele_frequency(1, True) == pytest.approx(1 / 9)

    v3 = var("AAA", "TGC", "chr1", 4, 5, ["A", "G", "C"],
             [0, 0, 1, 0, 2, 0, 1, 0, 0, 0])
    assert np.allclose(v3.all_allele_frequencies(False), [0.7, 0.2, 0.1])
    assert np.allclose(v3.all_allele_frequencies(True), [6 / 9, 2 / 9, 1 / 9])


def test_separate_likelihoods_uncovered():
    """VariantTest.cpp 'Variant separate_variants_likelihoods_uncovered'"""
    v1 = var("ATGA", "CTGA", "chr2", 4, 5, ["A", "T"], [0, 1])
    v2 = var("AACT", "ACTG", "chr2", 7, 8, ["G", "C", "T"], [0, 2])

    g = GenotypeLikelihoods()
    g.add_to_likelihood(0, 0, 0.05)
    g.add_to_likelihood(0, 1, 0.05)
    g.add_to_likelihood(1, 1, 0.9)
    g.haplotype_1 = 0
    g.haplotype_2 = 0

    u = UniqueKmersRecord(0, [0, 1])
    for _ in range(3):
        u.insert_kmer(20, [0])
    for _ in range(9):
        u.insert_kmer(20, [1])

    v1.combine_variants(v2)
    singles, genotypes = v1.separate_variants(g)
    stats = v1.variant_statistics(u)
    assert len(singles) == 2

    expected = [[0.05, 0.05, 0.9], [0.05, 0.0, 0.0, 0.05, 0.0, 0.9]]
    nr_alleles = [2, 3]
    for i in range(2):
        got = [float(x) for x in genotypes[i].get_all_likelihoods(nr_alleles[i])]
        assert np.allclose(got, expected[i], atol=1e-12)
        assert (genotypes[i].haplotype_1, genotypes[i].haplotype_2) == (0, 0)
        assert stats[i].nr_unique_kmers == 12

    assert stats[0].kmer_counts == {0: 3, 1: 9}
    assert stats[1].kmer_counts == {0: 3, 1: -1, 2: 9}
    assert [singles[1].get_allele_string(a) for a in range(3)] == ["G", "C", "T"]


def test_separate_likelihoods_single_uncovered():
    v = var("ATGA", "CTGA", "chr1", 7, 8, ["A", "T"], [1, 1])
    g = GenotypeLikelihoods()
    g.add_to_likelihood(1, 1, 1.0)
    g.haplotype_1 = 1
    g.haplotype_2 = 1

    u = UniqueKmersRecord(0, [1, 1])
    u.insert_kmer(20, [0])
    u.insert_kmer(30, [1])
    u.insert_kmer(25, [1])
    u.insert_kmer(20, [1])

    singles, genotypes = v.separate_variants(g)
    assert len(singles) == 1
    assert float(genotypes[0].get_genotype_likelihood(1, 1)) == pytest.approx(1.0)

    stats = v.variant_statistics(u)
    assert stats[0].nr_unique_kmers == 4
    assert stats[0].kmer_counts == {0: -1, 1: 3}
    assert stats[0].coverage == 0


def test_is_undefined_allele():
    v1 = var("AAN", "TAC", "chr1", 10, 14, ["ATGC", "ATT"], [0, 1])
    assert not v1.is_undefined_allele(0)
    v1.add_flanking_sequence()
    # flanks never make an allele undefined
    assert not v1.is_undefined_allele(0)
    v2 = var("GCT", "CCC", "chr1", 15, 17, ["AN", "G"], [1, 0])
    assert v2.is_undefined_allele(0)
    assert not v2.is_undefined_allele(1)


def test_combine_undefined_flanks():
    v1 = var("ATGA", "CNGA", "chr2", 4, 5, ["A", "T"], [0, 0, 1, 1])
    v2 = var("AACN", "ACTG", "chr2", 7, 10, ["GAG", "ACC"], [0, 0, 1, 1])
    v3 = var("GACT", "GGAA", "chr2", 13, 14, ["G", "GTC"], [0, 0, 1, 0])
    v1.combine_variants(v2)
    v1.combine_variants(v3)
    assert v1.get_allele_string(0) == "ACNGAGACTG"
    assert v1.get_allele_string(1) == "TCNACCACTG"
    assert v1.get_allele_string(2) == "TCNACCACTGTC"
    # inner flanks (from reference sequence between bubbles) don't count
    # as undefined content of the variant alleles
    for a in range(3):
        assert not v1.is_undefined_allele(a)
    v1.add_flanking_sequence()
    singles, _ = v1.separate_variants()
    for s in singles:
        assert not s.is_undefined_allele(0)
        assert not s.is_undefined_allele(1)


def test_combine_undefined_alleles():
    v1 = var("ATGA", "CTGA", "chr2", 4, 5, ["A", "T"], [0, 0, 1, 1])
    v2 = var("AACT", "ACTG", "chr2", 7, 10, ["GNG", "ACC"], [0, 0, 1, 1])
    v1.combine_variants(v2)
    assert v1.nr_of_alleles() == 2
    assert v1.is_undefined_allele(0)
    assert not v1.is_undefined_allele(1)
    v1.add_flanking_sequence()
    singles, _ = v1.separate_variants()
    assert not singles[0].is_undefined_allele(0)
    assert singles[1].is_undefined_allele(0)
    assert not singles[1].is_undefined_allele(1)


def test_separate_identical_alleles():
    """VariantTest.cpp 'Variant separate_variants_identical'"""
    v1 = var("AAA", "TAC", "chr1", 10, 14, ["ATGC", "ATGC"], [0, 0, 1])
    v2 = var("GCT", "CCN", "chr1", 15, 16, ["A", "A"], [0, 1, 0])
    v3 = var("ACC", "GGC", "chr1", 18, 19, ["N", "N"], [0, 1, 1])
    v4 = var("AAA", "TAC", "chr1", 10, 14, ["ATGC", "ATGC"], [0, 0, 1])

    v1.combine_variants(v2)
    singles, _ = v1.separate_variants()
    assert [singles[0], singles[1]] == [v4, v2]

    v1.combine_variants(v3)
    singles, _ = v1.separate_variants()
    assert [singles[0], singles[1], singles[2]] == [v4, v2, v3]

    v1.add_flanking_sequence()
    singles, _ = v1.separate_variants()
    assert [singles[0], singles[1], singles[2]] == [v4, v2, v3]


def test_separate_panel():
    """VariantTest.cpp 'Variant separate_variants_panel'"""
    v1 = var("ATGA", "CTGA", "chr2", 4, 5, ["A", "T"], [0, 0, 1, 1])
    v2 = var("AACT", "ACTG", "chr2", 7, 10, ["GAG", "ACC"], [0, 1, 1, 1])
    v3 = var("GACT", "GGAA", "chr2", 13, 14, ["G", "GTC"], [0, 0, 1, 0])
    v1.combine_variants(v2)
    v1.combine_variants(v3)

    panel = SampledPanel([0, 2, 1, 3, 3, 2, 0, 1], 20)
    singles, panels = v1.separate_variants_panel(panel)
    expected = [
        [0, 1, 0, 1, 1, 1, 0, 0],
        [0, 1, 1, 1, 1, 1, 0, 1],
        [0, 0, 0, 1, 1, 0, 0, 0],
    ]
    assert len(panels) == 3
    for i in range(3):
        assert panels[i].path_to_allele == expected[i]
        assert panels[i].nr_unique_kmers == 20


def test_separate_panel_single():
    v = var("ATGA", "CTGA", "chr2", 4, 5, ["A", "T"], [0, 0, 1, 1])
    panel = SampledPanel([0, 1, 1, 0, 1, 0, 0, 1, 0, 1, 1, 1, 0], 13)
    singles, panels = v.separate_variants_panel(panel)
    assert len(panels) == 1
    assert panels[0].path_to_allele == [0, 1, 1, 0, 1, 0, 0, 1, 0, 1, 1, 1, 0]
    assert panels[0].nr_unique_kmers == 13


def test_separate_panel_undefined():
    """VariantTest.cpp 'Variant separate_variants_panel2'"""
    v1 = var("AAAA", "CCCC", "chr1", 16636, 16637, ["T", "TA", "TAAA", "NNN"],
             [0, 1, 1, 3, 2, 3])
    v2 = var("AAAA", "CCCC", "chr1", 16638, 16639, ["A", "T", "NN", "NNN"],
             [2, 1, 2, 3, 0, 1])
    v1.combine_variants(v2)

    path_to_allele = [v1.get_allele_on_path(i) for i in range(v1.nr_of_paths())]
    panel = SampledPanel(path_to_allele, 3)
    singles, panels = v1.separate_variants_panel(panel)
    assert panels[0].path_to_allele == [0, 1, 1, 3, 2, 3]
    assert panels[1].path_to_allele == [2, 1, 2, 3, 0, 1]
    assert panels[0].nr_unique_kmers == 3
    assert panels[1].nr_unique_kmers == 3
