"""Remaining HMM oracles ported from the reference test suite
(reference tests/HMMTest.cpp) — hand-computed likelihoods with injected
probability-table entries."""

import numpy as np

from pangenie_tpu.kmers.unique import UniqueKmersRecord
from pangenie_tpu.model.probabilities import ProbabilityTable
from pangenie_tpu.hmm.genotyping import PairHMM


def collect(hmm, pairs=((0, 0), (0, 1), (1, 1))):
    out = []
    for result in hmm.get_genotyping_result():
        for a, b in pairs:
            out.append(float(result.get_genotype_likelihood(a, b)))
    return out


def rec(pos, path_to_allele, kmers=(), undefined=(), coverage=0):
    r = UniqueKmersRecord(pos, path_to_allele)
    for a in undefined:
        r.set_undefined_allele(a)
    for count, alleles in kmers:
        r.insert_kmer(count, alleles)
    r.set_coverage(coverage)
    return r


def probs_cov0(entries, count_max=21):
    p = ProbabilityTable(0, 1, count_max, 0.0)
    for count, cn in entries.items():
        p.modify_probability(0, count, cn)
    return p


def test_undefined_alleles1():
    """HMMTest.cpp 'HMM undefined_alleles1'"""
    u1 = rec(2000, [0, 1], kmers=[(10, [0])], undefined=[0])
    u2 = rec(3000, [1, 0], kmers=[(20, [0]), (1, [1])])
    probs = probs_cov0({10: (0.1, 0.9, 0.1), 20: (0.01, 0.01, 0.9),
                        1: (0.9, 0.3, 0.1)})
    hmm = PairHMM([u1, u2], probs, True, True, 446.287102628, False, 0.25)
    expected = [0.02396597038, 0.52185641164, 0.45417761795,
                0.97855858361, 0.01875778106, 0.00268363531]
    assert np.allclose(collect(hmm), expected, atol=1e-9)

    # re-projection onto defined alleles
    defined = [[1], [0, 1]]
    expected_specific = [1.0, 0.0, 0.0,
                         0.97855858361, 0.01875778106, 0.00268363531]
    got = []
    for i, result in enumerate(hmm.get_genotyping_result()):
        final = result.get_specific_likelihoods(defined[i])
        for a, b in ((0, 0), (0, 1), (1, 1)):
            got.append(float(final.get_genotype_likelihood(a, b)))
    assert np.allclose(got, expected_specific, atol=1e-9)


def test_undefined_alleles2():
    """HMMTest.cpp 'HMM undefined_alleles2' — first column all-REF."""
    u1 = rec(2000, [0, 0])
    u2 = rec(3000, [1, 0], kmers=[(20, [1]), (1, [0])], undefined=[0])
    probs = probs_cov0({20: (0.01, 0.01, 0.9), 1: (0.9, 0.3, 0.1)})
    hmm = PairHMM([u1, u2], probs, True, True, 446.287102628, False, 0.25)
    expected = [0.0, 0.0, 0.0,
                0.11813512445, 0.1617937574, 0.72007111814]
    assert np.allclose(collect(hmm), expected, atol=1e-9)

    defined = [[0, 1], [0]]
    expected_specific = [0.0, 0.0, 0.0, 1.0, 0.0, 0.0]
    got = []
    for i, result in enumerate(hmm.get_genotyping_result()):
        final = result.get_specific_likelihoods(defined[i])
        for a, b in ((0, 0), (0, 1), (1, 1)):
            got.append(float(final.get_genotype_likelihood(a, b)))
    assert np.allclose(got, expected_specific, atol=1e-9)


def test_only_undefined_alleles():
    """HMMTest.cpp 'HMM only_undefined_alleles' — every column skipped."""
    u1 = rec(2000, [0, 1], kmers=[(10, [0]), (10, [1])], undefined=[0, 1])
    u2 = rec(3000, [1, 0], kmers=[(20, [0]), (1, [1])], undefined=[0, 1])
    probs = probs_cov0({10: (0.1, 0.9, 0.1), 20: (0.01, 0.01, 0.9),
                        1: (0.9, 0.3, 0.1)})
    hmm = PairHMM([u1, u2], probs, True, False, 446.287102628, False, 0.25)
    assert collect(hmm) == [0.0] * 6


def test_no_alt_allele():
    """HMMTest.cpp 'HMM no_alt_allele' — only-REF column is skipped;
    includes a kmer on BOTH alleles and a kmer on NO allele."""
    u = rec(2000, [0, 0, 0], kmers=[(10, [0, 1]), (5, [])])
    probs = probs_cov0({10: (0.1, 0.2, 0.9), 5: (0.3, 0.4, 0.1)}, 11)
    hmm = PairHMM([u], probs, True, True, 1.26, False, 0.25)
    result = hmm.get_genotyping_result()[0]
    assert result.get_likeliest_genotype() == (-1, -1)
    assert collect(hmm) == [0.0, 0.0, 0.0]


def test_no_ref_allele():
    """HMMTest.cpp 'HMM no_ref_allele'"""
    u = rec(2000, [1, 1, 1], kmers=[(20, [0, 1]), (10, [])])
    probs = probs_cov0({20: (0.1, 0.2, 0.9), 10: (0.3, 0.4, 0.1)})
    hmm = PairHMM([u], probs, True, True, 1.26, False, 0.25)
    assert np.allclose(collect(hmm), [0.0, 0.0, 1.0], atol=1e-12)


def test_no_unique_kmers():
    """HMMTest.cpp 'HMM no_unique_kmers' — pure transition chain."""
    u1 = rec(2000, [0, 1])
    u2 = rec(3000, [0, 1])
    probs = ProbabilityTable()
    hmm = PairHMM([u1, u2], probs, True, True, 446.287102628, False, 0.25)
    expected = [0.25, 0.5, 0.25, 0.25, 0.5, 0.25]
    assert np.allclose(collect(hmm), expected, atol=1e-9)


def test_no_unique_kmers2():
    """HMMTest.cpp 'HMM no_unique_kmers2'"""
    u1 = rec(2000, [0, 0, 1])
    u2 = rec(3000, [0, 1, 1])
    probs = ProbabilityTable()
    hmm = PairHMM([u1, u2], probs, True, True, 1070.02483182, False, 0.25)
    expected = [4 / 9, 4 / 9, 1 / 9, 1 / 9, 4 / 9, 4 / 9]
    assert np.allclose(collect(hmm), expected, atol=1e-9)


def test_no_unique_kmers3():
    """HMMTest.cpp 'HMM no_unique_kmers3' — middle column has no kmers."""
    u1 = rec(2000, [0, 1], kmers=[(10, [0]), (10, [1])])
    u2 = rec(3000, [0, 1])
    u3 = rec(4000, [0, 1], kmers=[(10, [0]), (9, [1])])
    probs = probs_cov0({10: (0.1, 0.9, 0.1), 9: (0.1, 0.8, 0.1)})
    hmm = PairHMM([u1, u2, u3], probs, True, True, 446.287102628, False, 0.25)
    expected = [0.00264169937, 0.99471660125, 0.00264169937,
                0.02552917716, 0.94894164567, 0.02552917716,
                0.002961313333, 0.99407737333, 0.002961313333]
    assert np.allclose(collect(hmm), expected, atol=1e-9)
    h1 = [g.haplotype_1 for g in hmm.get_genotyping_result()]
    h2 = [g.haplotype_2 for g in hmm.get_genotyping_result()]
    assert (h1 == [0, 0, 0] and h2 == [1, 1, 1]) or (
        h1 == [1, 1, 1] and h2 == [0, 0, 0]
    )


def test_no_unique_kmers_uniform():
    """HMMTest.cpp 'HMM no_unique_kmers_uniform'"""
    u1 = rec(2000, [0, 1, 1])
    u2 = rec(3000, [0, 0, 1])
    probs = ProbabilityTable()
    hmm = PairHMM([u1, u2], probs, True, True, 1.26, True, 0.25)
    expected = [1 / 9, 4 / 9, 4 / 9, 4 / 9, 4 / 9, 1 / 9]
    assert np.allclose(collect(hmm), expected, atol=1e-9)


def test_only_kmers():
    """HMMTest.cpp 'HMM only_kmers' — uniform transitions."""
    u1 = rec(2000, [0, 1], kmers=[(10, [0]), (12, [1])])
    u2 = rec(3000, [0, 1], kmers=[(1, [0]), (20, [1])])
    u3 = rec(4000, [0, 1], kmers=[(5, [0]), (7, [1])])
    probs = probs_cov0({
        10: (0.05, 0.9, 0.05), 12: (0.1, 0.7, 0.2), 1: (0.9, 0.07, 0.03),
        20: (0.1, 0.2, 0.7), 5: (0.6, 0.3, 0.1), 7: (0.3, 0.4, 0.3),
    })
    hmm = PairHMM([u1, u2, u3], probs, True, True, 1.26, True, 0.25)
    expected = [0.00392156862745098, 0.988235294117647, 0.00784313725490196,
                0.0045385779122541605, 0.0423600605143722, 0.9531013615733737,
                0.06666666666666667, 0.5333333333333333, 0.39999999999999997]
    assert np.allclose(collect(hmm), expected, atol=1e-9)


def test_emissions_zero():
    """HMMTest.cpp 'HMM emissions_zero' — all-zero emission matrix
    becomes uniform; middle all-ALT column is kept."""
    u1 = rec(1000, [0, 1], kmers=[(10, [0]), (10, [1])])
    u2 = rec(2000, [1, 1], kmers=[(0, [1]), (0, [1])])
    u3 = rec(3000, [0, 1], kmers=[(10, [0]), (10, [1])])
    probs = probs_cov0({10: (0.0, 1.0, 0.0), 0: (1.0, 0.0, 0.0)}, 11)
    hmm = PairHMM([u1, u2, u3], probs, True, True, 446.287102628, False, 0.25)
    expected = [0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 1.0, 0.0]
    assert np.allclose(collect(hmm), expected, atol=1e-12)


def test_underflow():
    """HMMTest.cpp 'HMM underflow' — zero-sum columns fall back to
    uniform (recombrate 0 => no recombination)."""
    u1 = rec(1000, [0, 1], kmers=[(10, [0]), (10, [1])])
    u2 = rec(2000, [0, 1], kmers=[(20, [0]), (0, [1])])
    u3 = rec(3000, [0, 1], kmers=[(10, [0]), (10, [1])])
    probs = probs_cov0({10: (0.0, 1.0, 0.0), 20: (0.0, 0.0, 1.0),
                        0: (1.0, 0.0, 0.0)})
    hmm = PairHMM([u1, u2, u3], probs, True, True, 0.0, False, 0.25)
    expected = [0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0]
    assert np.allclose(collect(hmm), expected, atol=1e-12)


def test_neutral_kmers():
    """HMMTest.cpp 'HMM get_genotyping_result_neutral_kmers' — kmers on
    BOTH alleles shift all emissions equally and cancel."""
    u1 = rec(2000, [0, 1],
             kmers=[(10, [0]), (10, [1]), (12, [0, 1]), (5, [0, 1])])
    u2 = rec(3000, [0, 1],
             kmers=[(20, [0]), (1, [1]), (15, [0, 1]), (9, [0, 1])])
    probs = probs_cov0({
        10: (0.1, 0.9, 0.1), 12: (0.05, 0.45, 0.5), 5: (0.4, 0.5, 0.1),
        20: (0.01, 0.01, 0.9), 1: (0.9, 0.3, 0.1), 15: (0.01, 0.49, 0.5),
        9: (0.3, 0.4, 0.3),
    })
    hmm = PairHMM([u1, u2], probs, True, True, 446.287102628, False, 0.25)
    expected = [0.0509465435, 0.9483202731, 0.0007331832,
                0.9678020017, 0.031003181, 0.0011948172]
    assert np.allclose(collect(hmm), expected, atol=1e-9)


def test_only_paths_multiallelic():
    """HMMTest.cpp 'HMM only_paths'"""
    u1 = rec(2000, [0, 2, 1, 1], kmers=[(10, [0]), (10, [1])])
    u2 = rec(3000, [0, 0, 2, 1], kmers=[(20, [0]), (1, [1])])
    probs = probs_cov0({10: (0.1, 0.9, 0.1), 20: (0.01, 0.01, 0.9),
                        1: (0.9, 0.3, 0.1)})
    hmm = PairHMM([u1, u2], probs, True, True, 446.287102628, False, 0.25,
                  only_paths=[0, 3])
    expected = [0.0509465435, 0.9483202731, 0.0007331832,
                0.9678020017, 0.031003181, 0.0011948172]
    assert np.allclose(collect(hmm), expected, atol=1e-9)


def test_only_paths2():
    """HMMTest.cpp 'HMM no_only_paths2' — selected paths carry no kmers."""
    u1 = rec(2000, [0, 1, 2], kmers=[(12, [2])])
    u2 = rec(3000, [0, 1, 2], kmers=[(12, [2])])
    probs = probs_cov0({12: (0.05, 0.8, 0.15)}, 13)
    hmm = PairHMM([u1, u2], probs, True, True, 446.287102628, False, 0.25,
                  only_paths=[0, 1])
    expected = [0.25, 0.5, 0.25, 0.25, 0.5, 0.25]
    assert np.allclose(collect(hmm), expected, atol=1e-9)


def test_combine_results():
    """HMMTest.cpp 'HMM combine_results'"""
    u1 = rec(2000, [0, 1], kmers=[(10, [0]), (10, [1])], coverage=5)
    u2 = rec(3000, [0, 1], kmers=[(20, [0]), (5, [1])], coverage=5)
    probs = ProbabilityTable(5, 10, 30, 0.0)
    probs.modify_probability(5, 10, (0.1, 0.9, 0.1))
    probs.modify_probability(5, 20, (0.01, 0.01, 0.9))
    probs.modify_probability(5, 5, (0.9, 0.3, 0.1))
    hmm1 = PairHMM([u1, u2], probs, True, True, 446.287102628, False, 0.25)
    like1 = collect(hmm1)

    v1 = rec(2000, [0, 1, 2], kmers=[(12, [2])])
    v2 = rec(3000, [0, 1, 2], kmers=[(12, [2])])
    probs2 = probs_cov0({12: (0.05, 0.8, 0.15)}, 13)
    hmm2 = PairHMM([v1, v2], probs2, True, True, 446.287102628, False, 0.25,
                   only_paths=[0, 1])
    like2 = collect(hmm2)

    hmm1.combine_likelihoods(hmm2)
    expected = [a + b for a, b in zip(like1, like2)]
    assert np.allclose(collect(hmm1), expected, atol=1e-12)


def test_normalize_raw_values():
    """HMMTest.cpp 'HMM normalize' — raw likelihoods match the
    reference's unnormalized long double values, then normalize."""
    u1 = rec(2000, [0, 1, 2], kmers=[(12, [2])])
    u2 = rec(3000, [0, 1, 2], kmers=[(12, [2])])
    probs = probs_cov0({12: (0.05, 0.8, 0.15)}, 13)
    hmm = PairHMM([u1, u2], probs, True, True, 446.287102628, False, 0.25,
                  only_paths=[0, 1], normalize=False)
    expected_raw = [0.000625, 0.00125, 0.000625, 0.0125, 0.025, 0.0125]
    assert np.allclose(collect(hmm), expected_raw, rtol=1e-12)

    hmm.normalize()
    expected_norm = [0.25, 0.5, 0.25, 0.25, 0.5, 0.25]
    assert np.allclose(collect(hmm), expected_norm, atol=1e-12)
