"""Probability / histogram / sampling-cost oracles ported from the
reference test suite (HistogramTest.cpp, ProbabilityTableTest.cpp,
CopyNumberTest.cpp, SamplingEmissionsTest.cpp,
SamplingTransitionsTest.cpp, TransitionProbabilityComputerTest.cpp)."""

import math
import os

import numpy as np
import pytest

from pangenie_tpu.hmm.columns import transition_probs
from pangenie_tpu.hmm.sampling import (
    sampling_emission_costs,
    sampling_transition_cost,
)
from pangenie_tpu.kmers.histogram import (
    Histogram,
    compute_kmer_coverage_from_peaks,
)
from pangenie_tpu.kmers.unique import UniqueKmersRecord
from pangenie_tpu.model.probabilities import ProbabilityTable

DATA = "/root/reference/tests/data"


def test_histogram_peaks():
    histo = Histogram(10)
    for v in [0, 0, 1, 1, 1, 1, 2, 2, 3]:
        histo.add_value(v)
    peak_ids, peak_values = histo.find_peaks()
    assert peak_ids == [1]
    assert peak_values == [4]


@pytest.mark.skipif(not os.path.isdir(DATA), reason="fixtures unavailable")
@pytest.mark.parametrize(
    "filename,expected",
    [("test.histo", 56), ("test2.histo", 26), ("test3.histo", 60),
     ("test4.histo", 42)],
)
def test_histogram_coverage_fixtures(filename, expected):
    """HistogramTest.cpp cases 2-5: real .histo files, largest peak."""
    histo = Histogram.from_file(f"{DATA}/{filename}", 10000)
    histo.smooth_histogram()
    peak_ids, peak_values = histo.find_peaks()
    assert compute_kmer_coverage_from_peaks(peak_ids, peak_values, True) == expected


def test_probability_table_values():
    """ProbabilityTableTest.cpp cases 1+2 (in-table and fallback)."""
    for args in [(5, 6, 1, 0.0), (4, 7, 2, 0.0)]:
        p = ProbabilityTable(*args)
        assert np.allclose(
            p.get_probability(5, 0), [0.99, 0.08208499862, 0.00673794699]
        )
        assert np.allclose(
            p.get_probability(5, 1), [0.0099, 0.20521249655, 0.03368973499]
        )
        assert np.allclose(
            p.get_probability(6, 0), [0.99, 0.04978706836, 0.00247875217]
        )
        assert np.allclose(
            p.get_probability(6, 1), [0.0099, 0.149361205103, 0.014872513059]
        )


def test_regularization_formula():
    """CopyNumberTest.cpp 'scaling' + 'regularization' semantics applied
    through the table's regularized path: q_i = (p_i + c)/(sum + 3c)."""

    def regularize(p0, p1, p2, c):
        total = p0 + p1 + p2 + 3 * c
        q0 = (p0 + c) / total
        q1 = (p1 + c) / total
        return q0, q1, 1.0 - q0 - q1

    assert np.allclose(regularize(0.1, 0.1, 0.1, 0.0), [1 / 3] * 3)
    assert np.allclose(
        regularize(0.001, 0.6, 0.0004, 0.0),
        [0.001 / 0.6014, 0.6 / 0.6014, 0.0004 / 0.6014],
    )
    assert np.allclose(regularize(0.1, 0.1, 0.1, 10), [1 / 3] * 3)
    assert np.allclose(
        regularize(0.2, 0.9, 1.1, 100.0),
        [0.33156849768, 0.33388484447, 0.33454665784],
    )
    assert np.allclose(
        regularize(0.001, 0.0, 0.999, 20),
        [0.3278852459, 0.32786885245, 0.34424590163],
    )


def test_transition_probability_computer():
    """TransitionProbabilityComputerTest.cpp: LS pair transitions."""
    t = transition_probs(
        np.array([1000000, 2000000]), 5, 1.26, 0.25
    )[0]
    recomb = 0.04455105238
    stay = recomb + 0.77724473806
    assert np.allclose(t, [stay * stay, stay * recomb, recomb * recomb])


def test_sampling_transition_cost():
    """SamplingTransitionsTest.cpp"""
    recomb = 0.04455105238
    expected = int(-10.0 * math.log10(recomb))
    assert sampling_transition_cost(1000000, 2000000, 1.26, 5, 0.25) == expected
    # staying costs 0 by construction in the sampler scan


def test_sampling_emission_cost1():
    u1 = UniqueKmersRecord(2000, [0, 0])
    assert u1.fraction_present_kmers_on_allele(0) == 1.0
    assert sampling_emission_costs(u1)[0] == 0

    u2 = UniqueKmersRecord(3000, [1, 0])
    u2.set_undefined_allele(0)
    u2.insert_kmer(20, [1])
    u2.insert_kmer(1, [1])
    assert u2.fraction_present_kmers_on_allele(0) == 1.0
    assert float(u2.fraction_present_kmers_on_allele(1)) == pytest.approx(0.5)
    costs = sampling_emission_costs(u2)
    assert costs[0] == 50
    assert costs[1] == 3


def test_sampling_emission_cost2():
    u1 = UniqueKmersRecord(2000, [0, 1])
    for count, a in [(20, 0), (10, 0), (1, 0), (3, 1)]:
        u1.insert_kmer(count, [a])
    assert float(u1.fraction_present_kmers_on_allele(0)) == pytest.approx(2 / 3)
    assert u1.fraction_present_kmers_on_allele(1) == 1.0
    costs = sampling_emission_costs(u1)
    assert costs[0] == 1
    assert costs[1] == 0

    u2 = UniqueKmersRecord(3000, [0, 1])
    u2.set_undefined_allele(0)
    for count, a in [(1, 0), (1, 0), (20, 1), (2, 1), (0, 1)]:
        u2.insert_kmer(count, [a])
    assert u2.fraction_present_kmers_on_allele(0) == 0.0
    assert float(u2.fraction_present_kmers_on_allele(1)) == pytest.approx(1 / 3)
    costs = sampling_emission_costs(u2)
    assert costs[0] == 50
    assert costs[1] == 4


def test_sampling_emission_cost3():
    u1 = UniqueKmersRecord(2000, [0, 1])
    u1.insert_kmer(20, [0])
    u1.insert_kmer(1, [1])
    costs = sampling_emission_costs(u1)
    assert costs[0] == 0
    assert costs[1] == 25


def test_sampling_emission_undefined():
    u = UniqueKmersRecord(2000, [0, 1, 2])
    u.set_undefined_allele(1)
    u.insert_kmer(20, [0])
    u.insert_kmer(2, [2])
    assert u.fraction_present_kmers_on_allele(1) == 1.0  # no kmers -> 1.0
    costs = sampling_emission_costs(u)
    assert costs[0] == 0
    assert costs[1] == 50
    assert costs[2] == 25
