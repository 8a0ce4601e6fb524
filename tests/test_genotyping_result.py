"""GenotypeLikelihoods oracles ported from the reference test suite
(reference tests/GenotypingResultTest.cpp)."""

import numpy as np
import pytest

from pangenie_tpu.panel.variant import GenotypeLikelihoods


def close(a, b):
    return abs(float(a) - float(b)) < 1e-9


def test_get_genotype_likelihood():
    r = GenotypeLikelihoods()
    r.add_to_likelihood(0, 0, 0.1)
    r.add_to_likelihood(0, 0, 0.2)
    r.add_to_likelihood(0, 1, 0.1)
    r.add_to_likelihood(1, 0, 0.1)
    r.add_to_likelihood(1, 1, 0.5)
    assert close(r.get_genotype_likelihood(0, 0), 0.3)
    assert close(r.get_genotype_likelihood(0, 1), 0.2)
    assert close(r.get_genotype_likelihood(1, 1), 0.5)
    r.haplotype_1 = 0
    r.haplotype_2 = 1
    assert (r.haplotype_1, r.haplotype_2) == (0, 1)
    assert r.get_likeliest_genotype() == (1, 1)


def test_get_likeliest_genotype():
    r = GenotypeLikelihoods()
    r.add_to_likelihood(0, 0, 0.1)
    r.add_to_likelihood(0, 1, 0.5)
    r.add_to_likelihood(1, 1, 0.4)
    assert r.get_likeliest_genotype() == (0, 1)

    r2 = GenotypeLikelihoods()
    r2.add_to_likelihood(0, 0, 0.5)
    r2.add_to_likelihood(0, 1, 0.5)
    assert r2.get_likeliest_genotype() == (-1, -1)

    assert GenotypeLikelihoods().get_likeliest_genotype() == (-1, -1)


def test_divide_likelihoods_by():
    r = GenotypeLikelihoods()
    r.add_to_likelihood(0, 0, 0.2)
    r.add_to_likelihood(0, 1, 0.8)
    r.add_to_likelihood(1, 1, 1.0)
    assert close(r.get_genotype_likelihood(1, 0), 0.8)
    r.divide_likelihoods_by(2.0)
    assert close(r.get_genotype_likelihood(0, 0), 0.1)
    assert close(r.get_genotype_likelihood(0, 1), 0.4)
    assert close(r.get_genotype_likelihood(1, 1), 0.5)


def test_get_all_likelihoods_biallelic():
    r = GenotypeLikelihoods()
    r.add_to_likelihood(0, 0, 0.1)
    r.add_to_likelihood(1, 1, 0.2)
    r.add_to_likelihood(0, 1, 0.7)
    assert np.allclose(
        [float(x) for x in r.get_all_likelihoods(2)], [0.1, 0.7, 0.2]
    )


def test_get_all_likelihoods_triallelic():
    r = GenotypeLikelihoods()
    r.add_to_likelihood(0, 1, 0.01)
    r.add_to_likelihood(0, 0, 0.05)
    r.add_to_likelihood(1, 1, 0.04)
    r.add_to_likelihood(2, 2, 0.3)
    r.add_to_likelihood(1, 2, 0.5)
    r.add_to_likelihood(0, 2, 0.1)
    assert np.allclose(
        [float(x) for x in r.get_all_likelihoods(3)],
        [0.05, 0.01, 0.04, 0.1, 0.5, 0.3],
    )
    assert r.get_genotype_quality(1, 2) == 3
    assert r.get_genotype_quality(0, 1) == 0


def test_get_specific_likelihoods():
    r = GenotypeLikelihoods()
    for (a, b), v in [
        ((0, 0), 0.01), ((0, 1), 0.02), ((0, 2), 0.1), ((1, 0), 0.15),
        ((1, 1), 0.05), ((1, 2), 0.15), ((2, 0), 0.20), ((2, 1), 0.22),
        ((2, 2), 0.1),
    ]:
        r.add_to_likelihood(a, b, v)
    assert np.allclose(
        [float(x) for x in r.get_all_likelihoods(3)],
        [0.01, 0.17, 0.05, 0.30, 0.37, 0.1],
    )
    specific = r.get_specific_likelihoods([0, 2])
    assert np.allclose(
        [float(x) for x in specific.get_all_likelihoods(2)],
        [0.0243902439, 0.73170731706, 0.24390243902],
    )


def test_get_specific_likelihoods_identity():
    r = GenotypeLikelihoods()
    r.add_to_likelihood(0, 0, 0.2)
    r.add_to_likelihood(0, 1, 0.7)
    r.add_to_likelihood(1, 1, 0.1)
    specific = r.get_specific_likelihoods([0, 1])
    assert np.allclose(
        [float(x) for x in specific.get_all_likelihoods(2)], [0.2, 0.7, 0.1]
    )


def test_genotype_quality_requires_normalized():
    r = GenotypeLikelihoods()
    r.add_to_likelihood(0, 0, 0.4)
    r.add_to_likelihood(0, 1, 0.6)
    r.add_to_likelihood(1, 1, 0.7)
    with pytest.raises(RuntimeError):
        r.get_genotype_quality(1, 1)
    r.divide_likelihoods_by(1.7)
    assert r.get_genotype_quality(1, 1) == 2


def test_genotype_quality_certain():
    r = GenotypeLikelihoods()
    r.add_to_likelihood(1, 1, 1.0)
    assert r.get_genotype_quality(1, 1) == 10000


def test_combine():
    r1 = GenotypeLikelihoods()
    r1.add_to_likelihood(1, 1, 0.8)
    r1.add_to_likelihood(0, 1, 0.1)
    r1.add_to_likelihood(0, 0, 0.1)
    r2 = GenotypeLikelihoods()
    r2.add_to_likelihood(1, 1, 0.9)
    r2.add_to_likelihood(0, 1, 0.06)
    r2.add_to_likelihood(0, 0, 0.04)
    r1.combine(r2)
    assert close(r1.get_genotype_likelihood(1, 1), 1.7)
    assert close(r1.get_genotype_likelihood(0, 1), 0.16)
    assert close(r1.get_genotype_likelihood(0, 0), 0.14)

    r3 = GenotypeLikelihoods()
    r3.add_to_likelihood(1, 2, 0.1)
    r3.add_to_likelihood(0, 1, 0.2)
    r3.add_to_likelihood(0, 0, 0.4)
    r3.add_to_likelihood(2, 2, 0.3)
    r1.combine(r3)
    assert close(r1.get_genotype_likelihood(2, 2), 0.3)
    assert close(r1.get_genotype_likelihood(1, 2), 0.1)
    assert close(r1.get_genotype_likelihood(1, 1), 1.7)
    assert close(r1.get_genotype_likelihood(0, 1), 0.36)
    assert close(r1.get_genotype_likelihood(0, 0), 0.54)


def test_combine_empty():
    r1 = GenotypeLikelihoods()
    r2 = GenotypeLikelihoods()
    r2.add_to_likelihood(1, 1, 0.9)
    r2.add_to_likelihood(0, 1, 0.06)
    r2.add_to_likelihood(0, 0, 0.04)
    r1.combine(r2)
    assert close(r1.get_genotype_likelihood(1, 1), 0.9)

    r3 = GenotypeLikelihoods()
    r4 = GenotypeLikelihoods()
    r4.add_to_likelihood(1, 1, 0.9)
    r3.combine(r4)
    assert close(r3.get_genotype_likelihood(1, 1), 0.9)

    r5 = GenotypeLikelihoods()
    r5.combine(GenotypeLikelihoods())
    assert close(r5.get_genotype_likelihood(1, 1), 0.0)


def test_normalize():
    g = GenotypeLikelihoods()
    g.add_to_likelihood(1, 1, 2)
    g.add_to_likelihood(1, 0, 1)
    g.add_to_likelihood(0, 0, 2)
    g.normalize()
    assert close(g.get_genotype_likelihood(1, 1), 0.4)
    assert close(g.get_genotype_likelihood(0, 1), 0.2)
    assert close(g.get_genotype_likelihood(0, 0), 0.4)


def test_coverage_kmers_and_empty():
    g = GenotypeLikelihoods()
    g.coverage = 30
    assert g.coverage == 30
    g.nr_unique_kmers = 300
    assert g.nr_unique_kmers == 300
    assert g.contains_no_likelihoods()
    g.add_to_likelihood(0, 0, 2)
    assert not g.contains_no_likelihoods()
