"""UniqueKmersRecord oracles ported from the reference test suite
(reference tests/UniqueKmersTest.cpp — the Biallelic/Multiallelic split
is a bit-packing detail there; one record type covers both here)."""

import pytest

from pangenie_tpu.kmers.unique import UniqueKmersRecord


def test_kmers_on_alleles_multi_incidence():
    u = UniqueKmersRecord(1000, [0, 0, 1])
    for count, alleles in [(5, [0, 1]), (1, [0]), (9, [1])]:
        u.insert_kmer(count, alleles)
    counts = u.kmers_on_alleles()
    assert counts == {0: 2, 1: 2}


def test_kmers_on_alleles_insert_new_allele():
    u = UniqueKmersRecord(1000, [0, 0])
    assert u.kmers_on_alleles() == {0: 0}
    u.insert_kmer(5, [2])
    assert u.kmers_on_alleles() == {0: 0, 2: 1}
    u.insert_kmer(1, [0])
    assert u.kmers_on_alleles() == {0: 1, 2: 1}
    assert not u.kmer_on_path(0, 0)
    assert not u.kmer_on_path(0, 1)
    assert u.kmer_on_path(1, 0)
    assert u.kmer_on_path(1, 1)


def test_kmers_on_alleles_single_path():
    u = UniqueKmersRecord(1000, [1])
    u.insert_kmer(10, [1])
    assert u.size() == 1
    assert u.kmer_on_path(0, 0)
    assert u.kmers_on_alleles() == {1: 1}


def test_fraction_present():
    u = UniqueKmersRecord(1000, [2, 1, 0])
    for count, a in [(4, 0), (5, 0), (0, 0), (3, 1), (0, 2), (5, 2)]:
        u.insert_kmer(count, [a])
    assert float(u.fraction_present_kmers_on_allele(0)) == pytest.approx(2 / 3)
    assert u.fraction_present_kmers_on_allele(1) == 1.0
    assert float(u.fraction_present_kmers_on_allele(2)) == pytest.approx(0.5)

    u2 = UniqueKmersRecord(1000, [2, 1, 0])
    u2.insert_kmer(10, [2])
    u2.insert_kmer(0, [0])
    assert u2.fraction_present_kmers_on_allele(0) == 0.0
    assert u2.fraction_present_kmers_on_allele(1) == 1.0
    assert u2.fraction_present_kmers_on_allele(2) == 1.0


def test_get_path_ids():
    u = UniqueKmersRecord(1000, [0, 0, 2, 1])
    paths, alleles = u.get_path_ids()
    assert paths == [0, 1, 2, 3]
    assert alleles == [0, 0, 2, 1]

    paths, alleles = u.get_path_ids(only_include=[0, 2, 10])
    assert paths == [0, 2]
    assert alleles == [0, 2]

    paths, alleles = u.get_path_ids(only_include=[20, 30, 40])
    assert paths == []
    assert alleles == []

    paths, alleles = u.get_path_ids(only_include=[0, 1, 2, 3])
    assert paths == [0, 1, 2, 3]
    assert alleles == [0, 0, 2, 1]


def test_undefined_allele_flags():
    u = UniqueKmersRecord(1000, [0, 1, 2])
    u.set_undefined_allele(1)
    assert u.is_undefined_allele(1)
    assert not u.is_undefined_allele(0)
    assert u.get_defined_allele_ids() == [0, 2]
    assert u.get_allele_ids() == [0, 1, 2]
    with pytest.raises(RuntimeError):
        u.set_undefined_allele(7)


def test_update_paths_basic():
    """UniqueKmersTest.cpp 'MultiallelicUniqueKmers update_paths'"""
    u = UniqueKmersRecord(1000, [0, 0, 1])
    for count, alleles in [(5, [0, 1]), (6, [0]), (7, [1])]:
        u.insert_kmer(count, alleles)
    assert u.size() == 3 and u.get_nr_paths() == 3

    u.update_paths([0, 1])
    assert u.size() == 2
    assert u.get_nr_paths() == 2
    for ki in range(2):
        assert u.kmer_on_path(ki, 0)
        assert u.kmer_on_path(ki, 1)
    assert u.get_readcount_of(0) == 5
    assert u.get_readcount_of(1) == 6


def test_update_paths_to_single():
    u = UniqueKmersRecord(100, [0, 1, 0])
    for count, a in [(10, 0), (20, 1), (30, 0)]:
        u.insert_kmer(count, [a])
    u.update_paths([1])
    assert u.size() == 1
    assert u.get_nr_paths() == 1
    assert u.kmer_on_path(0, 0)
    assert u.get_readcount_of(0) == 20


def test_update_paths_keep_both_alleles():
    u = UniqueKmersRecord(100, [0, 0, 1])
    u.insert_kmer(10, [0])
    u.insert_kmer(20, [1])
    u.update_paths([0, 2])
    assert u.kmer_on_path(0, 0)
    assert u.kmer_on_path(1, 1)
    assert u.get_readcount_of(0) == 10
    assert u.get_readcount_of(1) == 20


def test_update_paths_undefined_preserved():
    """UniqueKmersTest.cpp 'MultiallelicUniqueKmers update_paths4'"""
    u = UniqueKmersRecord(100, [0, 1])
    u.set_undefined_allele(0)
    u.insert_kmer(10, [1])
    u.insert_kmer(20, [1])
    assert u.is_undefined_allele(0)

    u.update_paths([0, 1])
    paths, alleles = u.get_path_ids()
    assert paths == [0, 1]
    assert alleles == [0, 1]
    assert u.kmer_on_path(0, 1)
    assert u.kmer_on_path(1, 1)
    assert not u.kmer_on_path(0, 0)
    assert u.is_undefined_allele(0)


def test_update_readcount_bounds():
    u = UniqueKmersRecord(100, [0, 1])
    u.insert_kmer(5, [0])
    u.update_readcount(0, 9)
    assert u.get_readcount_of(0) == 9
    with pytest.raises(RuntimeError):
        u.update_readcount(3, 1)


def test_segment_sort_helpers_match_lexsort():
    """The native per-segment sorts must match np.lexsort exactly,
    including stability on ties (the selection pipeline's later stages
    rely on lexsort's tie order)."""
    import numpy as np

    from pangenie_tpu.kmers.unique import (
        _sort_within_groups, _stable_kv_sort_within_groups,
    )

    rng = np.random.default_rng(0)
    n_groups = 37
    groups = np.sort(rng.integers(0, n_groups, size=5000)).astype(np.int64)
    values = rng.integers(0, 50, size=5000).astype(np.uint64)  # many ties
    order = np.lexsort((values, groups))
    want_v = values[order]
    got_v, got_g = _sort_within_groups(values.copy(), groups, n_groups)
    np.testing.assert_array_equal(got_v, want_v)
    np.testing.assert_array_equal(got_g, groups)

    keys = rng.integers(0, 20, size=5000).astype(np.int64)
    payload = rng.integers(0, 1 << 62, size=5000).astype(np.uint64)
    order = np.lexsort((keys, groups))
    want_k, want_p = keys[order], payload[order]
    got_k, got_p = _stable_kv_sort_within_groups(
        keys.copy(), payload.copy(), groups, n_groups
    )
    np.testing.assert_array_equal(got_k, want_k)
    np.testing.assert_array_equal(got_p, want_p)
