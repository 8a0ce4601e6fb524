"""HaplotypeSampler oracles ported from the reference test suite
(reference tests/HaplotypeSamplerTest.cpp)."""

import numpy as np

from pangenie_tpu.hmm.sampling import HaplotypeSampler, get_column_minima
from pangenie_tpu.kmers.unique import UniqueKmersRecord


def test_get_column_minima():
    cases = [
        # column, mask, (first_id, second_id, first_val, second_val)
        ([10, 2, 14, 1], [1, 1, 1, 1], (3, 1, 1, 2)),
        ([10, 2, 14, 2], [1, 1, 1, 1], (1, 3, 2, 2)),
        ([10, 10, 10, 10], [1, 1, 1, 1], (0, 1, 10, 10)),
        ([10, 10, 20], [1, 1, 1], (0, 1, 10, 10)),
        ([10, 20, 20], [1, 1, 1], (0, 1, 10, 20)),
        ([10, 20, 30], [1, 1, 1], (0, 1, 10, 20)),
        ([10, 20, 30], [1, 0, 1], (0, 2, 10, 30)),
        ([10, 20, 30], [0, 1, 1], (1, 2, 20, 30)),
    ]
    for column, mask, expected in cases:
        got = get_column_minima(np.array(column), np.array(mask, dtype=bool))
        assert got == expected, (column, mask, got, expected)


def test_sampler_size_zero_is_noop():
    u1 = UniqueKmersRecord(2000, [0, 0])
    u2 = UniqueKmersRecord(3000, [1, 0])
    u2.set_undefined_allele(0)
    u2.insert_kmer(20, [1])
    u2.insert_kmer(1, [1])
    h = HaplotypeSampler([u1, u2], 0)
    assert h.get_sampled_paths() == []
    assert u1.get_nr_paths() == 2  # untouched


def test_viterbi_single_path():
    """tests/HaplotypeSamplerTest.cpp 'HaplotypeSampler Viterbi'"""
    u1 = UniqueKmersRecord(1000000, [0, 1])
    u1.insert_kmer(10, [0])
    u1.insert_kmer(1, [1])
    u1.set_coverage(5)
    u2 = UniqueKmersRecord(2000000, [1, 0])
    u2.insert_kmer(10, [0])
    u2.insert_kmer(1, [0])
    u2.insert_kmer(2, [1])
    u2.set_coverage(5)
    scores = []
    h = HaplotypeSampler([u1, u2], 1, 1.26, 25000.0, scores)
    assert scores == [6]
    assert h.get_sampled_paths() == [[0, 1]]


def _viterbi2_records(u2_position):
    u1 = UniqueKmersRecord(1000000, [0, 1, 2])
    for count, a in [(10, 0), (10, 0), (7, 0), (1, 1), (2, 1), (20, 1),
                     (11, 2), (10, 2), (1, 2)]:
        u1.insert_kmer(count, [a])
    u1.set_coverage(5)
    u2 = UniqueKmersRecord(u2_position, [0, 1, 1])
    for count, a in [(1, 0), (1, 0), (20, 1), (22, 1)]:
        u2.insert_kmer(count, [a])
    u2.set_coverage(5)
    return u1, u2


def test_viterbi_two_paths_close():
    """'HaplotypeSampler Viterbi2': columns 10bp apart — staying is
    cheap, second path switches to the strong allele pair (1,1)."""
    u1, u2 = _viterbi2_records(1000010)
    scores = []
    h = HaplotypeSampler([u1, u2], 2, 1.26, 25000.0, scores)
    assert scores == [1, 14]
    assert h.get_sampled_paths() == [[2, 2], [1, 1]]


def test_viterbi_two_paths_distant():
    """'HaplotypeSampler Viterbi3': extra kmer on allele 1 and distant
    columns — second path recombines 0 -> 1."""
    u1, u2 = _viterbi2_records(2000000)
    u1.insert_kmer(1, [1])  # Viterbi3 adds a 4th kmer on allele 1
    # re-order kmers to match the reference insertion order
    u1.kmer_counts = [10, 10, 7, 1, 2, 1, 20, 11, 10, 1]
    u1.kmer_alleles = [[0], [0], [0], [1], [1], [1], [1], [2], [2], [2]]
    scores = []
    h = HaplotypeSampler([u1, u2], 2, 1.26, 25000.0, scores)
    assert scores == [1, 14]
    assert h.get_sampled_paths() == [[2, 2], [0, 1]]


def test_update_unique_kmers():
    """'HaplotypeSampler update_unique_kmers'"""
    u1, u2 = _viterbi2_records(2000000)
    u1.insert_kmer(1, [1])
    u1.kmer_counts = [10, 10, 7, 1, 2, 1, 20, 11, 10, 1]
    u1.kmer_alleles = [[0], [0], [0], [1], [1], [1], [1], [2], [2], [2]]
    HaplotypeSampler([u1, u2], 2, 1.26, 25000.0)

    assert u1.size() == 6
    assert u1.kmer_counts.tolist() == [10, 10, 7, 11, 10, 1]
    for i in range(3):
        assert u1.kmer_on_path(i + 3, 0)  # new path 0 = old 2 (allele 2)
        assert u1.kmer_on_path(i, 1)      # new path 1 = old 0 (allele 0)

    assert u2.size() == 2
    assert u2.kmer_counts.tolist() == [20, 22]
    for i in range(2):
        assert u2.kmer_on_path(i, 0)
        assert u2.kmer_on_path(i, 1)


def test_update_unique_kmers_reference_path():
    """'HaplotypeSampler update_unique_kmers_reference'"""
    u1, u2 = _viterbi2_records(2000000)
    u1.insert_kmer(1, [1])
    u1.kmer_counts = [10, 10, 7, 1, 2, 1, 20, 11, 10, 1]
    u1.kmer_alleles = [[0], [0], [0], [1], [1], [1], [1], [2], [2], [2]]
    h = HaplotypeSampler([u1, u2], 2, 1.26, 25000.0, None, add_reference=True)
    assert h.get_sampled_paths() == [[2, 2], [0, 1], [0, 0]]

    assert u1.size() == 6
    assert u1.kmer_counts.tolist() == [10, 10, 7, 11, 10, 1]
    for i in range(3):
        assert u1.kmer_on_path(i + 3, 0)
        assert u1.kmer_on_path(i, 1)
        assert u1.kmer_on_path(i, 2)

    assert u2.size() == 4
    assert u2.kmer_counts.tolist() == [1, 1, 20, 22]
    for i in range(2):
        assert u2.kmer_on_path(i + 2, 0)
        assert u2.kmer_on_path(i + 2, 1)
        assert u2.kmer_on_path(i, 2)


def test_segmented_viterbi_matches_single_scan():
    """The checkpointed (segment-recompute) sampling scan must produce
    identical paths and scores to the full-backtrace scan."""
    import jax.numpy as jnp
    import numpy as np

    from pangenie_tpu.hmm.sampling import (
        _viterbi_iteration,
        _viterbi_iteration_segmented,
    )

    rng = np.random.default_rng(13)
    for trial in range(4):
        N = int(rng.integers(50, 400))
        P = int(rng.integers(3, 12))
        cost = rng.integers(0, 26, size=(N, P)).astype(np.uint32)
        mask = rng.random((N, P)) > 0.2
        mask[:, 0] = True  # keep at least one path usable everywhere
        switch = rng.integers(1, 30, size=N).astype(np.uint32)
        switch[0] = 0

        path_ref, score_ref = _viterbi_iteration(
            jnp.asarray(cost), jnp.asarray(mask), jnp.asarray(switch)
        )
        for segment in (32, 64, 128):
            path_seg, score_seg = _viterbi_iteration_segmented(
                cost, mask, switch, segment
            )
            assert int(score_seg) == int(score_ref), (trial, segment)
            assert np.array_equal(
                np.asarray(path_seg), np.asarray(path_ref)
            ), (trial, segment)
