"""Column-indexer and emission-matrix oracles ported from the
reference test suite (ColumnIndexerTest.cpp,
EmissionProbabilityComputerTest.cpp) — exercised through the dense
column builder and the JAX emission kernel they became."""

import jax.numpy as jnp
import numpy as np

from pangenie_tpu.hmm.columns import build_columns
from pangenie_tpu.hmm.emissions import log_emission_allele_matrix
from pangenie_tpu.kmers.unique import UniqueKmersRecord
from pangenie_tpu.model.probabilities import ProbabilityTable


def test_column_indexer_semantics():
    """ColumnIndexerTest.cpp 'testcase 1': all-REF columns (under the
    selected path subset) are dropped; path/allele maps preserved."""
    u1 = UniqueKmersRecord(2000, [0, 1, 0, 0, 0])
    u1.insert_kmer(10, [0])
    u1.insert_kmer(10, [1])
    u1.set_coverage(5)
    u2 = UniqueKmersRecord(2500, [0, 0, 1, 1, 1])
    u2.insert_kmer(10, [0])
    u2.insert_kmer(20, [1])
    u3 = UniqueKmersRecord(3000, [0, 0, 1, 1, 1])
    u3.insert_kmer(20, [0])
    u3.insert_kmer(5, [1])
    u3.set_coverage(5)
    probs = ProbabilityTable(0, 30, 30, 0.0)

    # subset {2, 3}: the FIRST variant is all-REF under it -> skipped
    cols = build_columns([u1, u2, u3], probs, only_paths=[2, 3])
    assert cols.n_columns == 2
    assert cols.variant_ids.tolist() == [1, 2]
    assert cols.n_paths == 2
    assert cols.paths.tolist() == [2, 3]
    assert cols.alleles.tolist() == [[1, 1], [1, 1]]

    # full panel: nothing skipped
    cols = build_columns([u1, u2, u3], probs, only_paths=None)
    assert cols.n_columns == 3
    assert cols.variant_ids.tolist() == [0, 1, 2]
    assert cols.n_paths == 5
    assert cols.paths.tolist() == [0, 1, 2, 3, 4]
    assert cols.alleles[0].tolist() == [0, 1, 0, 0, 0]
    assert cols.alleles[1].tolist() == [0, 0, 1, 1, 1]


def _emission_matrix(record, probs):
    """Drive the JAX allele-space emission kernel for one record."""
    K = record.size()
    allele_ids = record.get_allele_ids()
    A = len(allele_ids)
    lookup = {a: i for i, a in enumerate(allele_ids)}
    lp = np.zeros((K, 3))
    pr = np.zeros((K, 3))
    incidence = np.zeros((K, A), dtype=bool)
    for ki in range(K):
        p = probs.get_probability(record.get_coverage(),
                                  record.get_readcount_of(ki))
        pr[ki] = p
        with np.errstate(divide="ignore"):
            lp[ki] = np.where(p > 0, np.log(np.maximum(p, 1e-300)), -np.inf)
        for a in allele_ids:
            incidence[ki, lookup[a]] = record.kmer_on_allele(ki, a)
    undefined = np.array([record.is_undefined_allele(a) for a in allele_ids])
    logEA = log_emission_allele_matrix(
        jnp.asarray(lp), jnp.asarray(incidence),
        jnp.ones(K, bool), jnp.asarray(undefined),
        jnp.zeros((), bool), jnp.zeros(()),
    )
    return np.exp(np.asarray(logEA))


def test_emission_probability():
    """EmissionProbabilityComputerTest.cpp 'get_emission_probability'"""
    counts = [4, 6, 8, 2, 5]
    cns = [(0.01, 0.2, 0.0), (0.001, 0.5, 0.001), (0.0, 0.3, 0.02),
           (0.05, 0.6, 0.0), (0.01, 0.2, 0.01)]
    alleles = [[0], [0], [1], [1], [1]]
    probs = ProbabilityTable(0, 10, 10, 0.0)
    record = UniqueKmersRecord(1000, [0, 1, 1])
    for count, a, cn in zip(counts, alleles, cns):
        record.insert_kmer(count, a)
        probs.modify_probability(0, count, cn)

    E = _emission_matrix(record, probs)
    assert np.isclose(E[0, 0], 0.0, atol=1e-12)
    assert np.isclose(E[0, 1], 0.0036)
    assert np.isclose(E[1, 0], 0.0036)
    assert np.isclose(E[1, 1], 0.0, atol=1e-12)


def test_emission_probability_undefined():
    """EmissionProbabilityComputerTest.cpp
    'get_emission_probability_undefined1'"""
    counts = [4, 6, 8, 2, 5]
    cns = [(0.01, 0.2, 0.0), (0.001, 0.5, 0.001), (0.0, 0.3, 0.02),
           (0.05, 0.6, 0.0), (0.01, 0.2, 0.01)]
    alleles = [[0], [0], [1], [1], [1]]
    probs = ProbabilityTable(0, 10, 10, 0.0)
    record = UniqueKmersRecord(1000, [0, 1, 2])
    record.set_undefined_allele(2)
    for count, a, cn in zip(counts, alleles, cns):
        record.insert_kmer(count, a)
        probs.modify_probability(0, count, cn)

    E = _emission_matrix(record, probs)
    assert np.isclose(E[0, 1], 0.0036)
    assert np.isclose(E[1, 0], 0.0036)
    assert np.isclose(E[0, 2], 0.000128225)
    assert np.isclose(E[2, 0], 0.000128225)
    assert np.isclose(E[1, 2], 0.000132565)
    assert np.isclose(E[2, 1], 0.000132565)
    assert np.isclose(E[2, 2], 0.000019852, rtol=1e-4)


def test_lp_index_compression_bit_exact():
    """The uint16-index + value-table form of the log-probability grid
    must reproduce the grid bit-for-bit — including masked cells,
    out-of-table (cov, count) fallbacks, and the device-side gather."""
    import jax.numpy as jnp
    import numpy as np

    from pangenie_tpu.hmm.columns import _log_probability_grid
    from pangenie_tpu.hmm.genotyping import _gather_lp
    from pangenie_tpu.model.probabilities import ProbabilityTable

    table = ProbabilityTable(2, 36, 18, 0.01)
    rng = np.random.default_rng(5)
    N, K = 300, 12
    coverage = rng.integers(2, 36, size=N)
    counts = rng.integers(0, 80, size=(N, K))  # many cells >= count_max
    mask = rng.random((N, K)) > 0.15
    out, idx, vt = _log_probability_grid(
        table, coverage, counts, mask, np.float32
    )
    assert idx is not None and vt is not None
    np.testing.assert_array_equal(vt[idx], out)
    got = np.asarray(_gather_lp(jnp.asarray(idx), jnp.asarray(vt)))
    np.testing.assert_array_equal(got, out)
