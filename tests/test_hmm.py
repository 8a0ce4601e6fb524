"""PairHMM tests: hand-computed oracles ported from the reference's
HMMTest.cpp plus a brute-force O(N * P^4) checker.

The reference decouples HMM math from the Poisson model by overriding
ProbabilityTable entries (tests/HMMTest.cpp:28-45); we use the same
modify_probability hook.
"""

import math

import numpy as np
import pytest

from pangenie_tpu.kmers.unique import UniqueKmersRecord
from pangenie_tpu.model.probabilities import ProbabilityTable
from pangenie_tpu.hmm.genotyping import PairHMM


def make_probs_cov5():
    probs = ProbabilityTable(5, 10, 30, 0.0)
    probs.modify_probability(5, 10, (0.1, 0.9, 0.1))
    probs.modify_probability(5, 20, (0.01, 0.01, 0.9))
    probs.modify_probability(5, 5, (0.9, 0.3, 0.1))
    return probs


def collect(hmm, pairs=((0, 0), (0, 1), (1, 1))):
    out = []
    for result in hmm.get_genotyping_result():
        for a, b in pairs:
            out.append(result.get_genotype_likelihood(a, b))
    return out


def test_hmm_get_genotyping_result():
    """tests/HMMTest.cpp 'HMM get_genotyping_result'"""
    u1 = UniqueKmersRecord(2000, [0, 1])
    u1.insert_kmer(10, [0])
    u1.insert_kmer(10, [1])
    u1.set_coverage(5)
    u2 = UniqueKmersRecord(3000, [0, 1])
    u2.insert_kmer(20, [0])
    u2.insert_kmer(5, [1])
    u2.set_coverage(5)
    probs = make_probs_cov5()
    hmm = PairHMM(
        [u1, u2], probs, True, True, recombrate=446.287102628, uniform=False,
        effective_N=0.25,
    )
    expected = [
        0.0509465435, 0.9483202731, 0.0007331832,
        0.9678020017, 0.031003181, 0.0011948172,
    ]
    assert np.allclose(collect(hmm), expected, atol=1e-9)


def test_hmm_skip_reference_position():
    """tests/HMMTest.cpp 'HMM skip_reference_position'"""
    u1 = UniqueKmersRecord(2000, [0, 1])
    u1.insert_kmer(10, [0])
    u1.insert_kmer(10, [1])
    u1.set_coverage(5)
    # all-reference column: must be skipped by the column indexer
    u2 = UniqueKmersRecord(2500, [0, 0])
    u2.insert_kmer(10, [0])
    u2.insert_kmer(20, [1])
    u2.set_coverage(22)
    u3 = UniqueKmersRecord(3000, [0, 1])
    u3.insert_kmer(20, [0])
    u3.insert_kmer(5, [1])
    u3.set_coverage(5)
    probs = make_probs_cov5()
    hmm = PairHMM(
        [u1, u2, u3], probs, True, True, recombrate=446.287102628,
        uniform=False, effective_N=0.25,
    )
    expected = [
        0.0509465435, 0.9483202731, 0.0007331832,
        0.0, 0.0, 0.0,
        0.9678020017, 0.031003181, 0.0011948172,
    ]
    assert np.allclose(collect(hmm), expected, atol=1e-9)
    assert [g.coverage for g in hmm.get_genotyping_result()] == [5, 22, 5]
    assert [g.nr_unique_kmers for g in hmm.get_genotyping_result()] == [2, 2, 2]


def test_hmm_uniform_transitions():
    """Uniform transition mode: all transitions = 1."""
    u1 = UniqueKmersRecord(2000, [0, 1])
    u1.insert_kmer(10, [0])
    u1.insert_kmer(10, [1])
    u1.set_coverage(5)
    u2 = UniqueKmersRecord(3000, [0, 1])
    u2.insert_kmer(20, [0])
    u2.insert_kmer(5, [1])
    u2.set_coverage(5)
    probs = make_probs_cov5()
    hmm = PairHMM(
        [u1, u2], probs, True, False, recombrate=1.26, uniform=True,
        effective_N=25000.0,
    )
    got = collect(hmm)
    brute = brute_force_likelihoods([u1, u2], probs, uniform=True)
    assert np.allclose(got, brute, atol=1e-12)


# ---------------------------------------------------------------------------
# brute-force reference implementation (direct translation of the math)
# ---------------------------------------------------------------------------


def emission_matrix(record, probs):
    alleles = record.get_allele_ids()
    amax = max(alleles)
    E = np.zeros((amax + 1, amax + 1))
    for a1 in alleles:
        for a2 in alleles:
            u1 = record.is_undefined_allele(a1)
            u2 = record.is_undefined_allele(a2)
            value = 1.0
            for ki in range(record.size()):
                cnt = record.get_readcount_of(ki)
                p = probs.get_probability(record.get_coverage(), cnt)
                expected = int(record.kmer_on_allele(ki, a1)) + int(
                    record.kmer_on_allele(ki, a2)
                )
                if u1 and u2:
                    value *= (p[0] + p[1] + p[2]) / 3.0
                elif u1 or u2:
                    value *= 0.5 * (p[expected] + p[expected + 1])
                else:
                    value *= p[expected]
            E[a1, a2] = value
    if np.all(E == 0):
        E = np.ones_like(E)
    return E


def brute_force_likelihoods(
    records, probs, recombrate=1.26, uniform=False, effective_N=25000.0,
    only_paths=None, normalize=True,
):
    """Direct O(N * P^4) forward-backward, mirroring src/hmm.cpp."""
    paths = only_paths if only_paths is not None else list(
        range(records[0].get_nr_paths())
    )
    kept = []
    for idx, r in enumerate(records):
        if any(
            r.get_allele(p) != 0 and not r.is_undefined_allele(r.get_allele(p))
            for p in paths
        ):
            kept.append(idx)
    P = len(paths)
    S = P * P
    N = len(kept)
    results = [dict() for _ in records]

    def trans(n):  # t between kept column n-1 and n
        if uniform:
            return np.ones(3)
        d = (
            (records[kept[n]].get_variant_position()
             - records[kept[n - 1]].get_variant_position())
            * 0.000004 * recombrate * effective_N
        )
        r = (1.0 - math.exp(-d / P)) / P
        s = math.exp(-d / P) + r
        return np.array([s * s, s * r, r * r])

    E = [emission_matrix(records[i], probs) for i in kept]
    state_alleles = [
        [
            (records[i].get_allele(paths[s // P]), records[i].get_allele(paths[s % P]))
            for s in range(S)
        ]
        for i in kept
    ]

    alphas, c_fwds = [], []
    alpha = None
    for n in range(N):
        cur = np.empty(S)
        for s in range(S):
            i, j = s // P, s % P
            if n == 0:
                prev = 1.0
            else:
                t = trans(n)
                prev = 0.0
                for sp in range(S):
                    ip, jp = sp // P, sp % P
                    sw = int(ip != i) + int(jp != j)
                    prev += t[sw] * alpha[sp]
            a1, a2 = state_alleles[n][s]
            cur[s] = prev * E[n][a1, a2]
        total = cur.sum()
        if total > 0:
            alpha = cur / total
            c_fwds.append(total)
        else:
            alpha = np.full(S, 1.0 / S)
            c_fwds.append(1.0)
        alphas.append(alpha)

    beta = None
    for n in range(N - 1, -1, -1):
        cur = np.empty(S)
        for s in range(S):
            i, j = s // P, s % P
            if n == N - 1:
                cur[s] = 1.0
            else:
                t = trans(n + 1)
                total = 0.0
                for sp in range(S):
                    ip, jp = sp // P, sp % P
                    sw = int(ip != i) + int(jp != j)
                    a1, a2 = state_alleles[n + 1][sp]
                    total += t[sw] * beta[sp] * E[n + 1][a1, a2]
                cur[s] = total
        for s in range(S):
            a1, a2 = state_alleles[n][s]
            key = (min(a1, a2), max(a1, a2))
            results[kept[n]][key] = (
                results[kept[n]].get(key, 0.0)
                + alphas[n][s] * cur[s] * c_fwds[n]
            )
        total = cur.sum()
        beta = cur / total if total > 0 else np.full(S, 1.0 / S)

    out = []
    for r in results:
        total = sum(r.values()) if normalize else 1.0
        for key in ((0, 0), (0, 1), (1, 1)):
            v = r.get(key, 0.0)
            out.append(v / total if total > 0 else v)
    return out


def test_hmm_vs_bruteforce_random():
    """Randomized records, several paths/alleles, vs brute force."""
    rng = np.random.default_rng(7)
    for trial in range(5):
        P = int(rng.integers(2, 6))
        N = int(rng.integers(2, 8))
        records = []
        pos = 1000
        for _ in range(N):
            pos += int(rng.integers(10, 5000))
            path_to_allele = rng.integers(0, 3, P).tolist()
            rec = UniqueKmersRecord(pos, path_to_allele)
            rec.set_coverage(5)
            for _ in range(int(rng.integers(0, 4))):
                count = int(rng.choice([5, 10, 20]))
                allele = int(rng.integers(0, 3))
                rec.insert_kmer(count, [allele])
            records.append(rec)
        probs = make_probs_cov5()
        try:
            hmm = PairHMM(
                [r for r in records], probs, True, False, recombrate=2.0,
                uniform=False, effective_N=100.0,
            )
        except RuntimeError:
            continue
        got = collect(hmm)
        brute = brute_force_likelihoods(
            records, probs, recombrate=2.0, effective_N=100.0
        )
        np.testing.assert_allclose(got, brute, atol=1e-11)


def test_hmm_only_paths_subset():
    rng = np.random.default_rng(3)
    records = []
    pos = 1000
    for _ in range(6):
        pos += int(rng.integers(100, 2000))
        rec = UniqueKmersRecord(pos, rng.integers(0, 2, 5).tolist())
        rec.set_coverage(5)
        for _ in range(2):
            rec.insert_kmer(int(rng.choice([5, 10, 20])), [int(rng.integers(0, 2))])
        records.append(rec)
    probs = make_probs_cov5()
    only = [0, 2, 4]
    hmm = PairHMM(
        records, probs, True, False, recombrate=2.0, uniform=False,
        effective_N=100.0, only_paths=only,
    )
    brute = brute_force_likelihoods(
        records, probs, recombrate=2.0, effective_N=100.0, only_paths=only
    )
    np.testing.assert_allclose(collect(hmm), brute, atol=1e-11)


def test_hmm_undefined_alleles():
    """Undefined alleles marginalize over copy numbers."""
    u1 = UniqueKmersRecord(2000, [0, 1, 2])
    u1.insert_kmer(10, [0])
    u1.insert_kmer(10, [1])
    u1.set_coverage(5)
    u1.set_undefined_allele(2)
    u2 = UniqueKmersRecord(3000, [0, 1, 1])
    u2.insert_kmer(20, [0])
    u2.insert_kmer(5, [1])
    u2.set_coverage(5)
    probs = make_probs_cov5()
    hmm = PairHMM(
        [u1, u2], probs, True, False, recombrate=2.0, uniform=False,
        effective_N=100.0,
    )
    brute = brute_force_likelihoods([u1, u2], probs, recombrate=2.0,
                                    effective_N=100.0)
    np.testing.assert_allclose(collect(hmm), brute, atol=1e-11)


def test_hmm_all_zero_emissions_fall_back_to_uniform():
    """A column whose emissions are all zero becomes uniform."""
    probs = ProbabilityTable(5, 10, 30, 0.0)
    probs.modify_probability(5, 10, (0.0, 0.0, 0.0))
    probs.modify_probability(5, 20, (0.01, 0.01, 0.9))
    probs.modify_probability(5, 5, (0.9, 0.3, 0.1))
    u1 = UniqueKmersRecord(2000, [0, 1])
    u1.insert_kmer(10, [0])
    u1.set_coverage(5)
    u2 = UniqueKmersRecord(3000, [0, 1])
    u2.insert_kmer(20, [0])
    u2.insert_kmer(5, [1])
    u2.set_coverage(5)
    hmm = PairHMM(
        [u1, u2], probs, True, False, recombrate=2.0, uniform=False,
        effective_N=100.0,
    )
    brute = brute_force_likelihoods([u1, u2], probs, recombrate=2.0,
                                    effective_N=100.0)
    np.testing.assert_allclose(collect(hmm), brute, atol=1e-11)


def test_hmm_phasing_haplotypes():
    """Viterbi haplotypes on an obvious case."""
    u1 = UniqueKmersRecord(2000, [0, 1])
    u1.insert_kmer(10, [0])
    u1.insert_kmer(10, [1])
    u1.set_coverage(5)
    u2 = UniqueKmersRecord(3000, [0, 1])
    u2.insert_kmer(20, [0])
    u2.insert_kmer(5, [1])
    u2.set_coverage(5)
    probs = make_probs_cov5()
    hmm = PairHMM(
        [u1, u2], probs, True, True, recombrate=446.287102628, uniform=False,
        effective_N=0.25,
    )
    # column 1 strongly prefers 0/0 (kmer count 20 on allele 0 with CN2
    # prob 0.9); column 0 prefers het
    results = hmm.get_genotyping_result()
    h1 = (results[0].haplotype_1, results[0].haplotype_2)
    h2 = (results[1].haplotype_1, results[1].haplotype_2)
    assert sorted(h1) == [0, 1]
    assert h2 == (0, 0)


def test_segmented_forward_backward_matches():
    """The streamed (checkpoint + recompute) forward-backward must give
    the same posteriors as the in-HBM scan."""
    import jax.numpy as jnp

    from pangenie_tpu.hmm.columns import build_columns
    from pangenie_tpu.hmm.forward_backward import (
        forward_backward,
        forward_backward_segmented,
    )
    from pangenie_tpu.hmm.genotyping import _to_device_columns

    rng = np.random.default_rng(17)
    records = []
    pos = 1000
    for _ in range(50):
        pos += int(rng.integers(10, 3000))
        rec = UniqueKmersRecord(pos, rng.integers(0, 3, 5).tolist())
        rec.set_coverage(5)
        for _ in range(int(rng.integers(0, 4))):
            rec.insert_kmer(int(rng.choice([5, 10, 20])), [int(rng.integers(0, 3))])
        records.append(rec)
    probs = make_probs_cov5()
    columns = build_columns(records, probs, None)
    dev = _to_device_columns(columns, 2.0, 100.0, False, jnp.float64)
    host = _to_device_columns(columns, 2.0, 100.0, False, jnp.float64,
                              as_host=True)
    posts_ref, corr_ref = (np.asarray(x) for x in forward_backward(dev))
    for segment in (7, 16, 64):
        posts_seg, corr_seg = forward_backward_segmented(host, segment)
        np.testing.assert_allclose(posts_seg, posts_ref, rtol=1e-12)
        np.testing.assert_allclose(corr_seg, corr_ref, rtol=1e-12)


def test_pairhmm_segmented_threshold(monkeypatch):
    """Forcing the streaming threshold low must not change results."""
    from pangenie_tpu.hmm.genotyping import PairHMM

    rng = np.random.default_rng(23)
    records = []
    pos = 1000
    for _ in range(40):
        pos += int(rng.integers(10, 3000))
        rec = UniqueKmersRecord(pos, rng.integers(0, 2, 4).tolist())
        rec.set_coverage(5)
        for _ in range(2):
            rec.insert_kmer(int(rng.choice([5, 10, 20])), [int(rng.integers(0, 2))])
        records.append(rec)
    probs = make_probs_cov5()
    ref = PairHMM([r for r in records], probs, True, True, 2.0, False, 100.0)
    monkeypatch.setattr(PairHMM, "SEGMENT", 8)
    seg = PairHMM([r for r in records], probs, True, True, 2.0, False, 100.0)
    for a, b in zip(ref.get_genotyping_result(), seg.get_genotyping_result()):
        for key in set(a.likelihoods) | set(b.likelihoods):
            assert float(a.get_genotype_likelihood(*key)) == pytest.approx(
                float(b.get_genotype_likelihood(*key)), rel=1e-12
            )
        assert (a.haplotype_1, a.haplotype_2) == (b.haplotype_1, b.haplotype_2)
