"""Viterbi (phasing) vs a long-double brute-force oracle implementing
the reference's exact semantics (src/hmm.cpp:408-511): linear-space
max-product with per-column sum-normalization, `>=` last-max
tie-breaking over row-major previous states and over the final column.
"""

import numpy as np

from pangenie_tpu.kmers.unique import UniqueKmersRecord
from pangenie_tpu.model.probabilities import ProbabilityTable
from pangenie_tpu.hmm.genotyping import PairHMM

LD = np.longdouble


def brute_viterbi(records, probs, recombrate, effective_N, only_paths=None):
    paths = only_paths or list(range(records[0].get_nr_paths()))
    kept = [
        i for i, r in enumerate(records)
        if any(
            r.get_allele(p) != 0 and not r.is_undefined_allele(r.get_allele(p))
            for p in paths
        )
    ]
    P = len(paths)
    S = P * P
    N = len(kept)
    p1v = np.arange(S) // P
    p2v = np.arange(S) % P

    def emis(rec):
        ids = rec.get_allele_ids()
        A = max(ids) + 1
        E = np.zeros((A, A), dtype=LD)
        for a1 in ids:
            for a2 in ids:
                v = LD(1)
                for ki in range(rec.size()):
                    p = probs.get_probability(
                        rec.get_coverage(), rec.get_readcount_of(ki)
                    ).astype(LD)
                    c = int(rec.kmer_on_allele(ki, a1)) + int(
                        rec.kmer_on_allele(ki, a2)
                    )
                    v = v * p[c]
                E[a1, a2] = v
        if not E.any():
            E = np.ones_like(E)
        return E

    def trans(rp, rc):
        d = (
            LD(rc.get_variant_position() - rp.get_variant_position())
            * LD(0.000004) * LD(recombrate) * LD(effective_N)
        )
        r = (LD(1) - np.exp(-d / LD(P))) / LD(P)
        s = np.exp(-d / LD(P)) + r
        return np.array([s * s, s * r, r * r], dtype=LD)

    cols = []
    bts = []
    prev = None
    for n in range(N):
        rec = records[kept[n]]
        E = emis(rec)
        cur = np.zeros(S, dtype=LD)
        bt = np.zeros(S, dtype=np.int64)
        if n > 0:
            t = trans(records[kept[n - 1]], rec)
        for i in range(S):
            a1 = rec.get_allele(paths[int(p1v[i])])
            a2 = rec.get_allele(paths[int(p2v[i])])
            if n == 0:
                prevcell = LD(1)
            else:
                sw = (p1v != p1v[i]).astype(int) + (p2v != p2v[i]).astype(int)
                vals = prev * t[sw]
                best = LD(-1)
                bidx = 0
                for sp in range(S):  # ascending, >= keeps the LAST max
                    if vals[sp] >= best:
                        best = vals[sp]
                        bidx = sp
                prevcell = best
                bt[i] = bidx
            cur[i] = prevcell * E[a1, a2]
        tot = cur.sum()
        cur = cur / tot if tot > 0 else np.full(S, LD(1) / S)
        cols.append(cur)
        bts.append(bt)
        prev = cur

    best = LD(0)
    bidx = 0
    for i in range(S):
        if cols[N - 1][i] >= best:
            best = cols[N - 1][i]
            bidx = i
    haplotypes = {}
    i = bidx
    for n in range(N - 1, -1, -1):
        rec = records[kept[n]]
        haplotypes[kept[n]] = (
            rec.get_allele(paths[i // P]), rec.get_allele(paths[i % P])
        )
        i = int(bts[n][i])
    return haplotypes


def test_viterbi_random_vs_oracle():
    rng = np.random.default_rng(42)
    probs = ProbabilityTable(5, 10, 40, 0.0)
    for count, cn in [(10, (0.1, 0.9, 0.1)), (20, (0.01, 0.01, 0.9)),
                      (5, (0.9, 0.3, 0.1)), (15, (0.2, 0.5, 0.3)),
                      (30, (0.05, 0.2, 0.75))]:
        probs.modify_probability(5, count, cn)

    for trial in range(8):
        P = int(rng.integers(2, 5))
        N = int(rng.integers(2, 10))
        records = []
        pos = 1000
        for _ in range(N):
            pos += int(rng.integers(50, 4000))
            rec = UniqueKmersRecord(pos, rng.integers(0, 3, P).tolist())
            rec.set_coverage(5)
            for _ in range(int(rng.integers(0, 4))):
                count = int(rng.choice([5, 10, 15, 20, 30]))
                rec.insert_kmer(count, [int(rng.integers(0, 3))])
            records.append(rec)
        try:
            hmm = PairHMM(records, probs, False, True, 2.0, False, 100.0)
        except RuntimeError:
            continue  # all columns skipped
        expected = brute_viterbi(records, probs, 2.0, 100.0)
        for idx, (h1, h2) in expected.items():
            g = hmm.get_genotyping_result()[idx]
            assert (g.haplotype_1, g.haplotype_2) == (h1, h2), (
                trial, idx, (g.haplotype_1, g.haplotype_2), (h1, h2)
            )


def test_viterbi_segmented_matches_full():
    """The checkpointed Viterbi must reproduce the stored-backtrace
    scan exactly (incl. tie-breaking across segment boundaries)."""
    import jax.numpy as jnp

    from pangenie_tpu.hmm.columns import build_columns
    from pangenie_tpu.hmm.genotyping import _to_device_columns
    from pangenie_tpu.hmm.viterbi import viterbi, viterbi_segmented

    rng = np.random.default_rng(31)
    probs = ProbabilityTable(5, 10, 40, 0.0)
    for count, cn in [(10, (0.1, 0.9, 0.1)), (20, (0.01, 0.01, 0.9)),
                      (5, (0.9, 0.3, 0.1))]:
        probs.modify_probability(5, count, cn)
    records = []
    pos = 1000
    for _ in range(60):
        pos += int(rng.integers(10, 3000))
        rec = UniqueKmersRecord(pos, rng.integers(0, 2, 4).tolist())
        rec.set_coverage(5)
        for _ in range(int(rng.integers(0, 3))):
            rec.insert_kmer(int(rng.choice([5, 10, 20])),
                            [int(rng.integers(0, 2))])
        records.append(rec)
    columns = build_columns(records, probs, None)
    dev = _to_device_columns(columns, 2.0, 100.0, False, jnp.float64)
    host = _to_device_columns(columns, 2.0, 100.0, False, jnp.float64,
                              as_host=True)
    ref = np.asarray(viterbi(dev, uniform=False))
    for segment in (9, 16, 64):
        seg = viterbi_segmented(host, segment, uniform=False)
        assert np.array_equal(seg, ref), segment
