"""sample_panels_batched must be bit-identical to per-chromosome
HaplotypeSampler runs (same sampled paths, same record updates),
including on padded groups of different-length chromosomes and
tie-heavy cost landscapes."""

import copy

import numpy as np

from pangenie_tpu.hmm.sampling import HaplotypeSampler, sample_panels_batched
from pangenie_tpu.kmers.unique import UniqueKmersRecord


def _random_records(rng, n_records, n_paths, n_alleles=2, coverage=8):
    records = []
    pos = 1000
    for _ in range(n_records):
        pos += int(rng.integers(10, 5000))
        path_to_allele = rng.integers(0, n_alleles, size=n_paths).tolist()
        # ensure every allele id up to max appears (valid record)
        for a in range(min(n_alleles, n_paths)):
            path_to_allele[a] = a
        r = UniqueKmersRecord(pos, path_to_allele)
        for _k in range(int(rng.integers(1, 6))):
            allele = int(rng.integers(0, n_alleles))
            # skewed counts so fractions (and hence costs) vary and tie
            count = int(rng.choice([0, 0, 1, 3, 5, 10]))
            r.insert_kmer(count, [allele])
        r.set_coverage(coverage)
        records.append(r)
    return records


def test_batched_matches_sequential_multi_chromosome():
    rng = np.random.default_rng(11)
    sizes = {"chr1": 37, "chr2": 64, "chr3": 9}
    P = 7
    chrom_records = {
        c: _random_records(rng, n, P, n_alleles=3) for c, n in sizes.items()
    }
    seq_records = {c: copy.deepcopy(rs) for c, rs in chrom_records.items()}

    expected = {}
    for c in sorted(sizes):
        sampler = HaplotypeSampler(
            seq_records[c], 3, 1.26, 25000.0, None, False, "", c, 10
        )
        expected[c] = sampler.get_sampled_paths()

    got = sample_panels_batched(
        chrom_records, 3, 1.26, 25000.0, add_reference=False,
        allele_penalty=10,
    )
    for c in sizes:
        assert got[c] == expected[c], c
        # record updates identical too
        for r_b, r_s in zip(chrom_records[c], seq_records[c]):
            assert r_b.get_nr_paths() == r_s.get_nr_paths()
            assert np.array_equal(r_b.path_to_allele, r_s.path_to_allele)
            assert np.array_equal(r_b.kmer_counts, r_s.kmer_counts)


def test_batched_matches_sequential_with_reference_and_ties():
    rng = np.random.default_rng(23)
    # identical flat costs everywhere -> maximal tie pressure
    chrom_records = {}
    for c, n in (("chrA", 16), ("chrB", 33)):
        records = []
        pos = 500
        for _ in range(n):
            pos += 997
            r = UniqueKmersRecord(pos, [0, 1, 0, 1, 1])
            r.insert_kmer(5, [0])
            r.insert_kmer(5, [1])
            r.set_coverage(8)
            records.append(r)
        chrom_records[c] = records
    seq_records = {c: copy.deepcopy(rs) for c, rs in chrom_records.items()}

    expected = {}
    for c in sorted(chrom_records):
        sampler = HaplotypeSampler(
            seq_records[c], 2, 1.26, 25000.0, None, True, "", c, 5
        )
        expected[c] = sampler.get_sampled_paths()

    got = sample_panels_batched(
        chrom_records, 2, 1.26, 25000.0, add_reference=True,
        allele_penalty=5,
    )
    for c in chrom_records:
        assert got[c] == expected[c], c


def test_batched_paths_tsv_matches_sequential(tmp_path):
    rng = np.random.default_rng(5)
    chrom_records = {"chrZ": _random_records(rng, 25, 5)}
    seq_records = copy.deepcopy(chrom_records["chrZ"])

    HaplotypeSampler(
        seq_records, 2, 1.26, 25000.0, None, False,
        str(tmp_path / "seq.tsv"), "chrZ", 10,
    )
    sample_panels_batched(
        chrom_records, 2, 1.26, 25000.0,
        path_outputs={"chrZ": str(tmp_path / "bat.tsv")}, allele_penalty=10,
    )
    assert (tmp_path / "bat.tsv").read_text() == (
        tmp_path / "seq.tsv"
    ).read_text()


def test_batched_size_zero_and_empty():
    got = sample_panels_batched({"chr1": []}, 3)
    assert got == {"chr1": []}
    rng = np.random.default_rng(1)
    records = _random_records(rng, 5, 4)
    got = sample_panels_batched({"chr1": records}, 0)
    assert got == {"chr1": []}
    assert records[0].get_nr_paths() == 4  # untouched
