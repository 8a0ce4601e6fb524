"""VCF writer edge cases (reference src/graph.cpp:118-415): `./.` on
non-unique maxima, ignore_imputed (-u), undefined-allele projection,
and phased output with undefined haplotypes."""

import numpy as np
import pytest

from pangenie_tpu.io.fasta import FastaReader
from pangenie_tpu.panel.graph import ChromosomeGraph
from pangenie_tpu.panel.variant import GenotypeLikelihoods, VariantBubble


def _graph_with_one_snp(tmp_path, alleles=(b"A", b"T"), paths=(0, 1)):
    ref = b"G" * 30 + b"A" + b"C" * 30
    fasta = FastaReader()
    fasta._sequences["chr1"] = ref
    graph = ChromosomeGraph(fasta, "chr1", 10, False)
    v = VariantBubble(
        ref[21:30], ref[31:40], "chr1", 30, 31, list(alleles), list(paths)
    )
    graph.add_variant_cluster([v], [[]])
    return graph


def _data_lines(path):
    return [
        line.rstrip("\n") for line in open(path) if not line.startswith("#")
    ]


def test_tied_likelihoods_give_no_call(tmp_path):
    graph = _graph_with_one_snp(tmp_path)
    g = GenotypeLikelihoods()
    g.add_to_likelihood(0, 0, np.longdouble(0.5))
    g.add_to_likelihood(0, 1, np.longdouble(0.5))
    g.add_to_likelihood(1, 1, np.longdouble(0.0))
    g.coverage = 7
    g.nr_unique_kmers = 3
    out = str(tmp_path / "o.vcf")
    graph.write_genotypes(out, [g], True, "s")
    line = _data_lines(out)[0]
    sample = line.split("\t")[9]
    assert sample.startswith(".:.:")
    assert sample.endswith(":7")


def test_ignore_imputed_masks_uncovered(tmp_path):
    graph = _graph_with_one_snp(tmp_path)
    g = GenotypeLikelihoods()
    g.add_to_likelihood(0, 0, np.longdouble(1.0))
    g.coverage = 5
    g.nr_unique_kmers = 0  # no unique kmers -> masked under -u
    out = str(tmp_path / "o.vcf")
    graph.write_genotypes(out, [g], True, "s", ignore_imputed=True)
    assert _data_lines(out)[0].split("\t")[9].startswith(".:.:")

    out2 = str(tmp_path / "o2.vcf")
    graph.write_genotypes(out2, [g], True, "s", ignore_imputed=False)
    assert _data_lines(out2)[0].split("\t")[9].startswith("0/0:")


def test_empty_likelihoods_become_homref(tmp_path):
    """Columns skipped by the indexer (empty maps) write 0/0 with
    probability 1 (reference src/graph.cpp:189-197)."""
    graph = _graph_with_one_snp(tmp_path, paths=(0, 0))
    g = GenotypeLikelihoods()
    g.coverage = 4
    out = str(tmp_path / "o.vcf")
    graph.write_genotypes(out, [g], True, "s")
    sample = _data_lines(out)[0].split("\t")[9]
    assert sample.split(":")[0] == "0/0"
    assert sample.split(":")[1] == "10000"


def test_undefined_allele_projection(tmp_path):
    """Undefined (N) alleles are dropped from ALT and likelihoods are
    re-projected onto the defined subset."""
    graph = _graph_with_one_snp(
        tmp_path, alleles=(b"A", b"T", b"N"), paths=(0, 1, 2)
    )
    g = GenotypeLikelihoods()
    g.add_to_likelihood(0, 0, np.longdouble(0.1))
    g.add_to_likelihood(0, 1, np.longdouble(0.6))
    g.add_to_likelihood(1, 1, np.longdouble(0.1))
    g.add_to_likelihood(0, 2, np.longdouble(0.2))
    g.nr_unique_kmers = 5
    out = str(tmp_path / "o.vcf")
    graph.write_genotypes(out, [g], True, "s")
    line = _data_lines(out)[0].split("\t")
    assert line[4] == "T"  # N allele dropped from ALT
    assert "MA=1" in line[7]
    sample = line[9]
    assert sample.split(":")[0] == "0/1"
    # re-projected: 0.6 / (0.1+0.6+0.1) = 0.75
    gl = [float(x) for x in sample.split(":")[2].split(",")]
    assert np.isclose(10 ** gl[1], 0.75, rtol=1e-3)


def test_phasing_undefined_haplotype(tmp_path):
    graph = _graph_with_one_snp(
        tmp_path, alleles=(b"A", b"T", b"N"), paths=(0, 1, 2)
    )
    g = GenotypeLikelihoods()
    g.add_to_likelihood(0, 1, np.longdouble(1.0))
    g.haplotype_1 = 2  # undefined allele
    g.haplotype_2 = 1
    g.coverage = 6
    out = str(tmp_path / "o.vcf")
    graph.write_phasing(out, [g], True, "s")
    sample = _data_lines(out)[0].split("\t")[9]
    gt = sample.split(":")[0]
    assert gt.split("|")[0] == "."
    assert gt.split("|")[1] != "."


def test_bulk_fast_path_matches_per_record_path(tmp_path):
    """The vectorized biallelic write path must render byte-identically
    to the per-record reference path across random likelihood shapes,
    in both ignore_imputed modes."""
    rng = np.random.default_rng(7)
    ref = b"G" * 40 + bytes(rng.choice([65, 67, 71, 84], 200).astype(np.uint8)) + b"C" * 40
    fasta = FastaReader()
    fasta._sequences["chr1"] = ref
    graph = ChromosomeGraph(fasta, "chr1", 10, False)
    results = []
    pos = 40
    for i in range(40):
        a_ref = ref[pos:pos + 1]
        alt = b"T" if a_ref != b"T" else b"A"
        v = VariantBubble(
            ref[pos - 9:pos], ref[pos + 1:pos + 10], "chr1", pos, pos + 1,
            [a_ref, alt], [0, 1, 1, 0],
        )
        graph.add_variant_cluster([v], [[]])
        g = GenotypeLikelihoods()
        kind = i % 5
        if kind == 0:  # normalized confident call
            g.add_to_likelihood(0, 0, np.longdouble(1.0) - np.longdouble(1e-19))
            g.add_to_likelihood(0, 1, np.longdouble(1e-19))
        elif kind == 1:  # tie -> ./.
            g.add_to_likelihood(0, 0, np.longdouble(0.5))
            g.add_to_likelihood(1, 1, np.longdouble(0.5))
        elif kind == 2:  # empty -> 0/0 with P=1
            pass
        elif kind == 3:  # het call
            g.add_to_likelihood(0, 1, np.longdouble(0.9))
            g.add_to_likelihood(0, 0, np.longdouble(0.1))
        else:  # hom-alt with tiny tail
            g.add_to_likelihood(1, 1, np.longdouble(0.999))
            g.add_to_likelihood(0, 1, np.longdouble(0.001))
        g.coverage = int(rng.integers(3, 30))
        g.nr_unique_kmers = int(rng.integers(0, 40))
        results.append(g)
        pos += 5

    for flag in (False, True):
        fast = str(tmp_path / f"fast{flag}.vcf")
        graph.write_genotypes(fast, results, True, "s", ignore_imputed=flag)
        orig = ChromosomeGraph._bulk_genotype_lines
        ChromosomeGraph._bulk_genotype_lines = lambda self, r, ig, bulk=None: (
            np.zeros(self.size(), bool), [None] * self.size()
        )
        try:
            slow = str(tmp_path / f"slow{flag}.vcf")
            graph.write_genotypes(slow, results, True, "s",
                                  ignore_imputed=flag)
        finally:
            ChromosomeGraph._bulk_genotype_lines = orig
        assert open(fast).read() == open(slow).read()


def test_bulk_phasing_path_matches_per_record_path(tmp_path):
    """The vectorized phased-GT write path must render byte-identically
    to the per-record reference path."""
    rng = np.random.default_rng(9)
    ref = b"G" * 40 + bytes(rng.choice([65, 67, 71, 84], 200).astype(np.uint8)) + b"C" * 40
    fasta = FastaReader()
    fasta._sequences["chr1"] = ref
    graph = ChromosomeGraph(fasta, "chr1", 10, False)
    results = []
    pos = 40
    for i in range(30):
        a_ref = ref[pos:pos + 1]
        alt = b"T" if a_ref != b"T" else b"A"
        v = VariantBubble(
            ref[pos - 9:pos], ref[pos + 1:pos + 10], "chr1", pos, pos + 1,
            [a_ref, alt], [0, 1, 1, 0],
        )
        graph.add_variant_cluster([v], [[]])
        g = GenotypeLikelihoods()
        g.haplotype_1 = int(rng.integers(0, 2))
        g.haplotype_2 = int(rng.integers(0, 2))
        g.coverage = int(rng.integers(3, 30))
        g.nr_unique_kmers = int(rng.integers(0, 30))
        results.append(g)
        pos += 5

    for flag in (False, True):
        fast = str(tmp_path / f"pf{flag}.vcf")
        graph.write_phasing(fast, results, True, "s", ignore_imputed=flag)
        orig = ChromosomeGraph._bulk_phasing_lines
        ChromosomeGraph._bulk_phasing_lines = lambda self, r, ig: (
            np.zeros(self.size(), bool), [None] * self.size()
        )
        try:
            slow = str(tmp_path / f"ps{flag}.vcf")
            graph.write_phasing(slow, results, True, "s",
                                ignore_imputed=flag)
        finally:
            ChromosomeGraph._bulk_phasing_lines = orig
        assert open(fast).read() == open(slow).read()
