"""PanelBuilder / ChromosomeGraph oracles ported from the reference
test suite (reference tests/GraphBuilderTest.cpp), driven against the
reference's committed VCF/FASTA fixtures (read-only mount)."""

import os

import pytest

from pangenie_tpu.panel.builder import PanelBuilder
from pangenie_tpu.panel.graph import ChromosomeGraph, construct_index
from pangenie_tpu.panel.variant import SampledPanel, VariantBubble

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference test fixtures not available"
)


def build(vcf, fasta=f"{DATA}/small1.fa", segments=None, k=10, add_ref=False):
    return PanelBuilder(vcf, fasta, segments, k, add_ref)


def test_get_allele_string(tmp_path):
    """GraphBuilderTest.cpp 'GraphBuilder get_allele_string'"""
    b = build(f"{DATA}/small1.vcf", segments=str(tmp_path / "seg.fa"),
              add_ref=True)
    assert b.get_chromosomes() == ["chrA", "chrB"]
    assert b.get_kmer_size() == 10
    assert b.nr_of_paths() == 5

    chrA = b.graphs["chrA"]
    chrB = b.graphs["chrB"]
    assert chrA.size() == 7
    assert chrB.size() == 2
    assert chrA.get_variant(2).nr_of_alleles() == 3
    assert chrA.get_variant(2).nr_of_paths() == 5

    expected = {
        (0, 0): "GGAATTCCGACATAAGTTA", (0, 1): "GGAATTCCGTCATAAGTTA",
        (1, 0): "CCTTAGCTACGAAGCCAGT", (1, 1): "CCTTAGCTAGGGGGAAGCCAGT",
        (2, 0): "GAAGCCAGTGCCCCGAGACGGCCAAA",
        (2, 1): "GAAGCCAGTTCCCCGAGACGGCCAAA",
        (2, 2): "GAAGCCAGTTCCCCTACGGCCAAA",
        (3, 0): "ACGTCCGTTCAGCCTTAGC", (3, 1): "ACGTCCGTTTAGCCTTAGC",
        (4, 0): "CCGATTTTCTTGTGCTATA", (4, 1): "CCGATTTTCCTGTGCTATA",
        (5, 0): "GGAGGGTATGAAGCCATCAC", (5, 1): "GGAGGGTATTCAGCCATCAC",
        (6, 0): "TGTGGACTTATTTGGCTAA", (6, 1): "TGTGGACTTGTTTGGCTAA",
    }
    for (v, a), seq in expected.items():
        assert chrA.get_variant(v).get_allele_string(a) == seq
    assert chrB.get_variant(0).get_allele_string(0) == "CCACTTCATCAAGACACAA"
    assert chrB.get_variant(1).get_allele_string(0) == "GAGTATTTTGATCATAAAT"


def test_get_overhang(tmp_path):
    """GraphBuilderTest.cpp 'GraphBuilder get_overhang'"""
    b = build(f"{DATA}/small1.vcf", segments=str(tmp_path / "seg.fa"))
    chrA = b.graphs["chrA"]
    assert chrA.get_left_overhang(0, 20) == b"TTTGGTGATCTGGAATTCCG"
    assert chrA.get_right_overhang(0, 20) == b"CATAAGTTATGCTAAAAAAT"
    assert chrA.get_left_overhang(1, 20) == b"GTCTGTTAAGACCTTAGCTA"
    assert chrA.get_right_overhang(1, 20) == b"GAAGCCAGT"
    assert chrA.get_left_overhang(2, 20) == b"GAAGCCAGT"
    assert chrA.get_right_overhang(2, 20) == b"ACGGCCAAAACATACCATTT"
    assert b.nr_of_paths() == 4


def test_write_path_segments(tmp_path):
    """GraphBuilderTest.cpp 'GraphBuilder write_path_segments' —
    reference unitigs must match the committed expected file."""
    seg = str(tmp_path / "seg.fa")
    build(f"{DATA}/small1.vcf", segments=seg)

    expected = [
        line.strip()
        for line in open(f"{DATA}/small1-expected-ref-segments.fa")
        if line.strip()
    ]
    computed = []
    read_next = False
    for line in open(seg):
        line = line.strip()
        if not line:
            continue
        if line.startswith(">"):
            read_next = "reference" in line
            continue
        if read_next:
            computed.append(line)
    assert computed == expected


def test_write_path_segments_no_variants(tmp_path):
    """Empty VCF: whole chromosomes written as reference_end records."""
    seg = str(tmp_path / "seg.fa")
    build(f"{DATA}/empty.vcf", segments=seg)
    names = [l[1:].strip() for l in open(seg) if l.startswith(">")]
    assert all("reference_end" in n for n in names)
    assert names == ["chrA_reference_end", "chrB_reference_end",
                     "chrC_reference_end"]


def test_broken_vcfs(tmp_path):
    with pytest.raises(RuntimeError):
        build(f"{DATA}/no-paths.vcf", segments=str(tmp_path / "s.fa"))
    with pytest.raises(RuntimeError):
        build(f"{DATA}/malformatted-vcf1.vcf", segments=str(tmp_path / "s.fa"))


def test_no_alt_alleles(tmp_path):
    """Symbolic ALT alleles are skipped."""
    b = build(f"{DATA}/no-alt-alleles.vcf", segments=str(tmp_path / "s.fa"))
    assert b.graphs["chrA"].size() == 1


def test_overlapping_variants(tmp_path):
    with pytest.raises(RuntimeError):
        build(f"{DATA}/overlapping-variants.vcf",
              segments=str(tmp_path / "s.fa"))


def test_get_chromosomes(tmp_path):
    b1 = build(f"{DATA}/small1.vcf", segments=str(tmp_path / "s1.fa"))
    assert b1.get_chromosomes() == ["chrA", "chrB"]
    b2 = build(f"{DATA}/small2.vcf", segments=str(tmp_path / "s2.fa"))
    assert b2.get_chromosomes() == ["chrB", "chrC", "chrA"]


def test_construct_index():
    sequences = [b"TTTTT", b"AATAGTAAAGTTATA", b"AATAGTAAAGTGATA",
                 b"GGGTG", b"TTG"]
    assert construct_index(sequences, True) == [1, 0, 2, 3]


def _graph_with_ids(alleles, ids):
    from pangenie_tpu.io.fasta import FastaReader

    g = ChromosomeGraph(FastaReader(), "chrA", 10, False)
    g._insert_ids(alleles, ids, True)
    return g


def test_variant_ids1():
    """GraphBuilderTest.cpp 'GraphBuilder variant_ids1'"""
    sequences_ref = [b"TGGG", b"AATAGTAAAGTTATA", b"GTAGATAGATA",
                     b"AATAGTAAAGTGATA", b"GGGTG", b"TTG"]
    sequence_to_id = {
        "AATAGTAAAGTTATA": "var1", "GTAGATAGATA": "var2",
        "AATAGTAAAGTGATA": "var3", "GGGTG": "var4", "TTG": "var5:var6",
    }
    ids = ["var1", "var2", "var3", "var4", "var5:var6"]
    g = _graph_with_ids(sequences_ref, ids)
    import random

    sequences = list(sequence_to_id.keys())
    rng = random.Random(11)
    for _ in range(10):
        rng.shuffle(sequences)
        expected = ",".join(sequence_to_id[s] for s in sequences)
        assert g._get_ids(sequences, 0, False) == expected


def test_variant_ids3():
    sequences_ref = [b"CA", b"CAAAAA", b"CAAAA", b"C", b"CAA"]
    sequence_to_id = {"CAAAAA": "var1", "CAAAA": "var2", "C": "var3",
                      "CAA": "var4"}
    ids = ["var1", "var2", "var3", "var4"]
    g = _graph_with_ids(sequences_ref, ids)
    import random

    sequences = list(sequence_to_id.keys())
    rng = random.Random(7)
    for _ in range(10):
        rng.shuffle(sequences)
        expected = ",".join(sequence_to_id[s] for s in sequences)
        assert g._get_ids(sequences, 0, False) == expected


def test_close_to_start(tmp_path):
    """Variants closer than 2k to the chromosome start are skipped."""
    b = PanelBuilder(f"{DATA}/close.vcf", f"{DATA}/close.fa",
                     str(tmp_path / "s.fa"), 31, True)
    assert b.graphs["chr10"].size() == 1


def test_too_large_panel(tmp_path):
    with pytest.raises(RuntimeError):
        build(f"{DATA}/large-panel.vcf", segments=str(tmp_path / "s.fa"))
    with pytest.raises(RuntimeError):
        build(f"{DATA}/large-panel.vcf", segments=str(tmp_path / "s.fa"),
              add_ref=True)


def test_too_many_alleles(tmp_path):
    with pytest.raises(RuntimeError):
        build(f"{DATA}/many-alleles.vcf", segments=str(tmp_path / "s.fa"))


def test_unknown_alleles(tmp_path):
    """GT:PS-formatted '.' haplotypes (reference parses with atoi)."""
    build(f"{DATA}/small3.vcf", segments=str(tmp_path / "s.fa"))


def test_unknown_alleles2():
    """GraphBuilderTest.cpp 'GraphBuilder unknown_alleles2'"""
    from pangenie_tpu.io.fasta import FastaReader

    v1 = VariantBubble(
        b"AAAA", b"TTTT", "chr1", 10, 11,
        [b"G", b"AAA", b"CN", b"C", b"N", b"A"], [0, 1, 2],
    )
    g = ChromosomeGraph(FastaReader(), "chr1", 10, False)
    g.add_variant_cluster([v1], [["var1", "var2", "var3"]],
                          only_defined_ids=True)
    assert g._get_ids(["G", "A", "C", "AAA"], 0, True) == "var3,var2,var1"


def test_write_sampled_panel_bytes(tmp_path):
    """GraphBuilderTest.cpp 'GraphBuilder write_sampled_panel' — byte
    oracle for the panel VCF data lines."""
    b = build(f"{DATA}/small4.vcf", segments=str(tmp_path / "s.fa"))
    assert b.get_chromosomes() == ["chrA"]
    graph = b.graphs["chrA"]
    assert graph.size() == 1

    v = graph.get_variant(0)
    path_to_allele = [v.get_allele_on_path(i) for i in range(v.nr_of_paths())]
    panel = SampledPanel(path_to_allele, 14)
    out = str(tmp_path / "panel.vcf")
    graph.write_sampled_panel(out, [panel], True)

    lines = [
        line.rstrip("\n").split("\t")
        for line in open(out)
        if line.strip() and not line.startswith("#")
    ]
    assert len(lines) == 2
    assert lines[0] == [
        "chrA", "161", ".", "G", "TA,TAAA", ".", "PASS",
        "AF=0.375,0.416667;UK=14;MA=2", "GT", "0", "1", "1", "1", "2", "1",
        "2", "2", "2", "1", "1", "0", "2", "2", ".", ".", "1", "2", "2",
        "1", "2", "2", "1", "0",
    ]
    assert lines[1] == [
        "chrA", "166", ".", "G", "T", ".", "PASS",
        "AF=0.666667;UK=14;MA=6", "GT", ".", "1", ".", ".", ".", "1", "1",
        "1", "1", "1", "1", "0", "1", "1", ".", ".", "1", "1", "1", "1",
        "1", "1", "1", "0",
    ]
