"""Native VCF scanner (csrc pg_parse_vcf_chunk) vs the
reference-faithful Python parser: both must produce identical graphs,
and every anomaly the scanner bails on must end in the exact reference
error via the Python re-parse (reference src/graphbuilder.cpp:55-279).
"""

import os

import pytest

from pangenie_tpu.kmers import native
from pangenie_tpu.panel.builder import PanelBuilder

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable"
)


def _build_both(monkeypatch, vcf, fasta, k=10, add_ref=True):
    monkeypatch.delenv("PANGENIE_TPU_NO_NATIVE_VCF", raising=False)
    b_native = PanelBuilder(vcf, fasta, None, k, add_ref)
    monkeypatch.setenv("PANGENIE_TPU_NO_NATIVE_VCF", "1")
    b_python = PanelBuilder(vcf, fasta, None, k, add_ref)
    return b_native, b_python


def _assert_equal(b1: PanelBuilder, b2: PanelBuilder):
    assert b1.nr_paths == b2.nr_paths
    assert b1.nr_variants == b2.nr_variants
    assert b1.chromosomes == b2.chromosomes
    assert set(b1.graphs) == set(b2.graphs)
    for name in b1.graphs:
        g1, g2 = b1.graphs[name], b2.graphs[name]
        assert g1.variant_ids == g2.variant_ids
        assert g1.size() == g2.size()
        for i in range(g1.size()):
            assert g1.get_variant(i) == g2.get_variant(i), (name, i)


@pytest.mark.skipif(not os.path.isdir(DATA), reason="no reference fixtures")
@pytest.mark.parametrize("vcf,add_ref", [
    ("small1.vcf", True), ("small1.vcf", False), ("small2.vcf", True),
])
def test_parity_reference_fixtures(monkeypatch, vcf, add_ref):
    b1, b2 = _build_both(
        monkeypatch, f"{DATA}/{vcf}", f"{DATA}/small1.fa", add_ref=add_ref
    )
    _assert_equal(b1, b2)


def _torture_case(tmp_path):
    """Multiallelic, '.' haplotypes, lowercase, symbolic-ALT skips,
    near-end skips, adjacent clusters, ID fields, two chromosomes."""
    seq1 = (
        "ACGTACGTACGTAAACCCGGGTTTACGTACGTGAGATTACAGATTACAGATTACAGGG"
        "TTTTAAAACCCCGGGGACACACACGTGTGTGTACGTACGTACGTACGTACGTACGTAC"
    )
    seq2 = (
        "TTGACCAATGGACCAATTGGCCAAGGTTACCAGGATTACAGATTACAGATTACAGACCA"
        "AGGTTCCAAGGTTACGTACGTAAACCCGGGTTTACGTACGTACGTACGTACGTACGTAC"
    )
    fasta = tmp_path / "ref.fa"
    fasta.write_text(f">c1\n{seq1}\n>c2\n{seq2}\n")
    rows = [
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2",
        # near start => skipped
        f"c1\t3\t.\t{seq1[2]}\tA\t.\tPASS\t.\tGT\t0|1\t1|1",
        # multiallelic with IDs, lowercase alt
        f"c1\t25\t.\t{seq1[24]}\tt,g\t.\tPASS\tID=v1,v2\tGT\t1|2\t0|1",
        # adjacent (< k-1) => same cluster
        f"c1\t30\t.\t{seq1[29]}\tA\t.\tPASS\tID=v3\tGT\t0|0\t1|0",
        # symbolic ALT => skipped
        f"c1\t40\t.\t{seq1[39]}\t<DEL>\t.\tPASS\t.\tGT\t0|1\t0|0",
        # '.' haplotypes become undefined alleles
        f"c1\t50\t.\t{seq1[49]}\tC\t.\tPASS\tID=v4\tGT\t.|1\t0|.",
        # far => new cluster
        f"c1\t70\t.\t{seq1[69]}\tA\t.\tPASS\t.\tGT\t1|1\t0|0",
        # second chromosome, uncovered alt allele (nobody carries 2)
        f"c2\t30\t.\t{seq2[29]}\tT,C\t.\tPASS\tID=w1,w2\tGT\t0|1\t1|0",
        f"c2\t45\t.\t{seq2[44]}\tA\t.\tPASS\t.\tGT\t0|1\t1|1",
    ]
    vcf = tmp_path / "panel.vcf"
    vcf.write_text("\n".join(rows) + "\n")
    return str(vcf), str(fasta)


@pytest.mark.parametrize("add_ref,chunk", [
    (True, None), (False, None), (True, 64), (True, 200),
])
def test_parity_torture(monkeypatch, tmp_path, add_ref, chunk):
    if chunk is not None:  # force cluster/graph state across chunks
        monkeypatch.setenv("PANGENIE_TPU_VCF_CHUNK", str(chunk))
    vcf, fasta = _torture_case(tmp_path)
    b1, b2 = _build_both(monkeypatch, vcf, fasta, k=10, add_ref=add_ref)
    _assert_equal(b1, b2)
    # sanity on the torture content itself
    g = b1.graphs["c1"]
    assert g.size() == 3  # skipped near-start + symbolic records
    assert g.get_variant(0).is_combined()  # 25+30 merged into a cluster
    undef = b1.graphs["c1"].get_variant(1)
    assert any(undef.is_undefined_allele(a)
               for a in range(undef.nr_of_alleles()))


def test_bail_cases_raise_reference_errors(monkeypatch, tmp_path):
    """Anomalies bail out of the native scanner; the Python re-parse
    must then raise the reference's exact errors."""
    fasta = tmp_path / "ref.fa"
    seq = "ACGTACGTACGTAAACCCGGGTTTACGTACGTGAGATTACAGATTACAGATTACAGGG"
    fasta.write_text(f">c1\n{seq}\n")
    header = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1"
    cases = [
        # REF mismatch vs FASTA
        ("c1\t25\t.\tZ\tA\t.\tPASS\t.\tGT\t0|1", "REF allele"),
        # unphased genotype
        (f"c1\t25\t.\t{seq[24]}\tA\t.\tPASS\t.\tGT\t0/1", "unphased"),
        # non-diploid
        (f"c1\t25\t.\t{seq[24]}\tA\t.\tPASS\t.\tGT\t0|1|1", "diploid"),
        # invalid allele index
        (f"c1\t25\t.\t{seq[24]}\tA\t.\tPASS\t.\tGT\t0|7", "invalid genotype"),
        # overlapping records
        (f"c1\t25\t.\t{seq[24:27]}\tA\t.\tPASS\t.\tGT\t0|1\n"
         f"c1\t26\t.\t{seq[25]}\tA\t.\tPASS\t.\tGT\t0|1", "overlaps"),
        # chromosome missing from FASTA
        ("cX\t25\t.\tA\tC\t.\tPASS\t.\tGT\t0|1", "not present"),
    ]
    for row, msg in cases:
        vcf = tmp_path / "bad.vcf"
        vcf.write_text(header + "\n" + row + "\n")
        with pytest.raises(RuntimeError, match=msg):
            PanelBuilder(str(vcf), str(fasta), None, 10, True)


def test_bail_restores_fasta_reader_state(monkeypatch, tmp_path):
    """A bail AFTER chunks were already consumed must rebuild graphs
    identically on the Python path (chromosome sequences are moved into
    graphs as they are created and must be restored before re-parse).
    A mid-body '#' line is benign for the Python loop (re-validated as
    a header) but always bails the native scanner."""
    vcf, fasta = _torture_case(tmp_path)
    with open(vcf) as fh:
        lines = fh.read().splitlines()
    # insert a duplicate header between the two chromosomes
    idx = next(i for i, ln in enumerate(lines) if ln.startswith("c2"))
    lines.insert(idx, lines[1])
    weird = tmp_path / "weird.vcf"
    weird.write_text("\n".join(lines) + "\n")
    monkeypatch.delenv("PANGENIE_TPU_NO_NATIVE_VCF", raising=False)
    # tiny chunks: the c1 records are consumed (graph created, sequence
    # moved) BEFORE the '#' line bails a later chunk
    monkeypatch.setenv("PANGENIE_TPU_VCF_CHUNK", "64")
    b1 = PanelBuilder(str(weird), str(fasta), None, 10, True)
    monkeypatch.delenv("PANGENIE_TPU_VCF_CHUNK")
    monkeypatch.setenv("PANGENIE_TPU_NO_NATIVE_VCF", "1")
    b2 = PanelBuilder(str(weird), str(fasta), None, 10, True)
    _assert_equal(b1, b2)
