"""End-to-end demo regression: CLI index + genotype must bit-match the
reference's committed expected output (demo/test_genotyping.vcf).

Runs in-process against the reference demo data (read-only mount);
skipped when the demo files are unavailable.
"""

import os
import shutil

import pytest

DEMO = "/root/reference/demo"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DEMO), reason="reference demo data not available"
)


def _strip_header(path):
    with open(path) as f:
        return [line for line in f if not line.startswith("##")]


def test_demo_index_genotype_bitmatch(tmp_path):
    from pangenie_tpu.commands import run_genotype_command, run_index_command

    for name in ("test-reference.fa", "test-variants.vcf", "test-reads.fa"):
        shutil.copy(os.path.join(DEMO, name), tmp_path)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_index_command("test-reference.fa", "test-variants.vcf", 31, "pre")
        run_genotype_command("pre", "test-reads.fa", "out")
    finally:
        os.chdir(cwd)

    got = _strip_header(tmp_path / "out_genotyping.vcf")
    expected = _strip_header(os.path.join(DEMO, "test_genotyping.vcf"))
    assert got == expected


def test_demo_phasing_genotypes(tmp_path):
    """Phased GTs must match the committed demo phasing VCF.

    Only the GT column is compared: the committed file predates the
    reference's v4 kmer-selection caps (fileDate 2023 vs 2025), so its
    UK/KC annotations reflect older selection semantics.
    """
    from pangenie_tpu.commands import (
        run_genotype_command,
        run_index_command,
    )

    for name in ("test-reference.fa", "test-variants.vcf", "test-reads.fa"):
        shutil.copy(os.path.join(DEMO, name), tmp_path)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_index_command("test-reference.fa", "test-variants.vcf", 31, "pre")
        run_genotype_command(
            "pre", "test-reads.fa", "out", only_genotyping=False
        )
    finally:
        os.chdir(cwd)

    def gts(lines):
        return [
            line.split("\t")[9].split(":")[0]
            for line in lines
            if not line.startswith("#")
        ]

    got = gts(_strip_header(tmp_path / "out_phasing.vcf"))
    expected = gts(_strip_header(os.path.join(DEMO, "test_phasing.vcf")))
    assert got == expected


def test_demo_serialize_then_vcf_bitmatch(tmp_path):
    """genotype -z (serialize Results — including the array-resident
    bulk-likelihood channel — to a pickle) followed by the `vcf`
    command must reproduce the direct write byte-for-byte AND the
    reference's committed output (reference src/commands.cpp:1088-1154)."""
    from pangenie_tpu.commands import (
        run_genotype_command,
        run_index_command,
        run_vcf_command,
    )

    for name in ("test-reference.fa", "test-variants.vcf", "test-reads.fa"):
        shutil.copy(os.path.join(DEMO, name), tmp_path)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_index_command("test-reference.fa", "test-variants.vcf", 31, "pre")
        run_genotype_command("pre", "test-reads.fa", "direct")
        run_genotype_command(
            "pre", "test-reads.fa", "ser", serialize_output=True
        )
        assert os.path.exists("ser_genotyping.pkl")
        run_vcf_command("pre", "ser_genotyping.pkl", "fromser")
    finally:
        os.chdir(cwd)

    direct = _strip_header(tmp_path / "direct_genotyping.vcf")
    fromser = _strip_header(tmp_path / "fromser_genotyping.vcf")
    assert fromser == direct
    expected = _strip_header(os.path.join(DEMO, "test_genotyping.vcf"))
    assert fromser == expected
