"""Mid-scale synthetic end-to-end: simulate a pangenome + reads,
genotype with the full pipeline, check concordance with the truth."""

import os

import numpy as np
import pytest

from pangenie_tpu.eval.concordance import genotype_concordance
from pangenie_tpu.utils import simulate as sim


def _write_truth_vcf(path, variants, sample, chromosome="chr1"):
    with open(path, "w") as out:
        out.write("##fileformat=VCFv4.2\n")
        out.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        for v in variants:
            a, b = sorted(v.genotypes[sample])
            out.write(
                f"{chromosome}\t{v.position + 1}\t.\t{v.ref.decode()}\t"
                f"{','.join(x.decode() for x in v.alts)}\t.\tPASS\t.\tGT\t"
                f"{a}/{b}\n"
            )


@pytest.mark.parametrize("panel_size", [0, 6])
def test_simulated_genotyping_concordance(tmp_path, panel_size):
    from pangenie_tpu.commands import run_single_command

    rng = np.random.default_rng(1234)
    reference = sim.random_reference(60_000, rng)
    variants = sim.simulate_panel(reference, nr_samples=8, rng=rng)
    assert len(variants) > 50

    sim.write_inputs(str(tmp_path), reference, variants)
    hap1, hap2 = sim.haplotype_sequences(reference, variants, sample=0)
    sim.simulate_reads(
        hap1, hap2, coverage=25, read_length=100, rng=rng,
        outfile=str(tmp_path / "reads.fa"),
    )
    _write_truth_vcf(tmp_path / "truth.vcf", variants, sample=0)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_single_command(
            "reads.fa", "ref.fa", "panel.vcf", 31, "out",
            panel_size=panel_size,
        )
    finally:
        os.chdir(cwd)

    result = genotype_concordance(
        str(tmp_path / "out_genotyping.vcf"), str(tmp_path / "truth.vcf")
    )
    # sample 0 is part of the panel: the genotyper should recover the
    # vast majority of its genotypes from 25x reads
    assert result.total == len(variants)
    assert result.concordance > 0.9, (
        result.concordance, result.by_class, result.no_call
    )


def test_leave_one_out_genotyping(tmp_path):
    """Genotype a sample NOT in the panel (the production use case:
    re-genotyping new samples against a fixed haplotype panel)."""
    from pangenie_tpu.commands import run_single_command

    rng = np.random.default_rng(99)
    reference = sim.random_reference(120_000, rng)
    variants = sim.simulate_panel(reference, nr_samples=31, rng=rng)
    panel_variants = [
        sim.SimVariant(v.position, v.ref, v.alts, v.genotypes[1:])
        for v in variants
    ]
    sim.write_inputs(str(tmp_path), reference, panel_variants)
    hap1, hap2 = sim.haplotype_sequences(reference, variants, sample=0)
    sim.simulate_reads(hap1, hap2, 30, 150, rng,
                       outfile=str(tmp_path / "reads.fa"))
    _write_truth_vcf(tmp_path / "truth.vcf", variants, sample=0)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_single_command("reads.fa", "ref.fa", "panel.vcf", 31, "out")
    finally:
        os.chdir(cwd)

    result = genotype_concordance(
        str(tmp_path / "out_genotyping.vcf"), str(tmp_path / "truth.vcf")
    )
    # out-of-panel: limited by how well panel haplotypes tile the
    # target; anything above ~90% indicates working imputation
    assert result.concordance > 0.9, (result.concordance, result.by_class)
