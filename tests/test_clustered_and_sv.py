"""End-to-end coverage for the two remaining workload shapes:

- CLUSTERED variants (< k-1 bp apart) that merge into multi-allelic
  bubbles and must be separated back into per-variant VCF records with
  projected likelihoods,
- SV-rich panels with large (hundreds of bp) insertion alleles.
"""

import os

import numpy as np
import pytest

from pangenie_tpu.eval.concordance import genotype_concordance
from pangenie_tpu.utils import simulate as sim


def _write_truth(path, variants, sample):
    with open(path, "w") as out:
        out.write("##fileformat=VCFv4.2\n")
        out.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        for v in variants:
            a, b = sorted(v.genotypes[sample])
            out.write(
                f"chr1\t{v.position + 1}\t.\t{v.ref.decode()}\t"
                f"{','.join(x.decode() for x in v.alts)}\t.\tPASS\t.\tGT\t"
                f"{a}/{b}\n"
            )


def _run_sim(tmp_path, variants, reference, rng, coverage=25):
    from pangenie_tpu.commands import run_single_command

    sim.write_inputs(str(tmp_path), reference, variants)
    hap1, hap2 = sim.haplotype_sequences(reference, variants, 0)
    sim.simulate_reads(
        hap1, hap2, coverage, 100, rng, outfile=str(tmp_path / "reads.fa")
    )
    _write_truth(tmp_path / "truth.vcf", variants, 0)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_single_command("reads.fa", "ref.fa", "panel.vcf", 31, "out")
    finally:
        os.chdir(cwd)
    return genotype_concordance(
        str(tmp_path / "out_genotyping.vcf"), str(tmp_path / "truth.vcf")
    )


def test_clustered_variants_merge_and_separate(tmp_path):
    rng = np.random.default_rng(21)
    reference = sim.random_reference(80_000, rng)
    variants = sim.simulate_panel(
        reference, nr_samples=6, rng=rng, cluster_fraction=0.6
    )
    # make sure clustering actually happened
    gaps = [
        variants[i + 1].position - (variants[i].position + len(variants[i].ref))
        for i in range(len(variants) - 1)
    ]
    assert sum(1 for g in gaps if g < 30) > 10

    result = _run_sim(tmp_path, variants, reference, rng)
    # every truth record must reappear as its own VCF line (separation)
    assert result.total == len(variants)
    assert result.no_call == 0
    assert result.concordance > 0.9, (result.concordance, result.by_class)


def test_sv_insertions(tmp_path):
    rng = np.random.default_rng(33)
    reference = sim.random_reference(80_000, rng)
    variants = sim.simulate_panel(
        reference, nr_samples=6, rng=rng, sv_fraction=0.3, sv_length=300
    )
    assert any(
        max(len(a) for a in v.alts) > 150 for v in variants
    )
    result = _run_sim(tmp_path, variants, reference, rng)
    assert result.concordance > 0.9, (result.concordance, result.by_class)
