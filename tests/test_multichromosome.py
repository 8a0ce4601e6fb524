"""Multi-chromosome, multi-subset end-to-end: exercises the batched
(chromosome x subset) device execution and VCF output ordering."""

import os

import numpy as np
import pytest

from pangenie_tpu.eval.concordance import genotype_concordance
from pangenie_tpu.utils import simulate as sim


def test_multichromosome_subsets(tmp_path):
    from pangenie_tpu.commands import run_single_command

    rng = np.random.default_rng(77)
    chroms = {}
    for name, length in [("chrA", 30_000), ("chrB", 28_000), ("chrC", 9_000)]:
        reference = sim.random_reference(length, rng)
        variants = sim.simulate_panel(reference, nr_samples=6, rng=rng)
        chroms[name] = (reference, variants)

    # write combined FASTA + VCF
    with open(tmp_path / "ref.fa", "w") as out:
        for name, (reference, _) in chroms.items():
            out.write(f">{name}\n{reference.decode()}\n")
    with open(tmp_path / "panel.vcf", "w") as out:
        out.write("##fileformat=VCFv4.2\n")
        samples = "\t".join(f"S{i}" for i in range(6))
        out.write(
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + samples + "\n"
        )
        for name, (_, variants) in chroms.items():
            for v in variants:
                gts = "\t".join(f"{a}|{b}" for a, b in v.genotypes)
                out.write(
                    f"{name}\t{v.position + 1}\t.\t{v.ref.decode()}\t"
                    f"{','.join(a.decode() for a in v.alts)}\t.\tPASS\t.\tGT\t"
                    + gts + "\n"
                )

    # reads + truth for sample 0 across all chromosomes
    reads = []
    with open(tmp_path / "truth.vcf", "w") as truth:
        truth.write("##fileformat=VCFv4.2\n")
        truth.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        for name, (reference, variants) in chroms.items():
            hap1, hap2 = sim.haplotype_sequences(reference, variants, 0)
            reads.extend(
                sim.simulate_reads(hap1, hap2, 25, 100, rng)
            )
            for v in variants:
                a, b = sorted(v.genotypes[0])
                truth.write(
                    f"{name}\t{v.position + 1}\t.\t{v.ref.decode()}\t"
                    f"{','.join(x.decode() for x in v.alts)}\t.\tPASS\t.\t"
                    f"GT\t{a}/{b}\n"
                )
    with open(tmp_path / "reads.fa", "w") as out:
        for i, read in enumerate(reads):
            out.write(f">r{i}\n{read.decode()}\n")

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        # sampling_size=6 on a 13-path panel -> 3 subsets per chromosome
        run_single_command(
            "reads.fa", "ref.fa", "panel.vcf", 31, "out", sampling_size=6,
        )
    finally:
        os.chdir(cwd)

    out_lines = [
        line.split("\t")[0]
        for line in open(tmp_path / "out_genotyping.vcf")
        if not line.startswith("#")
    ]
    # single-command output follows bubble-count-descending chromosome
    # order (reference GraphBuilder::get_chromosomes)
    sizes = {n: len(v) for n, (_, v) in chroms.items()}
    expected_order = sorted(sizes, key=lambda n: (-sizes[n], n))
    seen_order = list(dict.fromkeys(out_lines))
    assert seen_order == expected_order

    result = genotype_concordance(
        str(tmp_path / "out_genotyping.vcf"), str(tmp_path / "truth.vcf")
    )
    assert result.concordance > 0.85, (result.concordance, result.by_class)


def test_concordance_keys_by_chromosome(tmp_path):
    """Positions repeat across chromosomes; the evaluator must not
    collide them (a position-only key silently dropped records and
    paired truth/call entries from different chromosomes)."""
    from pangenie_tpu.eval.concordance import genotype_concordance

    header = "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
    called = tmp_path / "called.vcf"
    truth = tmp_path / "truth.vcf"
    # same position 100 on two chromosomes, with DIFFERENT genotypes:
    # chr1 matches, chr2 matches; a collapsed dict would compare
    # chr2's truth against chr2's call only (1 comparison instead of 2)
    called.write_text(
        header
        + "chr1\t100\t.\tA\tT\t.\tPASS\t.\tGT\t0/1\n"
        + "chr2\t100\t.\tG\tC\t.\tPASS\t.\tGT\t1/1\n"
    )
    truth.write_text(
        header
        + "chr1\t100\t.\tA\tT\t.\tPASS\t.\tGT\t0/1\n"
        + "chr2\t100\t.\tG\tC\t.\tPASS\t.\tGT\t0/0\n"
    )
    r = genotype_concordance(str(called), str(truth))
    assert r.total == 2
    assert r.correct == 1
    assert r.wrong == 1
