"""Full-option-matrix end-to-end: multi-chromosome index path with
genotyping + phasing + path subsets (-g -p -a), and the -w/vcf
serialization round trip producing identical output."""

import os

import numpy as np
import pytest

from pangenie_tpu.utils import simulate as sim


def test_subsets_phasing_serialize_roundtrip(tmp_path):
    from pangenie_tpu.commands import (
        run_genotype_command,
        run_index_command,
        run_vcf_command,
    )
    from pangenie_tpu.panel.sampling import reset_global_rand

    rng = np.random.default_rng(3)
    chroms = {}
    with open(tmp_path / "ref.fa", "w") as fa, open(
        tmp_path / "panel.vcf", "w"
    ) as vcf:
        vcf.write("##fileformat=VCFv4.2\n")
        vcf.write(
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + "\t".join(f"S{i}" for i in range(8)) + "\n"
        )
        for name in ("chr1", "chr2"):
            ref = sim.random_reference(30_000, rng)
            variants = sim.simulate_panel(
                ref, nr_samples=8, rng=rng, cluster_fraction=0.3
            )
            chroms[name] = (ref, variants)
            fa.write(f">{name}\n{ref.decode()}\n")
            for v in variants:
                gts = "\t".join(f"{a}|{b}" for a, b in v.genotypes)
                vcf.write(
                    f"{name}\t{v.position + 1}\t.\t{v.ref.decode()}\t"
                    f"{','.join(x.decode() for x in v.alts)}\t.\tPASS\t.\t"
                    f"GT\t{gts}\n"
                )
    reads = []
    for name, (ref, variants) in chroms.items():
        h1, h2 = sim.haplotype_sequences(ref, variants, 0)
        reads.extend(sim.simulate_reads(h1, h2, 25, 100, rng))
    with open(tmp_path / "reads.fa", "w") as out:
        for i, r in enumerate(reads):
            out.write(f">r{i}\n{r.decode()}\n")

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_index_command("ref.fa", "panel.vcf", 31, "idx")
        reset_global_rand()  # deterministic subsets regardless of test order
        run_genotype_command(
            "idx", "reads.fa", "outw", only_genotyping=False,
            sampling_size=6, serialize_output=True,
        )
        run_vcf_command(
            "idx", "outw_genotyping.pkl", "outv", only_genotyping=False
        )
        # fresh rand() stream, as a separate process would have
        reset_global_rand()
        run_genotype_command(
            "idx", "reads.fa", "outd", only_genotyping=False,
            sampling_size=6,
        )
    finally:
        os.chdir(cwd)

    for suffix in ("genotyping", "phasing"):
        a = [
            l for l in open(tmp_path / f"outv_{suffix}.vcf")
            if not l.startswith("##")
        ]
        b = [
            l for l in open(tmp_path / f"outd_{suffix}.vcf")
            if not l.startswith("##")
        ]
        assert a == b, suffix
        assert sum(1 for l in a if not l.startswith("#")) > 50
