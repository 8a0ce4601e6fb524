"""The flat-vectorized StepwiseUniqueKmerComputer must produce
byte-identical kmer TSVs and equal records to the per-bubble reference
implementation."""

import gzip

import numpy as np

from pangenie_tpu.kmers.counter import ExactKmerCounter
from pangenie_tpu.kmers.unique import StepwiseUniqueKmerComputer
from pangenie_tpu.panel.builder import PanelBuilder
from pangenie_tpu.utils import simulate as sim


def test_stepwise_flat_matches_reference(tmp_path):
    rng = np.random.default_rng(17)
    ref = sim.random_reference(50_000, rng)
    variants = sim.simulate_panel(
        ref, nr_samples=7, rng=rng, mean_distance=130,
        cluster_fraction=0.2, sv_fraction=0.05, sv_length=100,
    )
    variants[2].genotypes[1] = (None, variants[2].genotypes[1][1])
    with open(tmp_path / "panel.vcf", "w") as out:
        out.write("##fileformat=VCFv4.2\n")
        out.write(
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + "\t".join(f"S{i}" for i in range(7)) + "\n"
        )
        for v in variants:
            gts = "\t".join(
                f"{x if x is not None else '.'}|"
                f"{y if y is not None else '.'}"
                for x, y in v.genotypes
            )
            out.write(
                f"chr1\t{v.position + 1}\t.\t{v.ref.decode()}\t"
                f"{','.join(a.decode() for a in v.alts)}\t.\tPASS\t.\tGT\t"
                + gts + "\n"
            )
    with open(tmp_path / "ref.fa", "w") as out:
        out.write(">chr1\n" + ref.decode() + "\n")

    k = 31
    builder = PanelBuilder(
        str(tmp_path / "panel.vcf"), str(tmp_path / "ref.fa"),
        str(tmp_path / "segments.fa"), k, False,
    )
    genomic = ExactKmerCounter.count_file(str(tmp_path / "segments.fa"), k)
    graph = builder.graphs["chr1"]

    new = StepwiseUniqueKmerComputer(genomic, graph).compute_unique_kmers(
        str(tmp_path / "new.tsv.gz")
    )
    old = StepwiseUniqueKmerComputer(
        genomic, graph
    ).compute_unique_kmers_reference(str(tmp_path / "old.tsv.gz"))

    with gzip.open(tmp_path / "new.tsv.gz", "rb") as f:
        new_tsv = f.read()
    with gzip.open(tmp_path / "old.tsv.gz", "rb") as f:
        old_tsv = f.read()
    assert new_tsv == old_tsv
    assert b"," in new_tsv  # at least one multi-kmer field emitted

    assert len(new) == len(old) and len(new) > 20
    for a, b in zip(new, old):
        assert a.variant_position == b.variant_position
        assert a.coverage == b.coverage
        assert np.array_equal(a.path_to_allele, b.path_to_allele)
        assert np.array_equal(a.kmer_counts, b.kmer_counts)
        assert np.array_equal(a.allele_data, b.allele_data)
        assert np.array_equal(a.allele_indptr, b.allele_indptr)
        assert a.alleles == b.alleles
