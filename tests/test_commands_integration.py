"""Integration oracle ported from the reference test suite
(reference tests/CommandsTest.cpp): the CLI's genotyping VCF sample
column must equal strings built by driving the HMM directly on the
same unique-kmer records — an internal-consistency check of the whole
command pipeline (the reference uses golden cereal archives; we build
the index from the same region.fa/region.vcf sources instead)."""

import os
import shutil

import numpy as np
import pytest

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference fixtures not available"
)


def _format_gl(value):
    lv = np.log10(value) if value > 0 else float("-inf")
    return f"{lv:.4g}"


def _expected_column(genotypes, records, defined):
    expected = []
    for i, g in enumerate(genotypes):
        specific = g.get_specific_likelihoods(defined[i])
        likelihoods = specific.get_all_likelihoods(len(defined[i]))
        gt = specific.get_likeliest_genotype()
        parts = [
            f"{gt[0]}/{gt[1]}",
            str(specific.get_genotype_quality(gt[0], gt[1])),
            ",".join(_format_gl(v) for v in likelihoods),
            str(records[i].get_coverage()),
        ]
        expected.append(":".join(parts))
    return expected


def _vcf_sample_columns(path):
    return [
        line.rstrip("\n").split("\t")[9]
        for line in open(path)
        if line.strip() and not line.startswith("#")
    ]


def _run(tmp_path, outname="out", **genotype_kwargs):
    from pangenie_tpu.commands import (
        fill_read_kmercounts,
        run_genotype_command,
        run_index_command,
        _load,
    )
    from pangenie_tpu.kmers.counter import ExactKmerCounter
    from pangenie_tpu.model.probabilities import ProbabilityTable

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        shutil.copy(f"{DATA}/region.fa", "region.fa")
        shutil.copy(f"{DATA}/region.vcf", "region.vcf")
        shutil.copy(f"{DATA}/region-reads.fa", "region-reads.fa")
        run_index_command("region.fa", "region.vcf", 31, "index")
        run_genotype_command(
            "index", "region-reads.fa", outname, **genotype_kwargs
        )

        # oracle: reload the index, fill read counts the same way, and
        # drive the HMM directly
        ukm = _load("index_UniqueKmersMap.pkl")
        rc = ExactKmerCounter.count_file_primed(
            "region-reads.fa", ["index_path_segments.fasta"], 31
        )
        peak = rc.compute_histogram(10000, True)
        probs = ProbabilityTable(peak // 4, peak * 4, 2 * peak, 0.01)
        fill_read_kmercounts(
            "chr1", ukm, rc, probs, "index", peak,
            genotype_kwargs.get("panel_size", 0), 1.26, 0.01,
            ukm.add_reference, "", 5,
        )
        return ukm, probs, peak
    finally:
        os.chdir(cwd)


def test_run_genotype_command_full_panel(tmp_path):
    """CommandsTest.cpp 'Commands run_genotype_command1'"""
    from pangenie_tpu.hmm.genotyping import PairHMM

    ukm, probs, peak = _run(tmp_path, sampling_size=215)
    # NOTE: the reference test hard-codes peak=18 for its oracle table,
    # but its assertions hold for any peak whose clamp range contains
    # the local coverages (the HMM uses local coverage); our counter
    # (verified against brute-force substring counts) finds the
    # 30x-cluster peak at 35. The oracle below uses the same peak as
    # the command, which is what the consistency check requires.
    assert peak > 0

    records = ukm.unique_kmers["chr1"]
    assert len(records) == 2
    hmm = PairHMM(records, probs, True, False, 1.26, False, 0.00001)
    genotypes = hmm.get_genotyping_result()
    for g in genotypes:
        g.normalize()
    defined = [[0, 1], [0, 1, 2]]
    expected = _expected_column(genotypes, records, defined)
    computed = _vcf_sample_columns(tmp_path / "out_genotyping.vcf")
    assert computed == expected


def test_run_genotype_command_sampled_panel(tmp_path):
    """CommandsTest.cpp 'Commands run_genotype_command2' — panel
    reduced to 5 haplotypes (+ reference path) before genotyping."""
    from pangenie_tpu.hmm.genotyping import PairHMM

    ukm, probs, _ = _run(tmp_path, outname="out_sampled", panel_size=5)
    records = ukm.unique_kmers["chr1"]
    assert records[0].get_nr_paths() == 6  # 5 sampled + reference
    hmm = PairHMM(records, probs, True, False, 1.26, False, 0.00001)
    genotypes = hmm.get_genotyping_result()
    for g in genotypes:
        g.normalize()
    defined = [[0, 1], [0, 1, 2]]
    expected = _expected_column(genotypes, records, defined)
    computed = _vcf_sample_columns(tmp_path / "out_sampled_genotyping.vcf")
    assert computed == expected


def test_single_vs_index_path_agree(tmp_path):
    """The fused single command and the index+genotype split must
    produce identical VCF bodies on the same inputs."""
    from pangenie_tpu.commands import run_single_command

    _run(tmp_path, sampling_size=215)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_single_command(
            "region-reads.fa", "region.fa", "region.vcf", 31, "single",
            sampling_size=215,
        )
    finally:
        os.chdir(cwd)

    def body(p):
        return [l for l in open(p) if not l.startswith("##")]

    assert body(tmp_path / "single_genotyping.vcf") == body(
        tmp_path / "out_genotyping.vcf"
    )
