"""CLI flag-parity tests against the reference binaries' option sets
(src/pangenie-genotype.cpp:49-74, src/pangenie-vcf.cpp:31-38)."""

import pytest

from pangenie_tpu import cli


def test_vcf_flags_match_reference(monkeypatch):
    """vcf takes -z (serialized results) and plain -p (phasing), exactly
    as PanGenie-vcf does (src/pangenie-vcf.cpp:31-38)."""
    calls = {}

    def fake_run_vcf(prefix, results, outname, sample, only_g, only_p,
                     ignore_imputed):
        calls.update(
            prefix=prefix, results=results, outname=outname, sample=sample,
            only_g=only_g, only_p=only_p, ignore_imputed=ignore_imputed,
        )
        return 0

    from pangenie_tpu import commands

    monkeypatch.setattr(commands, "run_vcf_command", fake_run_vcf)
    rc = cli.main([
        "vcf", "-f", "idx", "-z", "res.pkl", "-o", "out", "-g", "-p",
    ])
    assert rc == 0
    assert calls["prefix"] == "idx"
    assert calls["results"] == "res.pkl"
    assert calls["outname"] == "out"
    # -g -p together: both phases (only_genotyping False, only_phasing False)
    assert calls["only_g"] is False and calls["only_p"] is False


def test_vcf_requires_z():
    with pytest.raises(SystemExit):
        cli.main(["vcf", "-f", "idx", "-o", "out"])


def test_genotype_exactly_one_of_f_and_rv():
    with pytest.raises(SystemExit):
        cli.main(["genotype", "-i", "r.fa", "-o", "out"])
    with pytest.raises(SystemExit):
        cli.main([
            "genotype", "-i", "r.fa", "-f", "idx", "-r", "ref.fa",
            "-v", "v.vcf", "-o", "out",
        ])


def test_genotype_x_a_mutually_exclusive():
    with pytest.raises(SystemExit):
        cli.main([
            "genotype", "-i", "r.fa", "-f", "idx", "-x", "10", "-a", "8",
        ])


def test_genotype_k_conflicts_with_f():
    with pytest.raises(SystemExit):
        cli.main(["genotype", "-i", "r.fa", "-f", "idx", "-k", "25"])
