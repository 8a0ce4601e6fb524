"""Native FASTA block streaming must agree with the per-read Python
path (iter_sequences), including multi-line records, CRLF endings,
lowercase bases, tiny block sizes, and multi-host read sharding."""

import numpy as np
import pytest

from pangenie_tpu.kmers import native
from pangenie_tpu.kmers.counter import (
    ExactKmerCounter,
    iter_sequences,
    try_sequence_blocks,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable"
)


def _write_fasta(path, seqs, line_width=0, crlf=False):
    eol = "\r\n" if crlf else "\n"
    with open(path, "w", newline="") as out:
        for i, s in enumerate(seqs):
            out.write(f">seq{i} description {i}{eol}")
            if line_width:
                for j in range(0, len(s), line_width):
                    out.write(s[j:j + line_width] + eol)
            else:
                out.write(s + eol)


def _collect(blocks):
    seqs = []
    for data, offsets in blocks:
        for i in range(len(offsets) - 1):
            seqs.append(bytes(data[offsets[i]:offsets[i + 1]]))
    return seqs


def test_blocks_match_iter_sequences(tmp_path):
    rng = np.random.default_rng(3)
    bases = "ACGTacgtN"
    seqs = [
        "".join(rng.choice(list(bases), size=rng.integers(1, 300)))
        for _ in range(57)
    ]
    for crlf in (False, True):
        for width in (0, 60):
            p = tmp_path / f"r_{crlf}_{width}.fa"
            _write_fasta(p, seqs, line_width=width, crlf=crlf)
            got = _collect(try_sequence_blocks(str(p), block_bytes=512))
            want = [s.upper() for s in iter_sequences(str(p))]
            # block parser keeps original case (the C++ code table is
            # case-insensitive); compare case-folded
            assert [g.upper() for g in got] == want, (crlf, width)


def test_blocks_none_for_fastq_and_gz(tmp_path):
    fq = tmp_path / "r.fq"
    fq.write_text("@r0\nACGT\n+\nFFFF\n")
    assert try_sequence_blocks(str(fq)) is None
    assert try_sequence_blocks(str(tmp_path / "x.gz")) is None


def test_primed_counts_match_slow_path(tmp_path):
    rng = np.random.default_rng(5)
    genome = "".join(rng.choice(list("ACGT"), size=5000))
    reads = [
        genome[s:s + 100]
        for s in rng.integers(0, 4900, size=200)
    ]
    _write_fasta(tmp_path / "reads.fa", reads, line_width=61)
    _write_fasta(tmp_path / "corpus.fa", [genome])
    k = 31
    fast = ExactKmerCounter.count_file_primed(
        str(tmp_path / "reads.fa"), [str(tmp_path / "corpus.fa")], k
    )
    # force the slow path by disabling block streaming
    import pangenie_tpu.kmers.counter as counter_mod

    orig = counter_mod.try_sequence_blocks
    counter_mod.try_sequence_blocks = lambda *a, **kw: None
    try:
        slow = ExactKmerCounter.count_file_primed(
            str(tmp_path / "reads.fa"), [str(tmp_path / "corpus.fa")], k
        )
    finally:
        counter_mod.try_sequence_blocks = orig
    assert np.array_equal(fast.keys, slow.keys)
    assert np.array_equal(fast.counts, slow.counts)


def test_primed_sharded_counts_sum_to_full(tmp_path):
    rng = np.random.default_rng(9)
    genome = "".join(rng.choice(list("ACGT"), size=3000))
    reads = [genome[s:s + 80] for s in rng.integers(0, 2900, size=101)]
    _write_fasta(tmp_path / "reads.fa", reads)
    _write_fasta(tmp_path / "corpus.fa", [genome])
    k = 25
    full = ExactKmerCounter.count_file_primed(
        str(tmp_path / "reads.fa"), [str(tmp_path / "corpus.fa")], k
    )
    total = np.zeros_like(full.counts)
    for i in range(3):
        part = ExactKmerCounter.count_file_primed(
            str(tmp_path / "reads.fa"), [str(tmp_path / "corpus.fa")], k,
            shard=(i, 3),
        )
        assert np.array_equal(part.keys, full.keys)
        total += part.counts
    assert np.array_equal(total, full.counts)
