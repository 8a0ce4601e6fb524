"""Device (XLA) k-mer counter vs the host engine — exact match."""

import numpy as np
import pytest

from pangenie_tpu.kmers.counter import ExactKmerCounter
from pangenie_tpu.kmers.device_counter import DeviceKmerCounter, pack_read_batch


def _random_reads(rng, n, length, with_ns=False):
    alphabet = [65, 67, 71, 84, 78] if with_ns else [65, 67, 71, 84]
    p = [0.235, 0.235, 0.235, 0.235, 0.06] if with_ns else None
    return [
        bytes(rng.choice(alphabet, length, p=p).astype(np.uint8))
        for _ in range(n)
    ]


@pytest.mark.parametrize("k", [5, 16, 21, 31])
def test_device_counts_match_host(k):
    rng = np.random.default_rng(k)
    reads = _random_reads(rng, 64, 80, with_ns=True)
    host = ExactKmerCounter.count_sequences(reads, k)

    dev = DeviceKmerCounter(k)
    codes, _ = pack_read_batch(reads)
    dev.add_batch(codes)
    keys, counts = dev.to_host_arrays()
    assert np.array_equal(keys, host.keys)
    assert np.array_equal(counts, host.counts)


def test_device_batched_merge_matches_host():
    rng = np.random.default_rng(9)
    reads = _random_reads(rng, 200, 60)
    host = ExactKmerCounter.count_sequences(reads, 31)

    dev = DeviceKmerCounter(31)
    for i in range(0, len(reads), 64):  # uneven batches
        codes, _ = pack_read_batch(reads[i : i + 64], length=60)
        dev.add_batch(codes)
    keys, counts = dev.to_host_arrays()
    assert np.array_equal(keys, host.keys)
    assert np.array_equal(counts, host.counts)


def test_device_counter_roundtrip_lookup():
    rng = np.random.default_rng(3)
    reads = _random_reads(rng, 32, 50)
    dev = DeviceKmerCounter(21)
    codes, _ = pack_read_batch(reads)
    dev.add_batch(codes)
    counter = dev.to_exact_counter()
    # query the first kmer of each read (canonicalized inside)
    from pangenie_tpu.kmers.mer import encode_kmer

    for read in reads[:5]:
        query = read[:21].decode()
        host = ExactKmerCounter.count_sequences(reads, 21)
        assert counter.get_kmer_abundance(query) == host.get_kmer_abundance(query)
