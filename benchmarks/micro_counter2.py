"""Focused counter benchmark: the accumulate-flush device counter vs
the host C++ engine on identical genome-derived read sets.

Run: python benchmarks/micro_counter2.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)

    from pangenie_tpu.kmers.counter import ExactKmerCounter
    from pangenie_tpu.kmers.device_counter import (
        PrimedDeviceCounter, pack_codes_2bit,
    )

    K, GENOME_MBP, READ_LEN, COVERAGE, BATCH = 31, 4, 128, 16, 65_536
    genome = rng.integers(0, 4, size=GENOME_MBP * 1_000_000).astype(np.uint8)
    n_reads = GENOME_MBP * 1_000_000 * COVERAGE // READ_LEN
    starts = rng.integers(0, len(genome) - READ_LEN, size=n_reads)
    reads = genome[starts[:, None] + np.arange(READ_LEN)[None, :]]
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    keys = np.unique(ExactKmerCounter._extract_canonical(
        [lut[genome].tobytes()], K
    ))
    print(f"graph keys: {len(keys)}", flush=True)

    n_batches = reads.shape[0] // BATCH
    packed = [
        pack_codes_2bit(reads[b * BATCH:(b + 1) * BATCH])
        for b in range(n_batches)
    ]
    mbp = n_batches * BATCH * READ_LEN / 1e6

    def run_accum():
        counter = PrimedDeviceCounter(K, keys)
        for words, vwords in packed:
            counter.update_packed_batch(words, vwords, READ_LEN)
        counter._flush()
        float(np.asarray(jnp.sum(counter._counts)))
        return counter

    t0 = time.perf_counter()
    c0 = run_accum()
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(2):
        t = time.perf_counter()
        c = run_accum()
        best = min(best, time.perf_counter() - t)
    print(f"accum-flush counter {mbp:.0f}Mbp: {best*1e3:.0f}ms -> "
          f"{mbp/best:.1f} Mbp/s", flush=True)

    # correctness vs host on the same reads
    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        arr = lut[reads[: n_batches * BATCH]]
        for ri in range(arr.shape[0]):
            f.write(f">r{ri}\n")
            f.write(arr[ri].tobytes().decode())
            f.write("\n")
        read_path = f.name
    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        f.write(">g\n")
        f.write(lut[genome].tobytes().decode())
        f.write("\n")
        corpus_path = f.name

    for threads in (1, 2):
        t = time.perf_counter()
        host = ExactKmerCounter.count_file_primed(
            read_path, [corpus_path], K, n_threads=threads
        )
        th = time.perf_counter() - t
        print(f"host C++ primed ({threads} threads) {mbp:.0f}Mbp: "
              f"{th*1e3:.0f}ms -> {mbp/th:.1f} Mbp/s", flush=True)

    dev_keys, dev_counts = c.to_host_arrays()
    assert np.array_equal(dev_keys, host.keys)
    assert np.array_equal(dev_counts, host.counts), (
        int(np.abs(dev_counts - host.counts).max())
    )
    print("device == host counts: OK", flush=True)
    os.unlink(read_path)
    os.unlink(corpus_path)


if __name__ == "__main__":
    main()
