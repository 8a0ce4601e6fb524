"""Microbenchmark: device k-mer counting primitive costs on the real TPU.

Measures the building blocks the PRIME+UPDATE counter could be made of,
to pick the fastest design:
  - lax.sort at different sizes/arities (the merge-join's cost),
  - random gather (binary-search probes),
  - scatter-add (hash-table updates),
  - the current primed_update_merge step,
  - the directed-lookup + scatter-add step (primed_update_batch).

Run: python benchmarks/micro_counter.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(np.asarray(jnp.sum(leaves[0].astype(jnp.float32))))


def timed(fn, *args, reps=3):
    fn(*args)  # compile
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t)
    return best


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    skip_raw = "--skip-raw" in sys.argv

    # --- raw sort costs ---
    for n in () if skip_raw else (4 << 20, 8 << 20, 16 << 20):
        a = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        c = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        d = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))

        t1 = timed(jax.jit(lambda x: jax.lax.sort((x,), num_keys=1)), a)
        t2 = timed(jax.jit(lambda x, y: jax.lax.sort((x, y), num_keys=2)), a, b)
        t4 = timed(
            jax.jit(lambda x, y, z, w: jax.lax.sort((x, y, z, w), num_keys=3)),
            a, b, c, d,
        )
        print(
            f"sort n={n>>20}M: 1-op {t1*1e3:.1f}ms ({n/t1/1e6:.0f}M/s)  "
            f"2-op {t2*1e3:.1f}ms ({n/t2/1e6:.0f}M/s)  "
            f"4-op(3key) {t4*1e3:.1f}ms ({n/t4/1e6:.0f}M/s)",
            flush=True,
        )

    if not skip_raw:
        # --- random gather: nq lookups from an nt-entry table ---
        nt, nq = 4 << 20, 8 << 20
        table = jnp.asarray(rng.integers(0, 2**31, size=nt, dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, nt, size=nq, dtype=np.int32))
        tg = timed(jax.jit(lambda t, i: t[i]), table, idx)
        print(f"gather {nq>>20}M from {nt>>20}M: {tg*1e3:.1f}ms "
              f"({nq/tg/1e6:.0f}M/s)", flush=True)

        # --- scatter-add: nq adds into an nt-entry table ---
        ones = jnp.ones(nq, jnp.int32)
        ts = timed(
            jax.jit(lambda t, i, o: t.at[i].add(o)), table, idx, ones
        )
        print(f"scatter-add {nq>>20}M into {nt>>20}M: {ts*1e3:.1f}ms "
              f"({nq/ts/1e6:.0f}M/s)", flush=True)

    # --- current merge-join step at bench shape ---
    from pangenie_tpu.kmers.device_counter import (
        primed_update_merge, extract_canonical, lookup_pair_directed,
        DIR_BITS,
    )

    K, BATCH, READ_LEN = 31, 65_536, 128
    n_g = 4_000_000
    keys = np.unique(
        rng.integers(0, 2**62, size=n_g, dtype=np.uint64)
    )
    khi = jnp.asarray((keys >> np.uint64(32)).astype(np.uint32))
    klo = jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    counts = jnp.zeros(len(keys), jnp.int32)
    codes = jnp.asarray(
        rng.integers(0, 4, size=(BATCH, READ_LEN)).astype(np.uint8)
    )
    mbp = BATCH * READ_LEN / 1e6
    n_kmers = BATCH * (READ_LEN - K + 1)

    def merge_step(c):
        return primed_update_merge(khi, klo, jnp.zeros(len(keys), jnp.int32),
                                   c, K)

    tm = timed(jax.jit(merge_step), codes)
    print(f"primed_update_merge batch={mbp:.1f}Mbp kmers={n_kmers/1e6:.1f}M: "
          f"{tm*1e3:.1f}ms -> {mbp/tm:.1f} Mbp/s", flush=True)

    # --- directed lookup + scatter-add step ---
    bucket = (np.asarray(khi) >> np.uint32(32 - DIR_BITS)).astype(np.int64)
    directory = np.zeros((1 << DIR_BITS) + 1, np.int32)
    np.cumsum(np.bincount(bucket, minlength=1 << DIR_BITS), out=directory[1:])
    directory = jnp.asarray(directory)
    max_bucket = int(np.bincount(bucket, minlength=1).max())
    steps = max(1, int(np.ceil(np.log2(max(2, max_bucket)))) + 1)
    print(f"directory: max bucket {max_bucket}, steps {steps}", flush=True)

    @jax.jit
    def probe_step(c, counts):
        hi, lo, valid = extract_canonical(c, K)
        idx, found = lookup_pair_directed(
            khi, klo, directory, hi.ravel(), lo.ravel(), steps
        )
        hits = (valid.ravel() & found).astype(jnp.int32)
        idx = jnp.where(valid.ravel() & found, idx, len(keys))
        return counts.at[idx].add(hits, mode="drop")

    tp = timed(probe_step, codes, counts)
    print(f"directed-probe+scatter: {tp*1e3:.1f}ms -> {mbp/tp:.1f} Mbp/s",
          flush=True)

    # --- extraction alone ---
    te = timed(jax.jit(lambda c: extract_canonical(c, K)), codes)
    print(f"extract_canonical alone: {te*1e3:.1f}ms "
          f"({n_kmers/te/1e6:.0f}M kmers/s)", flush=True)

    # --- sort batch kmers only (2-key), what a batch-side-sort costs ---
    @jax.jit
    def batch_sort(c):
        hi, lo, valid = extract_canonical(c, K)
        bad = jnp.uint32(0xFFFFFFFF)
        qhi = jnp.where(valid, hi, bad).ravel()
        qlo = jnp.where(valid, lo, bad).ravel()
        return jax.lax.sort((qhi, qlo), num_keys=2)

    tb = timed(batch_sort, codes)
    print(f"extract+sort batch only: {tb*1e3:.1f}ms -> {mbp/tb:.1f} Mbp/s",
          flush=True)

    # --- accumulate-flush counter end-to-end at bench-like volume ---
    from pangenie_tpu.kmers.device_counter import PrimedDeviceCounter

    n_batches = 8
    batches = [
        jnp.asarray(rng.integers(0, 4, size=(BATCH, READ_LEN)).astype(np.uint8))
        for _ in range(n_batches)
    ]

    def run_accum():
        counter = PrimedDeviceCounter(K, keys)
        for c in batches:
            counter.update_batch(np.asarray(c))
        counter._flush()
        float(np.asarray(jnp.sum(counter._counts)))
        return counter

    run_accum()
    best = float("inf")
    for _ in range(2):
        t = time.perf_counter()
        run_accum()
        best = min(best, time.perf_counter() - t)
    total_mbp = n_batches * mbp
    print(f"accum-flush counter {total_mbp:.0f}Mbp: {best*1e3:.0f}ms -> "
          f"{total_mbp/best:.1f} Mbp/s", flush=True)

    # --- host C++ engine on the same volume (single + 8 threads) ---
    import tempfile
    from pangenie_tpu.kmers.counter import ExactKmerCounter

    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        for bi, c in enumerate(batches):
            arr = lut[np.asarray(c)]
            for ri in range(arr.shape[0]):
                f.write(f">r{bi}_{ri}\n")
                f.write(arr[ri].tobytes().decode())
                f.write("\n")
        read_path = f.name
    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        f.write(">g\n")
        f.write(lut[rng.integers(0, 4, size=4_000_000).astype(np.uint8)]
                .tobytes().decode())
        f.write("\n")
        corpus_path = f.name
    for threads in (1, 8):
        t = time.perf_counter()
        ExactKmerCounter.count_file_primed(
            read_path, [corpus_path], K, n_threads=threads
        )
        th = time.perf_counter() - t
        print(f"host C++ primed ({threads} threads) {total_mbp:.0f}Mbp: "
              f"{th*1e3:.0f}ms -> {total_mbp/th:.1f} Mbp/s", flush=True)
    os.unlink(read_path)
    os.unlink(corpus_path)


if __name__ == "__main__":
    main()
