"""Stage-level profile of the accumulate-flush device counter.

Times each piece of the pipeline separately (extract, append, the
flush's main sort, segment-sum scans, partition sort) to locate the
wall inside the 2.3 s / 59 Mbp measurement.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(np.asarray(jnp.sum(leaves[0].astype(jnp.float32))))


def timed(fn, *args, reps=3):
    fn(*args)
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t)
    return best


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)

    from pangenie_tpu.kmers.device_counter import (
        _extract_tagged, unpack_codes_2bit, pack_codes_2bit,
    )

    K, READ_LEN, BATCH = 31, 128, 65_536
    reads = rng.integers(0, 4, size=(BATCH, READ_LEN)).astype(np.uint8)
    words, vwords = pack_codes_2bit(reads)
    words_j, vwords_j = jnp.asarray(words), jnp.asarray(vwords)

    t = timed(jax.jit(partial(unpack_codes_2bit, L=READ_LEN)), words_j, vwords_j)
    print(f"unpack [{BATCH}x{READ_LEN}]: {t*1e3:.1f}ms", flush=True)

    codes_j = unpack_codes_2bit(words_j, vwords_j, READ_LEN)
    t = timed(jax.jit(partial(_extract_tagged, k=K)), codes_j)
    print(f"extract_tagged: {t*1e3:.1f}ms", flush=True)

    thi, tlo = _extract_tagged(codes_j, K)
    n = 36 << 20
    all_hi = jnp.asarray(rng.integers(0, 2**31, size=n, dtype=np.uint32))
    all_lo = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))

    t = timed(
        jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2)),
        all_hi, all_lo,
    )
    print(f"main sort 2-op n={n>>20}M: {t*1e3:.1f}ms", flush=True)

    @jax.jit
    def segsum(shi, slo):
        stag = (slo & jnp.uint32(1)).astype(jnp.int32)
        klo = slo & jnp.uint32(0xFFFFFFFE)
        prev_hi = jnp.concatenate([shi[:1] ^ jnp.uint32(1), shi[:-1]])
        prev_lo = jnp.concatenate([klo[:1], klo[:-1]])
        is_start = (shi != prev_hi) | (klo != prev_lo)
        is_end = jnp.concatenate([is_start[1:], jnp.ones(1, bool)])
        csum = jnp.cumsum(stag)
        big = jnp.iinfo(jnp.int32).max
        end_csum = jnp.where(is_end, csum, big)
        seg_end_csum = jax.lax.cummin(end_csum[::-1])[::-1]
        prev_csum = jnp.concatenate([jnp.zeros(1, csum.dtype), csum[:-1]])
        return jnp.where(is_start, seg_end_csum - prev_csum, 0), stag

    t = timed(segsum, all_hi, all_lo)
    print(f"segment-sum scans: {t*1e3:.1f}ms", flush=True)

    seg_counts, stag = segsum(all_hi, all_lo)
    t = timed(
        jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1)),
        stag, seg_counts,
    )
    print(f"partition sort 1-key 2-op: {t*1e3:.1f}ms", flush=True)

    # alternative partition: pack (tag, count) into ONE uint32
    @jax.jit
    def packed_partition(stag, seg_counts):
        packed = (stag.astype(jnp.uint32) << jnp.uint32(31)) | (
            seg_counts.astype(jnp.uint32)
        )
        return jnp.sort(packed)

    t = timed(packed_partition, stag, seg_counts)
    print(f"partition sort packed 1-op (order-destroying, for scale): "
          f"{t*1e3:.1f}ms", flush=True)

    # dispatch overhead floor
    t = timed(jax.jit(lambda x: x + 1), jnp.ones(8, jnp.float32))
    print(f"trivial dispatch: {t*1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
