import time, jax, jax.numpy as jnp, numpy as np
from pangenie_tpu.kmers.device_counter import (
    pack_codes_2bit, unpack_codes_2bit, extract_canonical, count_kmers,
    PrimedDeviceCounter, primed_update_merge)

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
starts = rng.integers(0, len(genome)-128, size=65536)
reads = genome[starts[:, None] + np.arange(128)[None, :]]

def t(f, reps=3):
    f()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); f(); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3

print(f"host pack:        {t(lambda: pack_codes_2bit(reads)):8.1f}ms")
words, vwords = pack_codes_2bit(reads)
def xfer_packed():
    w = jnp.asarray(words + np.uint32(0)); v = jnp.asarray(vwords + np.uint32(0))
    float(np.asarray(jnp.sum(w[0]) + jnp.sum(v[0])))
print(f"xfer packed:      {t(xfer_packed):8.1f}ms")
def xfer_raw():
    c = jnp.asarray(reads + np.uint8(0)); float(np.asarray(jnp.sum(c[0].astype(jnp.int32))))
print(f"xfer raw:         {t(xfer_raw):8.1f}ms")

dw, dv = jnp.asarray(words), jnp.asarray(vwords)
ec = jax.jit(lambda w, v: count_kmers(*extract_canonical(unpack_codes_2bit(w, v, 128), 31)))
def dev_all():
    r = ec(dw, dv); float(np.asarray(jnp.sum(r[2])))
print(f"dev unpack+count: {t(dev_all):8.1f}ms")

lut = np.frombuffer(b"ACGT", dtype=np.uint8)
from pangenie_tpu.kmers.counter import ExactKmerCounter
keys = np.unique(ExactKmerCounter._extract_canonical([lut[genome].tobytes()], 31))
ctr = PrimedDeviceCounter(31, keys)
codes_dev = unpack_codes_2bit(dw, dv, 128)
def dev_primed():
    c = primed_update_merge(ctr._hi, ctr._lo, jnp.zeros(len(keys), jnp.int32), codes_dev, 31)
    float(np.asarray(jnp.sum(c)))
print(f"dev primed merge: {t(dev_primed):8.1f}ms  (graph keys {len(keys)})")
