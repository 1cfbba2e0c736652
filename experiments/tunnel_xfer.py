"""Tunnel transfer characteristics: fixed per-transfer latency vs bandwidth, and
whether concurrent slice fetches overlap (PJRT through the axon tunnel).

Informs the default-path shave: the 512px image fetch measures ~82 ms for 786 KB
(experiments/wall_anatomy.py) — is that latency-bound (nothing to do; vanishes on
directly-attached hardware) or bandwidth-bound (shrinkable)?

Pitfall handled: jax caches the host copy after the first np.asarray of an array,
so D2H must be timed on a FRESH device array every rep (computed via a trivial
seeded add so the server's (program,args) dedupe doesn't kick in either)."""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    @jax.jit
    def bump(a, i):
        return a + i

    print("\nbaseline: tiny execute+fetch RTT (fresh 4B result each rep):")
    base = jax.device_put(np.zeros(4, np.uint8), dev)
    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        np.asarray(bump(base, np.uint8(i)))
        ts.append(time.perf_counter() - t0)
    print("  ", [f"{t*1e3:.1f}" for t in ts], "ms")

    print("\nD2H: fresh array each rep; time np.asarray AFTER compute synced:")
    for nb in (65536, 786432, 3145728):
        src = jax.device_put(np.zeros(nb, np.uint8), dev)
        ts = []
        for i in range(5):
            y = bump(src, np.uint8(i + 1))
            np.asarray(y[:4])  # sync: compute done, host copy NOT cached for y
            t0 = time.perf_counter()
            np.asarray(y)
            ts.append(time.perf_counter() - t0)
        mn = min(ts)
        print(f"  {nb:>8} B: min {mn*1e3:7.2f} ms  median {sorted(ts)[2]*1e3:7.2f} ms"
              f"  ({nb/mn/1e6:6.1f} MB/s at min)")

    print("\nD2H concurrency: 786KB as N row-slices fetched by threads:")
    img_src = jax.device_put(np.zeros((512, 512, 3), np.uint8), dev)
    for nchunks in (1, 2, 4, 8):
        rows = 512 // nchunks
        ts = []
        for i in range(5):
            y = bump(img_src, np.uint8(i + 1))
            parts = [y[k * rows:(k + 1) * rows] for k in range(nchunks)]
            for p in parts:
                np.asarray(p[:1, :1])  # sync slices computed; tiny, uncached rows
            pool = ThreadPoolExecutor(nchunks)
            t0 = time.perf_counter()
            list(pool.map(np.asarray, parts))
            ts.append(time.perf_counter() - t0)
            pool.shutdown()
        print(f"  {nchunks} slices: min {min(ts)*1e3:7.2f} ms  "
              f"median {sorted(ts)[2]*1e3:7.2f} ms")

    print("\nH2D: device_put + tiny-execute sync (minus ~RTT baseline):")
    for nb in (4, 65536, 786432, 3145728):
        host = np.zeros(nb, np.uint8)
        ts = []
        for i in range(5):
            host[0] = i  # defeat any content dedupe
            t0 = time.perf_counter()
            a = jax.device_put(host, dev)
            np.asarray(bump(a[:4], np.uint8(0)))
            ts.append(time.perf_counter() - t0)
        print(f"  {nb:>8} B: min {min(ts)*1e3:7.2f} ms  median {sorted(ts)[2]*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
