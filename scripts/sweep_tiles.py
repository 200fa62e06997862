"""Tile-size sweep for the brute-force NN kernels on the current platform."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from semicp.corr.bruteforce import class_nn, knn_self


def timeit(fn, *args, reps=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32) * 20)
    lab = jnp.asarray(rng.integers(0, 8, size=n).astype(np.int32))
    val = jnp.ones(n, bool)
    q = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32) * 20)

    print(f"N = {n}")
    for qb, tb in [(256, 256), (512, 512), (512, 2048), (1024, 1024),
                   (1024, 2048), (2048, 2048), (1024, 4096), (2048, 4096)]:
        if qb > n or tb > n:
            continue
        ms = timeit(class_nn, xyz, lab, val, q, num_classes=8, qb=qb, tb=tb)
        print(f"class_nn qb={qb:5d} tb={tb:5d}: {ms:8.2f} ms")
    for qb, tb in [(512, 512), (1024, 2048), (2048, 2048), (2048, 4096)]:
        if qb > n or tb > n:
            continue
        ms = timeit(knn_self, xyz, lab, val, k=20, qb=qb, tb=tb)
        print(f"knn_self qb={qb:5d} tb={tb:5d}: {ms:8.2f} ms")


if __name__ == "__main__":
    main()
