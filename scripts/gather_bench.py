"""Microbench: (S, N) row gather cost vs index order on the TPU.

The QMC evidence loop's chained levels each gather S=10k rows of the
(S, N) absorption table with importance-resampled indices
(models/evidence.py).  Multinomial resampling yields unordered indices;
systematic/stratified resampling would yield SORTED indices (classic
lower-variance particle-filter resampler).  This measures whether
XLA's row gather is materially faster on sorted indices — if it is,
the sorted resampler is a perf lever as well as a variance one.

Methodology per PERFORMANCE.md: wall clock around np.asarray with
DIFFERENT inputs per call (block_until_ready lies on axon).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    S, N = 10_000, 1280
    reps = 8
    rng = np.random.default_rng(0)

    @jax.jit
    def gather_sum(A, idx):
        # sum keeps the readback tiny; the gather dominates
        return jnp.take(A, idx, axis=0).sum(axis=1)

    @jax.jit
    def gather_mul_sum(A, idx, E):
        # the level >= 3 shape: gather + elementwise multiply
        return (jnp.take(A, idx, axis=0) * E).sum(axis=1)

    tables = [
        jax.device_put(rng.random((S, N), np.float32)) for _ in range(reps)
    ]
    extras = [
        jax.device_put(rng.random((S, N), np.float32)) for _ in range(reps)
    ]
    raw = [rng.integers(0, S, S).astype(np.int32) for _ in range(reps)]
    unsorted_idx = [jax.device_put(r) for r in raw]
    sorted_idx = [jax.device_put(np.sort(r)) for r in raw]
    # what GPY_DLA_RESAMPLER=systematic actually produces: a sorted comb
    # rotated by a random shift (two ascending runs)
    rolled_idx = [
        jax.device_put(np.roll(np.sort(r), int(rng.integers(0, S))))
        for r in raw
    ]
    seq_idx = [jax.device_put(np.arange(S, dtype=np.int32)) for _ in range(reps)]

    for name, fn, args_list in [
        ("gather unsorted", gather_sum, [(t, i) for t, i in zip(tables, unsorted_idx)]),
        ("gather sorted", gather_sum, [(t, i) for t, i in zip(tables, sorted_idx)]),
        ("gather rolled-sorted", gather_sum, [(t, i) for t, i in zip(tables, rolled_idx)]),
        ("gather sequential", gather_sum, [(t, i) for t, i in zip(tables, seq_idx)]),
        (
            "gather+mul unsorted",
            gather_mul_sum,
            [(t, i, e) for t, i, e in zip(tables, unsorted_idx, extras)],
        ),
        (
            "gather+mul sorted",
            gather_mul_sum,
            [(t, i, e) for t, i, e in zip(tables, sorted_idx, extras)],
        ),
    ]:
        np.asarray(fn(*args_list[0]))  # compile + warm
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args_list[1:]]
        res = [np.asarray(o) for o in outs]
        dt = (time.perf_counter() - t0) / (reps - 1)
        assert all(np.isfinite(r).all() for r in res)
        print(f"{name:24s} {dt * 1e3:8.3f} ms/call")


if __name__ == "__main__":
    main()
